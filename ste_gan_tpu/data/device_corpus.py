"""Device-resident training corpus: HBM-cached utterances, on-device crops.

The host input pipeline (loader.py + collate.py) ships ~10 MB of freshly
cropped tensors to the device every step. Through a remote-TPU tunnel that
transfer is the end-to-end trainer bottleneck (see
``benchmarks/input_pipeline_probe.py``) and — with the tunnel client
retaining a host copy of every H2D buffer — the source of unbounded host
RSS growth on long runs.

This module inverts the dataflow, which is only possible because the whole
(padded) train split fits comfortably in HBM (the Gaddy & Klein voiced
subset is a few GB even in f32; the dev corpus is ~50 MB): upload every
utterance ONCE at startup, then per step ship only ``[B]`` int32 crop
descriptors (rows + crop starts — tens of bytes) and gather the static-shape
training crops *inside* the jitted step with ``lax.dynamic_slice``. Crop
semantics are bit-identical to :func:`ste_gan_tpu.data.collate.ste_gan_collate`
(train partition): a ``frames``-frame speech-unit/phoneme crop at ``start``,
the paired ``2x`` MFCC crop and ``HOPSIZE x`` EMG crop.

The reference has no analogue (its DataLoader workers collate on CPU and
copy to GPU per step; ste_gan/data/loader.py:19-109) — this is a TPU-native
win: XLA sees one fused gather+train program, the tunnel sees 4 bytes per
example instead of ~300 KB.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu import constants as C


@dataclass
class DeviceCorpus:
    """One split's utterances, padded/stacked and resident on device.

    Float arrays are stored in ``float_dtype`` (default f16 — the same
    quantization as the trainer's f16 wire format, so trajectories match
    the host pipeline bit-for-bit at equal ``transfer_dtype``). Padding
    rows live past every legal crop window (train crops start at most at
    ``len - frames``), so gathers never read padding.

    Registered as a JAX pytree so trainers pass it INTO the jitted step as
    an argument. Closing over it instead embeds the whole corpus as a
    tracing constant in the lowered HLO — at real-corpus scale (~1.6 GB
    for 8 hours of EMG) that inflates serialization/compile by gigabytes
    and broke the remote compile service outright; as an argument it is
    just device buffers referenced by the executable.
    """

    emg: jax.Array            # [N, Lmax_emg, C] float
    speech_units: jax.Array   # [N, Lmax, U] float
    phonemes: jax.Array       # [N, Lmax] int32
    mfccs: Optional[jax.Array]  # [N, 2*Lmax, M] float or None
    session_index: jax.Array  # [N] int32
    speaking_mode_index: jax.Array  # [N] int32
    emg_train_length: int
    hopsize: int
    #: [N] host ints — true (unpadded) frame counts. Host-side only (the
    #: IndexLoader draws crop starts from it); an ``init=False`` field so
    #: pytree registration excludes it — the jit dispatch cache must not
    #: hash an N-element tuple per step. Set via :meth:`with_unit_lengths`.
    #: CONSEQUENCE: any whole-tree op (tree_map, a whole-corpus device_put,
    #: returning the corpus from jit) reconstructs with ``unit_lengths=()``
    #: — read it only from the ``from_dataset`` instance. IndexLoader's
    #: length assert trips loudly if an erased corpus reaches it.
    unit_lengths: tuple = field(default=(), init=False)

    def with_unit_lengths(self, lengths) -> "DeviceCorpus":
        self.unit_lengths = tuple(int(x) for x in lengths)
        return self

    @property
    def frames(self) -> int:
        return self.emg_train_length // self.hopsize

    @property
    def nbytes(self) -> int:
        arrays = [self.emg, self.speech_units, self.phonemes,
                  self.session_index, self.speaking_mode_index]
        if self.mfccs is not None:
            arrays.append(self.mfccs)
        return sum(int(a.size) * a.dtype.itemsize for a in arrays)

    # ------------------------------------------------------------------
    @classmethod
    def from_dataset(cls, dataset, emg_train_length: int,
                     hopsize: int = C.HOPSIZE,
                     float_dtype=jnp.float16,
                     sharding=None) -> "DeviceCorpus":
        """Pad/stack every utterance of ``dataset`` and upload once.

        ``sharding`` (optional NamedSharding) replicates the corpus across
        a mesh so sharded index batches can gather locally on every device.
        """
        n = len(dataset)
        if n == 0:
            raise ValueError("cannot build a DeviceCorpus from an empty split")
        items = [dataset[i] for i in range(n)]
        unit_lengths = np.asarray(
            [len(it[C.DataType.SPEECH_UNITS]) for it in items], np.int64)

        lmax = int(unit_lengths.max())
        emg_max = max(max(len(it[C.DataType.REAL_EMG]) for it in items),
                      hopsize * lmax)
        has_mfccs = all(it[C.DataType.MFCCS] is not None for it in items)

        def pad0(a: np.ndarray, length: int) -> np.ndarray:
            out = np.zeros((length,) + a.shape[1:], a.dtype)
            out[: len(a)] = a
            return out

        np_float = np.dtype(jnp.dtype(float_dtype).name)
        units = np.stack([pad0(it[C.DataType.SPEECH_UNITS], lmax)
                          for it in items]).astype(np_float)
        phonemes = np.stack([pad0(it[C.DataType.PHONEMES].astype(np.int32), lmax)
                             for it in items])
        emg = np.stack([pad0(it[C.DataType.REAL_EMG], emg_max)
                        for it in items]).astype(np_float)
        mfccs = None
        if has_mfccs:
            mfccs = np.stack([pad0(it[C.DataType.MFCCS], 2 * lmax)
                              for it in items]).astype(np_float)
        session = np.asarray(
            [it[C.DataType.SESSION_INDEX] for it in items], np.int32)
        mode = np.asarray(
            [it[C.DataType.SPEAKING_MODE_INDEX] for it in items], np.int32)

        put = ((lambda a: jax.device_put(a, sharding)) if sharding is not None
               else jax.device_put)
        return cls(
            emg=put(emg), speech_units=put(units), phonemes=put(phonemes),
            mfccs=put(mfccs) if mfccs is not None else None,
            session_index=put(session), speaking_mode_index=put(mode),
            emg_train_length=emg_train_length,
            hopsize=hopsize).with_unit_lengths(unit_lengths)

    # ------------------------------------------------------------------
    def gather(self, rows: jax.Array, starts: jax.Array) -> Dict[str, jax.Array]:
        """Assemble a train batch on-device — jit-traceable.

        ``rows``/``starts`` are ``[B]`` integer arrays; output shapes and
        values match ``ste_gan_collate(items, "train", starts=starts)`` for
        ``items = [dataset[r] for r in rows]`` (modulo ``float_dtype``).
        """
        rows = rows.astype(jnp.int32)
        starts = starts.astype(jnp.int32)
        frames = self.frames

        def crop_one(r, s):
            out = {
                C.DataType.SPEECH_UNITS: jax.lax.dynamic_slice_in_dim(
                    self.speech_units[r], s, frames),
                C.DataType.PHONEMES: jax.lax.dynamic_slice_in_dim(
                    self.phonemes[r], s, frames),
                C.DataType.REAL_EMG: jax.lax.dynamic_slice_in_dim(
                    self.emg[r], s * self.hopsize, self.emg_train_length),
            }
            if self.mfccs is not None:
                out[C.DataType.MFCCS] = jax.lax.dynamic_slice_in_dim(
                    self.mfccs[r], 2 * s, 2 * frames)
            return out

        batch = jax.vmap(crop_one)(rows, starts)
        batch[C.DataType.SESSION_INDEX] = self.session_index[rows]
        batch[C.DataType.SPEAKING_MODE_INDEX] = self.speaking_mode_index[rows]
        return batch


jax.tree_util.register_dataclass(
    DeviceCorpus,
    data_fields=["emg", "speech_units", "phonemes", "mfccs",
                 "session_index", "speaking_mode_index"],
    meta_fields=["emg_train_length", "hopsize"])


class IndexLoader:
    """Train-partition view of a :class:`~ste_gan_tpu.data.loader.DataLoader`
    that yields crop descriptors (``{"rows", "starts"}`` int32 ``[B]``)
    instead of collated tensors — the host half of the device-resident path.

    Epoch/shuffle/crop-start state is the WRAPPED loader's own (same seeded
    permutation, same per-(seed, epoch, global-index) crop starts), so a run
    is example-for-example identical to the host-collate pipeline, including
    across hosts (multi-host crops stay host-count invariant)."""

    def __init__(self, loader, unit_lengths: np.ndarray):
        assert loader.partition == "train", "index batches are a train-only path"
        self._loader = loader
        self._unit_lengths = np.asarray(unit_lengths, np.int64)
        assert len(self._unit_lengths) == len(loader.dataset)

    @property
    def dataset(self):
        return self._loader.dataset

    def __len__(self) -> int:
        return len(self._loader)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        ld = self._loader
        ld._epoch += 1
        for chunk in ld._index_batches():
            local = ld._host_slice(chunk)
            starts = ld._crop_starts(local, self._unit_lengths[local])
            yield {"rows": local.astype(np.int32),
                   "starts": starts.astype(np.int32)}
