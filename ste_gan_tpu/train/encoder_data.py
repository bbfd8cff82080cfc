"""Batching for EMG-encoder pre-training: size-aware packing and fixed-shape
window folding.

The reference packs utterances into batches bounded by total EMG samples
(SizeAwareSampler, ste_gan/emg_encoder/utils.py:182-200), concatenates each
batch and folds it into fixed windows of ``SEQ_LEN*8 = 1600`` EMG samples
(combine_fixed_length, :93-104), then de-collates predictions back to
per-utterance slices for a per-sample Python loss loop
(ste_gan/emg_encoder/train.py:91-146).

TPU-native redesign: the fold output is padded to a *fixed* window count so
every train step compiles once, and the per-sample loop becomes masked
segment reductions — each 50 Hz frame carries the index of the utterance it
belongs to (-1 for padding), so per-sample means are ``segment_sum``s. The
packing itself stays on the host.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterator, List, Sequence

import numpy as np

from ste_gan_tpu import constants as C
from ste_gan_tpu import emg_encoder_constants as EC


class SizeAwareSampler:
    """Shuffled greedy packing of utterance indices with a total-EMG-sample
    budget per batch; the last incomplete batch is dropped (reference
    semantics)."""

    def __init__(self, lengths: Sequence[int], max_len: int = EC.TRAIN_BATCH_MAX_LEN,
                 seed: int = 0):
        self.lengths = list(lengths)
        self.max_len = max_len
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[List[int]]:
        indices = np.arange(len(self.lengths))
        self._rng.shuffle(indices)
        batch: List[int] = []
        batch_length = 0
        for idx in indices:
            length = self.lengths[idx]
            if length + batch_length > self.max_len:
                yield batch
                batch = []
                batch_length = 0
            batch.append(int(idx))
            batch_length += length
        # last incomplete batch dropped


@dataclasses.dataclass
class EncoderBatch:
    """Fixed-shape folded batch. All arrays are static-shaped for XLA."""

    emg_windows: np.ndarray      # [n_win, window, C]
    su_targets: np.ndarray       # [n_win * frames_per_win, 256]
    ph_targets: np.ndarray       # [n_win * frames_per_win]
    frame_sample_id: np.ndarray  # [n_win * frames_per_win] int32, -1 = pad
    silent: np.ndarray           # [max_samples] bool
    num_samples: np.ndarray      # [] int32

    # Silent-sample DTW targets (present only when the fold is built with
    # ``max_silent > 0``; silent targets come from the PARALLEL voiced
    # recording and have a different length from the prediction frames).
    silent_su_targets: np.ndarray = None   # [max_silent, t_target_max, 256]
    silent_ph_targets: np.ndarray = None   # [max_silent, t_target_max] int32
    silent_target_len: np.ndarray = None   # [max_silent] int32 (0 = empty slot)
    silent_pred_start: np.ndarray = None   # [max_silent] int32 (flat frame axis)
    silent_pred_len: np.ndarray = None     # [max_silent] int32

    def as_dict(self) -> Dict[str, np.ndarray]:
        return {k: v for k, v in dataclasses.asdict(self).items()
                if v is not None}


def fold_encoder_batch(
    items: Sequence[Dict],
    seq_len: int = EC.SEQ_LEN,
    n_win: int = None,
    max_samples: int = None,
    emg_ratio: int = EC.EMG_SIGNAL_TO_SPEECH_UNITS,
    max_silent: int = 0,
    silent_target_frames: int = 0,
    silent_pred_frames: int = 0,
) -> EncoderBatch:
    """Concatenate utterances, fold into fixed windows, build frame->sample
    segment ids. ``n_win`` defaults to the packing budget's worst case.

    ``max_silent > 0`` additionally emits fixed-shape DTW targets for the
    silent samples (mixed-batch training; reference
    ste_gan/emg_encoder/train.py:120-144): each silent sample's padded
    speech-unit/phoneme targets plus its prediction-frame slice coordinates
    on the flattened 50 Hz frame axis."""
    window = seq_len * 8
    frames_per_win = window // emg_ratio
    if n_win is None:
        n_win = math.ceil(EC.TRAIN_BATCH_MAX_LEN / window) + 1
    if max_samples is None:
        max_samples = max(len(items), 2 * n_win)

    emg_list = [np.asarray(it[C.DataType.REAL_EMG], np.float32) for it in items]
    su_list = [np.asarray(it[C.DataType.SPEECH_UNITS], np.float32) for it in items]
    ph_list = [np.asarray(it[C.DataType.PHONEMES], np.int32) for it in items]
    silent_flags = [it[C.DataType.SPEAKING_MODE_ID] != C.SpeakingMode.NORMAL
                    for it in items]

    total = sum(len(e) for e in emg_list)
    num_channels = emg_list[0].shape[-1]
    capacity = n_win * window
    if total > capacity:
        raise ValueError(f"batch of {total} EMG samples exceeds capacity "
                         f"{capacity} ({n_win} windows)")
    if len(items) > max_samples:
        raise ValueError(f"{len(items)} utterances > max_samples {max_samples}")

    emg = np.zeros((capacity, num_channels), np.float32)
    emg[:total] = np.concatenate(emg_list, axis=0)
    emg_windows = emg.reshape(n_win, window, num_channels)

    # Prediction frames per utterance derive from the EMG length (like the
    # reference's speech_unit_lengths = len(emg)//16). For voiced samples
    # this equals the target length; for silent samples the targets come
    # from the parallel voiced recording with a DIFFERENT length — their
    # target slots are zero-filled here (excluded from the voiced loss by
    # the silent mask; the DTW eval path uses the per-item targets
    # directly).
    frame_capacity = n_win * frames_per_win
    su = np.zeros((frame_capacity, su_list[0].shape[-1]), np.float32)
    ph = np.zeros((frame_capacity,), np.int32)
    sample_id = np.full((frame_capacity,), -1, np.int32)

    silent_fields = {}
    if max_silent > 0:
        dim = su_list[0].shape[-1]
        silent_fields = {
            "silent_su_targets": np.zeros(
                (max_silent, silent_target_frames, dim), np.float32),
            "silent_ph_targets": np.zeros(
                (max_silent, silent_target_frames), np.int32),
            "silent_target_len": np.zeros((max_silent,), np.int32),
            "silent_pred_start": np.zeros((max_silent,), np.int32),
            "silent_pred_len": np.zeros((max_silent,), np.int32),
        }

    offset = 0
    slot = 0
    for k, (emg_utt, su_utt, ph_utt, silent) in enumerate(
            zip(emg_list, su_list, ph_list, silent_flags)):
        pred_frames = len(emg_utt) // emg_ratio
        sample_id[offset:offset + pred_frames] = k
        if not silent:
            assert len(su_utt) == pred_frames, (
                f"voiced sample {k}: {len(su_utt)} target frames vs "
                f"{pred_frames} prediction frames")
            su[offset:offset + pred_frames] = su_utt
            ph[offset:offset + pred_frames] = ph_utt
        elif max_silent > 0:
            if slot >= max_silent:
                raise ValueError(
                    f"batch has more than max_silent={max_silent} silent samples")
            t_target = len(su_utt)
            if t_target > silent_target_frames:
                raise ValueError(
                    f"silent sample {k}: {t_target} target frames > "
                    f"silent_target_frames={silent_target_frames}")
            if pred_frames > silent_pred_frames:
                raise ValueError(
                    f"silent sample {k}: {pred_frames} prediction frames > "
                    f"silent_pred_frames={silent_pred_frames}")
            silent_fields["silent_su_targets"][slot, :t_target] = su_utt
            silent_fields["silent_ph_targets"][slot, :t_target] = ph_utt
            silent_fields["silent_target_len"][slot] = t_target
            silent_fields["silent_pred_start"][slot] = offset
            silent_fields["silent_pred_len"][slot] = pred_frames
            slot += 1
        offset += pred_frames

    silent = np.zeros((max_samples,), bool)
    silent[: len(items)] = silent_flags

    return EncoderBatch(
        emg_windows=emg_windows,
        su_targets=su,
        ph_targets=ph,
        frame_sample_id=sample_id,
        silent=silent,
        num_samples=np.int32(len(items)),
        **silent_fields,
    )


def windows_needed(lengths: Sequence[int], seq_len: int = EC.SEQ_LEN) -> int:
    window = seq_len * 8
    return math.ceil(sum(lengths) / window)


_ENCODER_CORPUS_REGISTERED = False


def _register_encoder_corpus_pytree() -> None:
    """Register :class:`EncoderDeviceCorpus` as a JAX pytree (lazily — this
    module stays importable without jax). Trainers pass the corpus INTO the
    jitted step as an argument; closing over it instead would embed the
    whole corpus as an HLO constant, which at real-corpus scale inflates
    the compile payload by gigabytes (see
    ste_gan_tpu.data.device_corpus.DeviceCorpus)."""
    global _ENCODER_CORPUS_REGISTERED
    if _ENCODER_CORPUS_REGISTERED:
        return
    import jax

    def _flatten(c):
        children = (c.emg_flat, c.su_flat, c.ph_flat, c.emg_start,
                    c.emg_len, c.fr_start, c.fr_len, c.silent_flag)
        return children, (c.emg_ratio, c.max_target_frames)

    def _unflatten(aux, children):
        obj = object.__new__(EncoderDeviceCorpus)
        (obj.emg_flat, obj.su_flat, obj.ph_flat, obj.emg_start,
         obj.emg_len, obj.fr_start, obj.fr_len, obj.silent_flag) = children
        obj.emg_ratio, obj.max_target_frames = aux
        return obj

    jax.tree_util.register_pytree_node(EncoderDeviceCorpus, _flatten,
                                       _unflatten)
    _ENCODER_CORPUS_REGISTERED = True


class EncoderDeviceCorpus:
    """Device-resident analogue of :func:`fold_encoder_batch`: the whole
    split lives in device memory as FLAT concatenated arrays (no padding
    waste) plus per-utterance ``[N]`` int32 metadata, and the entire folded
    batch — EMG windows, flattened targets, segment ids, silent DTW slots —
    is reconstructed INSIDE the jitted train step from a descriptor of just
    ``{rows, num_samples}`` (~260 bytes).

    Mechanism: with per-utterance (start, length) resident on device, the
    concatenation offsets of any packed batch are a ``cumsum`` of the
    selected lengths, position->utterance segment ids are a ``searchsorted``
    against them, and the folded streams are one gather each from the flat
    corpus — all static-shaped. This is the encoder-trainer counterpart of
    :class:`ste_gan_tpu.data.device_corpus.DeviceCorpus` (GAN trainer);
    the reference's analogue is host-side collate + per-step GPU copies
    (ste_gan/emg_encoder/utils.py:93-104, train.py:91-146).

    Float arrays are stored in ``float_dtype`` (f16 by default — the same
    quantization as the host pipeline's f16 wire format, so trajectories
    match at equal precision)."""

    def __init__(self, dataset, emg_ratio: int = EC.EMG_SIGNAL_TO_SPEECH_UNITS,
                 float_dtype=None):
        import jax
        import jax.numpy as jnp

        _register_encoder_corpus_pytree()

        if float_dtype is None:
            float_dtype = jnp.float16
        n = len(dataset)
        if n == 0:
            raise ValueError("cannot build an EncoderDeviceCorpus from an "
                             "empty split")
        items = [dataset[i] for i in range(n)]
        emg_list = [np.asarray(it[C.DataType.REAL_EMG], np.float32)
                    for it in items]
        su_list = [np.asarray(it[C.DataType.SPEECH_UNITS], np.float32)
                   for it in items]
        ph_list = [np.asarray(it[C.DataType.PHONEMES], np.int32)
                   for it in items]
        silent_flags = np.asarray(
            [it[C.DataType.SPEAKING_MODE_ID] != C.SpeakingMode.NORMAL
             for it in items], bool)
        for k, (e, s) in enumerate(zip(emg_list, su_list)):
            if not silent_flags[k]:
                assert len(s) == len(e) // emg_ratio, (
                    f"voiced sample {k}: {len(s)} target frames vs "
                    f"{len(e) // emg_ratio} prediction frames")

        self.emg_ratio = emg_ratio
        emg_lens = np.asarray([len(e) for e in emg_list], np.int32)
        fr_lens = np.asarray([len(s) for s in su_list], np.int32)
        self.max_target_frames = int(fr_lens.max())
        np_float = np.dtype(jnp.dtype(float_dtype).name)

        # Flat corpora; target tracks padded at the tail by the longest
        # utterance so fixed-size silent-slot slices never clamp.
        emg_flat = np.concatenate(emg_list, axis=0).astype(np_float)
        su_flat = np.concatenate(
            su_list + [np.zeros((self.max_target_frames, su_list[0].shape[-1]),
                                np.float32)], axis=0).astype(np_float)
        ph_flat = np.concatenate(
            ph_list + [np.zeros((self.max_target_frames,), np.int32)])

        put = jax.device_put
        self.emg_flat = put(emg_flat)
        self.su_flat = put(su_flat)
        self.ph_flat = put(ph_flat)
        self.emg_start = put(np.concatenate(
            [[0], np.cumsum(emg_lens)[:-1]]).astype(np.int32))
        self.emg_len = put(emg_lens)
        self.fr_start = put(np.concatenate(
            [[0], np.cumsum(fr_lens)[:-1]]).astype(np.int32))
        self.fr_len = put(fr_lens)
        self.silent_flag = put(silent_flags)

    @property
    def nbytes(self) -> int:
        arrays = (self.emg_flat, self.su_flat, self.ph_flat, self.emg_start,
                  self.emg_len, self.fr_start, self.fr_len, self.silent_flag)
        return sum(int(a.size) * a.dtype.itemsize for a in arrays)

    def fold(self, rows, num_samples, *, seq_len: int = EC.SEQ_LEN,
             n_win: int, max_samples: int, max_silent: int = 0,
             silent_target_frames: int = 0):
        """Jit-traceable device fold. Output matches
        ``fold_encoder_batch([dataset[r] for r in rows[:num_samples]], ...)``
        field-for-field (modulo ``float_dtype``). ``rows`` is ``[max_samples]``
        int32 (entries past ``num_samples`` ignored)."""
        import jax
        import jax.numpy as jnp

        window = seq_len * 8
        ratio = self.emg_ratio
        frames_per_win = window // ratio

        rows = rows.astype(jnp.int32)
        num = jnp.asarray(num_samples, jnp.int32)
        arange_b = jnp.arange(max_samples, dtype=jnp.int32)
        valid = arange_b < num
        r = jnp.where(valid, rows, 0)

        # EMG stream: batch offsets via cumsum, position->sample via
        # searchsorted, one gather from the flat corpus.
        e_len = jnp.where(valid, self.emg_len[r], 0)
        cum = jnp.concatenate([jnp.zeros((1,), e_len.dtype), jnp.cumsum(e_len)])
        total = cum[-1]
        capacity = n_win * window
        pos = jnp.arange(capacity, dtype=jnp.int32)
        k = jnp.clip(jnp.searchsorted(cum, pos, side="right") - 1,
                     0, max_samples - 1)
        idx = self.emg_start[r][k] + (pos - cum[k])
        in_range = pos < total
        emg = jnp.where(
            in_range[:, None],
            self.emg_flat[jnp.clip(idx, 0, self.emg_flat.shape[0] - 1)], 0)
        emg_windows = emg.reshape(n_win, window, -1)

        # Flattened 50 Hz frame axis: same mechanism at frame granularity.
        p_len = e_len // ratio
        fcum = jnp.concatenate([jnp.zeros((1,), p_len.dtype), jnp.cumsum(p_len)])
        ftotal = fcum[-1]
        frame_capacity = n_win * frames_per_win
        fpos = jnp.arange(frame_capacity, dtype=jnp.int32)
        fk = jnp.clip(jnp.searchsorted(fcum, fpos, side="right") - 1,
                      0, max_samples - 1)
        f_in = fpos < ftotal
        frame_sample_id = jnp.where(f_in, fk, -1).astype(jnp.int32)

        sil = jnp.where(valid, self.silent_flag[r], False)
        voiced_frame = f_in & ~sil[fk]
        fidx = self.fr_start[r][fk] + (fpos - fcum[fk])
        fidx_c = jnp.clip(fidx, 0, self.su_flat.shape[0] - 1)
        su = jnp.where(voiced_frame[:, None], self.su_flat[fidx_c], 0)
        ph = jnp.where(voiced_frame, self.ph_flat[fidx_c], 0).astype(jnp.int32)

        batch = {
            "emg_windows": emg_windows,
            "su_targets": su,
            "ph_targets": ph,
            "frame_sample_id": frame_sample_id,
            "silent": sil,
            "num_samples": num,
        }
        if max_silent > 0:
            # Scatter the batch's silent samples into fixed slots in batch
            # order (host-fold semantics); OOB updates are dropped.
            mask = sil & valid
            slot = jnp.cumsum(mask.astype(jnp.int32)) - 1
            tgt = jnp.where(mask, slot, max_silent)

            def scat(vals, dtype=jnp.int32):
                return (jnp.zeros((max_silent,), dtype)
                        .at[tgt].set(vals.astype(dtype), mode="drop"))

            slot_row = scat(r)
            slot_active = (jnp.zeros((max_silent,), bool)
                           .at[tgt].set(True, mode="drop"))
            t_len = jnp.where(slot_active, self.fr_len[slot_row], 0)

            def one_slot(row, lt):
                su_t = jax.lax.dynamic_slice_in_dim(
                    self.su_flat, self.fr_start[row], silent_target_frames)
                ph_t = jax.lax.dynamic_slice_in_dim(
                    self.ph_flat, self.fr_start[row], silent_target_frames)
                keep = jnp.arange(silent_target_frames) < lt
                return (jnp.where(keep[:, None], su_t, 0),
                        jnp.where(keep, ph_t, 0).astype(jnp.int32))

            su_t, ph_t = jax.vmap(one_slot)(slot_row, t_len)
            batch.update({
                "silent_su_targets": su_t,
                "silent_ph_targets": ph_t,
                "silent_target_len": t_len,
                "silent_pred_start": scat(fcum[arange_b]),
                "silent_pred_len": scat(p_len),
            })
        return batch
