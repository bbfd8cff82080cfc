"""Inference: speech features -> 800 Hz EMG synthesis.

The reference's only inference surface is ``netG.generate`` called inline
per utterance (ste_gan/train.py:383-414, ste_gan/models/generator.py:48-75).
Here inference is a first-class subsystem:

* :class:`EMGSynthesizer` — jit-compiled generation with a per-length
  compile cache and optional length bucketing (XLA needs static shapes;
  bucketing pads the frame axis up to the next bucket and trims the output,
  which is exact because every generator conv is zero-padded and the tail
  trim removes exactly the padded region's influence zone);
* :func:`EMGSynthesizer.synthesize_streaming` — chunked streaming synthesis
  with receptive-field context so chunk interiors are bit-exact with the
  full-utterance result;
* :func:`convert_dataset` — batched multi-session conversion of a whole
  dataset split with per-session embedding lookup (BASELINE config #5);
* scale-out inference: pass ``mesh=`` (a 1-D ``data`` mesh) and the batch
  axis is sharded over the mesh devices — parameters replicated, rows
  split over ICI, exact (batch rows are independent through the whole
  generator stack). Batches are padded to a mesh multiple with masked
  dummy rows, so any request batch size works on any mesh.
"""
from __future__ import annotations

import time
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS, init_emg_generator
from ste_gan_tpu.parallel import mesh as mesh_lib

#: Per-side receptive field of the generator stack in input frames
#: (2 full-rate GBlocks a 40 frames + upsampled blocks' shrinking context,
#: rounded up). Used as streaming context.
GENERATOR_RECEPTIVE_FIELD_FRAMES = 128


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class EMGSynthesizer:
    """Speech features -> EMG with jit caching.

    Args:
        generator: the generator module.
        params: its parameter tree.
        bucket: frame-axis bucket size (1 = exact per-length compilation).
        mesh: optional 1-D ``data`` mesh for scale-out inference — batch
            rows are sharded over the mesh devices (params replicated);
            exact, since rows are independent through the generator.
    """

    def __init__(self, generator: EMGGeneratorGanTTS, params, bucket: int = 1,
                 mesh: Optional[Mesh] = None):
        self.generator = generator
        self.bucket = max(1, int(bucket))
        self.upsample = generator.upsample_factor
        self.mesh = mesh
        self.set_params(params)

        @jax.jit
        def _forward(params, feats, sess_idx, mode_idx, num_valid):
            return self.generator.apply({"params": params}, feats, sess_idx,
                                        mode_idx, num_valid_frames=num_valid)

        self._forward = _forward

    @classmethod
    def from_config(cls, cfg: Config, params, bucket: int = 1,
                    dtype=jnp.float32, mesh: Optional[Mesh] = None
                    ) -> "EMGSynthesizer":
        return cls(init_emg_generator(cfg, dtype=dtype), params, bucket,
                   mesh=mesh)

    # ------------------------------------------------------------------
    def set_params(self, params) -> None:
        """Install a parameter tree (used by weight hot-reload). Under a
        mesh the tree is replicated across the devices so the sharded
        forward never recompiles on a placement change."""
        if self.mesh is not None:
            params = mesh_lib.replicate(self.mesh, params)
        self.params = params

    def _place_batch(self, feats, sess_idx, mode_idx, valid):
        """Pad the batch to a mesh multiple with masked (valid=0) dummy
        rows and shard the row axis over the ``data`` mesh axis. Returns
        the placed arrays and the real row count."""
        rows = feats.shape[0]
        if self.mesh is None:
            return feats, sess_idx, mode_idx, valid, rows
        n = self.mesh.size
        pad = (-rows) % n
        if pad:
            feats = jnp.concatenate(
                [feats, jnp.zeros((pad,) + feats.shape[1:], feats.dtype)])
            sess_idx = jnp.concatenate([sess_idx,
                                        jnp.zeros((pad,), sess_idx.dtype)])
            mode_idx = jnp.concatenate([mode_idx,
                                        jnp.zeros((pad,), mode_idx.dtype)])
            if valid.ndim > 0:
                valid = jnp.concatenate([valid,
                                         jnp.zeros((pad,), valid.dtype)])
        sharded = mesh_lib.batch_sharding(self.mesh)
        replicated = mesh_lib.replicate_sharding(self.mesh)
        feats = jax.device_put(feats, sharded)
        sess_idx = jax.device_put(sess_idx, sharded)
        mode_idx = jax.device_put(mode_idx, sharded)
        valid = jax.device_put(valid,
                               sharded if valid.ndim > 0 else replicated)
        return feats, sess_idx, mode_idx, valid, rows

    # ------------------------------------------------------------------
    def synthesize_batch(self, feats: jnp.ndarray, session_idx: jnp.ndarray,
                         mode_idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """[B, T, D] features -> [B, upsample*T, C] EMG. Pads T up to the
        bucket, trims the output back (exact; zero-padded convs)."""
        b, t, _ = feats.shape
        if mode_idx is None:
            mode_idx = jnp.zeros((b,), jnp.int32)
        padded_t = _round_up(t, self.bucket)
        if padded_t != t:
            feats = jnp.pad(feats, ((0, 0), (0, padded_t - t), (0, 0)))
        feats, session_idx, mode_idx, valid, rows = self._place_batch(
            feats, session_idx, mode_idx, jnp.asarray(t, jnp.int32))
        emg = self._forward(self.params, feats, session_idx, mode_idx, valid)
        return emg[:rows, : self.upsample * t]

    def synthesize_padded(self, feats: jnp.ndarray, session_idx: jnp.ndarray,
                          mode_idx: jnp.ndarray, num_valid: jnp.ndarray
                          ) -> jnp.ndarray:
        """Batch with PER-ROW valid lengths: [B, Tpad, D] + valid [B] ->
        [B, upsample*Tpad, C]; rows are exact up to ``upsample*valid[b]``
        (padded frames are masked inside the generator). The micro-batching
        server and convert_dataset use this to stack unequal utterances."""
        feats, session_idx, mode_idx, num_valid, rows = self._place_batch(
            feats, session_idx, mode_idx, jnp.asarray(num_valid))
        emg = self._forward(self.params, feats, session_idx, mode_idx,
                            num_valid)
        return emg[:rows]

    def synthesize(self, feats: np.ndarray, session_idx: int,
                   mode_idx: int = 0) -> np.ndarray:
        """Single utterance [T, D] -> [upsample*T, C]."""
        out = self.synthesize_batch(
            jnp.asarray(feats)[None],
            jnp.asarray([session_idx], jnp.int32),
            jnp.asarray([mode_idx], jnp.int32))
        return np.asarray(out[0])

    # ------------------------------------------------------------------
    def synthesize_streaming(self, feats: np.ndarray, session_idx: int,
                             chunk_frames: int = 128, mode_idx: int = 0,
                             context_frames: int = GENERATOR_RECEPTIVE_FIELD_FRAMES,
                             ) -> Iterable[np.ndarray]:
        """Chunked synthesis: yields EMG chunks of ``upsample*chunk_frames``
        samples. Each chunk is generated with ``context_frames`` of feature
        context on both sides, so interiors match the full-utterance result
        exactly (the generator is a zero-padded conv stack — outputs beyond
        the receptive field of the padding are identical)."""
        t = len(feats)
        up = self.upsample
        for start in range(0, t, chunk_frames):
            stop = min(start + chunk_frames, t)
            lo = max(0, start - context_frames)
            hi = min(t, stop + context_frames)
            window = feats[lo:hi]
            valid = len(window)
            # Keep the compile cache small: pad the window to a fixed size
            # (exact — padded frames are masked inside the generator).
            target = chunk_frames + 2 * context_frames
            pad = target - valid
            if pad > 0:
                window = np.pad(window, ((0, pad), (0, 0)))
            w, sess, mode, v, rows = self._place_batch(
                jnp.asarray(window)[None],
                jnp.asarray([session_idx], jnp.int32),
                jnp.asarray([mode_idx], jnp.int32),
                jnp.asarray([valid], jnp.int32))
            emg = self._forward(self.params, w, sess, mode, v)[0]
            yield np.asarray(emg[(start - lo) * up:(stop - lo) * up])

    # ------------------------------------------------------------------
    def real_time_factor(self, num_frames: int = 500, iters: int = 20,
                         batch: int = 1) -> float:
        """Synthesis wall time / audio duration (lower is better; the
        BASELINE target is < 0.01)."""
        feats_rate = 50.0 if self.upsample == 16 else 100.0
        dim = self.generator.speech_input_dim
        feats = jnp.zeros((batch, num_frames, dim))
        sess = jnp.zeros((batch,), jnp.int32)
        out = self.synthesize_batch(feats, sess)
        out.block_until_ready()
        start = time.perf_counter()
        for _ in range(iters):
            out = self.synthesize_batch(feats, sess)
        out.block_until_ready()
        elapsed = (time.perf_counter() - start) / iters
        duration = num_frames / feats_rate * batch
        return elapsed / duration


def convert_dataset(synth: EMGSynthesizer, dataset,
                    feature_key: str = C.DataType.SPEECH_UNITS,
                    bucket: int = 64, max_batch: int = 16) -> List[Dict]:
    """Batched multi-session inference over a dataset split
    (BASELINE config #5).

    Utterances are grouped by padded (bucketed) frame length and synthesized
    in stacked batches with per-session embedding lookup and per-utterance
    valid-length masks (exact — see the generator's num_valid_frames). This
    amortises dispatch/transfer overhead across utterances: one device call
    per (bucket, batch) instead of per utterance.
    """
    up = synth.upsample
    items = [dataset[i] for i in range(len(dataset))]
    order = sorted(range(len(items)),
                   key=lambda i: len(items[i][feature_key]))
    results: List[Optional[Dict]] = [None] * len(items)

    groups: Dict[int, List[int]] = {}
    for i in order:
        padded = _round_up(max(1, len(items[i][feature_key])), bucket)
        groups.setdefault(padded, []).append(i)

    for padded, indices in groups.items():
        for start in range(0, len(indices), max_batch):
            chunk = indices[start:start + max_batch]
            feats = np.zeros((len(chunk), padded, items[chunk[0]][feature_key].shape[-1]),
                             np.float32)
            valid = np.zeros((len(chunk),), np.int32)
            sess = np.zeros((len(chunk),), np.int32)
            mode = np.zeros((len(chunk),), np.int32)
            for row, i in enumerate(chunk):
                f = items[i][feature_key]
                feats[row, : len(f)] = f
                valid[row] = len(f)
                sess[row] = int(items[i][C.DataType.SESSION_INDEX])
                mode[row] = int(items[i][C.DataType.SPEAKING_MODE_INDEX])
            emg = synth.synthesize_padded(jnp.asarray(feats),
                                          jnp.asarray(sess), jnp.asarray(mode),
                                          jnp.asarray(valid))
            emg = np.asarray(emg)
            for row, i in enumerate(chunk):
                results[i] = {
                    C.DataType.UTT_ID: items[i][C.DataType.UTT_ID],
                    C.DataType.FAKE_EMG: emg[row, : up * valid[row]],
                    C.DataType.SESSION_ID: items[i][C.DataType.SESSION_ID],
                }
    return results


# ---------------------------------------------------------------------------
# The decode direction: 800 Hz EMG -> 50 Hz (speech units, phonemes)
# ---------------------------------------------------------------------------


def decoder_receptive_field_frames(model) -> int:
    """Per-side receptive field of the EMG encoder in 50 Hz frames.

    The encoder's attention is hard-windowed: relative offsets at or
    beyond ``relative_positional_distance`` get a -1e8 logit
    (models/transformer.py, reference ste_gan/layers/transformer.py:
    255-262), so each of the L transformer layers extends a frame's
    dependency cone by at most ±(distance-1) frames; the strided conv
    front adds under ±1 frame (4 stride-2 k3 blocks ≈ ±15 EMG samples),
    budgeted as ±2. This bound is what makes EXACT streaming decoding
    possible — unlike an unwindowed transformer, a frame's output is a
    function of a bounded input span."""
    return (model.num_transformer_layers
            * (model.relative_positional_distance - 1) + 2)


class EMGDecoder:
    """EMG -> (speech units, phoneme logits): the silent-speech *decoding*
    direction, as a first-class inference API (the reference only runs its
    encoder inside training loops; the serving/export pendants are
    serve.py ``/decode`` and scripts/export_emg_encoder.py).

    ``decode`` runs one full-length utterance exactly (one compile per
    distinct length — fine for evaluation); ``decode_streaming`` yields
    fixed-latency chunks that are exact: every emitted frame sees its
    full dependency cone (`decoder_receptive_field_frames`) of REAL
    samples, because windows are fixed-length spans of the true signal
    (shifted inward at the edges, never zero-padded), so one XLA program
    serves every chunk.
    """

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._forward = jax.jit(
            lambda v, emg: model.apply(v, emg, train=False))

    @classmethod
    def from_checkpoint(cls, cfg: Config, ckpt_path) -> "EMGDecoder":
        """Load from an encoder training run's Orbax checkpoint (e.g.
        ``<enc_run>/best_val_loss_model``)."""
        from ste_gan_tpu.models.emg_encoder import init_emg_encoder
        from ste_gan_tpu.train.checkpoint import load_pytree

        model = init_emg_encoder(cfg)
        template = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, 16 * 8, cfg.data.num_emg_channels)),
            train=False))(jax.random.PRNGKey(0))
        return cls(model, load_pytree(ckpt_path, template))

    def decode(self, emg: np.ndarray):
        """[T, C] EMG (T a multiple of 16) -> ([F, 256] units,
        [F, 48] phoneme logits), F = T // 16. Exact (no padding)."""
        if emg.shape[0] % C.HOPSIZE:
            raise ValueError(
                f"EMG length {emg.shape[0]} must be a multiple of "
                f"{C.HOPSIZE} (one 50 Hz frame of 800 Hz samples)")
        units, ph = self._forward(self.variables, jnp.asarray(emg)[None])
        return np.asarray(units[0]), np.asarray(ph[0])

    def decode_streaming(self, emg: np.ndarray, chunk_frames: int = 100,
                         context_frames: Optional[int] = None):
        """Chunked decoding: yields ``([chunk, 256], [chunk, 48])`` pairs
        covering the utterance in order; concatenated they EQUAL
        :meth:`decode`'s full-utterance result (to float reduction noise).

        ``context_frames`` defaults to the model's exact dependency bound
        (`decoder_receptive_field_frames`). Smaller values trade
        exactness near chunk edges for lower latency/compute: the
        algorithmic lookahead is ``context_frames`` frames
        (``context_frames / 50`` seconds of EMG).

        Windows are fixed-length spans of the true signal: a window
        nominally ``[start - ctx, stop + ctx)`` is shifted inward when it
        would cross the signal edges, keeping its length constant (one
        compiled shape) and its content real samples (zero-padding inside
        the attention window would perturb outputs — the encoder has no
        valid-length mask input). Utterances shorter than one window fall
        back to a single exact full decode."""
        hop = C.HOPSIZE
        if emg.shape[0] % hop:
            raise ValueError(
                f"EMG length {emg.shape[0]} must be a multiple of {hop}")
        total = emg.shape[0] // hop
        ctx = (decoder_receptive_field_frames(self.model)
               if context_frames is None else context_frames)
        target = chunk_frames + 2 * ctx
        if total <= target:
            units, ph = self.decode(emg)
            for start in range(0, total, chunk_frames):
                stop = min(start + chunk_frames, total)
                yield units[start:stop], ph[start:stop]
            return
        for start in range(0, total, chunk_frames):
            stop = min(start + chunk_frames, total)
            lo = min(max(0, start - ctx), total - target)
            window = jnp.asarray(emg[lo * hop:(lo + target) * hop])
            units, ph = self._forward(self.variables, window[None])
            yield (np.asarray(units[0, start - lo:stop - lo]),
                   np.asarray(ph[0, start - lo:stop - lo]))
