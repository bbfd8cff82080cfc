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
  dataset split with per-session embedding lookup (BASELINE config #5).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS, init_emg_generator

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
    """

    def __init__(self, generator: EMGGeneratorGanTTS, params, bucket: int = 1):
        self.generator = generator
        self.params = params
        self.bucket = max(1, int(bucket))
        self.upsample = generator.upsample_factor

        @jax.jit
        def _forward(params, feats, sess_idx, mode_idx, num_valid):
            return self.generator.apply({"params": params}, feats, sess_idx,
                                        mode_idx, num_valid_frames=num_valid)

        self._forward = _forward

    @classmethod
    def from_config(cls, cfg: Config, params, bucket: int = 1,
                    dtype=jnp.float32) -> "EMGSynthesizer":
        return cls(init_emg_generator(cfg, dtype=dtype), params, bucket)

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
        emg = self._forward(self.params, feats, session_idx, mode_idx,
                            jnp.asarray(t, jnp.int32))
        return emg[:, : self.upsample * t]

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
            emg = self._forward(
                self.params, jnp.asarray(window)[None],
                jnp.asarray([session_idx], jnp.int32),
                jnp.asarray([mode_idx], jnp.int32),
                jnp.asarray(valid, jnp.int32))[0]
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
                    bucket: int = 64) -> List[Dict]:
    """Batched multi-session inference over a dataset split: groups
    utterances into padded-length buckets, synthesizes with per-session
    embeddings, returns per-utterance results (BASELINE config #5)."""
    synth = EMGSynthesizer(synth.generator, synth.params, bucket=bucket)
    results = []
    for idx in range(len(dataset)):
        item = dataset[idx]
        feats = item[feature_key]
        emg = synth.synthesize(feats, int(item[C.DataType.SESSION_INDEX]),
                               int(item[C.DataType.SPEAKING_MODE_INDEX]))
        results.append({
            C.DataType.UTT_ID: item[C.DataType.UTT_ID],
            C.DataType.FAKE_EMG: emg,
            C.DataType.SESSION_ID: item[C.DataType.SESSION_ID],
        })
    return results
