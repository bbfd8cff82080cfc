"""GanTTS-style EMG generator.

Speech features (Soft Speech Units at 50 Hz x 256 or MFCCs at 100 Hz x 25)
plus a learned per-session embedding are upsampled through a stack of
dilated-convolution GBlocks to an 8-channel EMG signal at 800 Hz in [-1, 1].

Architecture parity with the reference (ste_gan/models/generator.py:78-162,
ste_gan/layers/conv.py:29-84): input 1x1 conv to 768 channels, two
processing GBlocks, four upsampling GBlocks (x2 each; the last is x1 for the
MFCC variant so the total upsample is x16 for speech units and x8 for
MFCCs), two more processing GBlocks at 192 channels, and a ReLU + k3 conv
head with tanh output. Every conv is weight-normalised.

TPU-native design: channel-last [B, T, C] throughout so features ride the
lanes; nearest-neighbour upsampling is a reshape-free ``jnp.repeat`` that XLA
fuses into the following conv; the whole stack is one fused XLA program under
jit with static shapes.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ste_gan_tpu import constants as C
from ste_gan_tpu.ops.conv import WNConv, upsample_nearest


def _same_pad(kernel_size: int, dilation: int = 1) -> int:
    """Symmetric padding preserving length for odd kernels
    (reference get_padding; ste_gan/layers/conv.py:24-25)."""
    return (kernel_size * dilation - dilation) // 2


class GBlock(nn.Module):
    """Dilated residual block (dilations 1/3/9/27) with optional upsampling.

    out = conv1(x) + res1(x); return out + conv2(out)
    (reference: ste_gan/layers/conv.py:29-84).
    """

    output_dim: int
    upsample: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, num_valid=None, valid_start=None):
        """``num_valid`` / ``valid_start`` (scalars or [B], at the *input*
        frame rate) zero every activation outside [valid_start, num_valid)
        after each conv, making explicit left/right padding bit-equivalent
        to the conv stack's boundary zero-padding — see
        EMGGeneratorGanTTS.__call__(num_valid_frames)."""
        k = self.kernel_size
        n_out = None if num_valid is None else num_valid * self.upsample
        s_out = None if valid_start is None else valid_start * self.upsample

        def mask(h):
            if n_out is None and s_out is None:
                return h
            pos = jnp.arange(h.shape[1])[None, :, None]
            keep = jnp.full(h.shape, True)
            if n_out is not None:
                valid = jnp.reshape(jnp.asarray(n_out), (-1, 1, 1))
                keep = keep & (pos < valid)
            if s_out is not None:
                start = jnp.reshape(jnp.asarray(s_out), (-1, 1, 1))
                keep = keep & (pos >= start)
            return jnp.where(keep, h, 0).astype(h.dtype)

        def wn(name, dilation=1, kernel=k):
            return WNConv(self.output_dim, (kernel,), dilation=dilation,
                          padding=_same_pad(kernel, dilation), dtype=self.dtype,
                          name=name)

        h = nn.relu(x)
        h = upsample_nearest(h, self.upsample)
        h = mask(wn("conv1_a")(h))
        h = nn.relu(h)
        h = mask(wn("conv1_b", dilation=3)(h))

        r = upsample_nearest(x, self.upsample)
        r = mask(WNConv(self.output_dim, (1,), dtype=self.dtype, name="res1")(r))

        y = h + r

        h2 = nn.relu(y)
        h2 = mask(wn("conv2_a", dilation=9)(h2))
        h2 = nn.relu(h2)
        h2 = mask(wn("conv2_b", dilation=27)(h2))
        return y + h2


def gblock_spec(speech_feature_type: str, channels: int = 768):
    """The GBlock stack's (output_dim, upsample) rows — 2 processing
    blocks, 4 upsampling blocks (50 → 100 → 200 → 400 → [800] Hz; the last
    ×2 only for speech units), 2 processing blocks (reference
    generator.py:116-131). Single source of truth shared by the model's
    forward and the torch-layout checkpoint exporter
    (interop/torch_export.py), whose Sequential indices depend on which
    blocks upsample."""
    ch = channels
    upsample_last = 2 if speech_feature_type == C.DataType.SPEECH_UNITS else 1
    return (
        (ch, 1), (ch, 1),
        (ch // 2, 2), (ch // 2, 2), (ch // 2, 2), (ch // 4, upsample_last),
        (ch // 4, 1), (ch // 4, 1),
    )


class EMGGeneratorGanTTS(nn.Module):
    """Speech features -> 800 Hz multi-channel EMG in [-1, 1]."""

    speech_feature_type: str = C.DataType.SPEECH_UNITS
    speech_input_dim: int = C.SPEECH_UNITS_FEAT_SIZE
    num_sessions: int = C.NUM_EMG_SESSIONS
    num_emg_channels: int = C.NUM_EMG_CHANNELS
    use_speaking_mode_embedding: bool = False
    use_session_embeddings: bool = True
    num_speaking_modes: int = 3
    embedding_dim: int = C.EMBEDDING_DIM_SIZE
    channels: int = 768
    dtype: Any = jnp.float32

    @property
    def upsample_factor(self) -> int:
        # x16 from 50 Hz speech units, x8 from 100 Hz MFCCs
        # (reference: ste_gan/models/generator.py:116).
        return 16 if self.speech_feature_type == C.DataType.SPEECH_UNITS else 8

    @nn.compact
    def __call__(self, speech_features, session_ids, speaking_mode_ids=None,
                 num_valid_frames=None, valid_start_frames=None):
        """Args:
            speech_features: [B, T, speech_input_dim] feature sequence.
            session_ids: [B] int session indices.
            speaking_mode_ids: [B] int speaking-mode indices (optional).
            num_valid_frames: optional scalar or [B] vector; frames at
                index >= this are zeroed *after* the embedding concat, making
                right-padding exactly equivalent to the conv stack's boundary
                zero-padding (used by length-bucketed batched inference).
            valid_start_frames: optional scalar or [B] vector; frames at
                index < this are zeroed likewise (left padding, used by
                sequence-parallel halo windows).

        Returns:
            [B, upsample_factor * T, num_emg_channels] EMG in [-1, 1].
        """
        x = speech_features.astype(self.dtype)
        num_frames = x.shape[1]

        def _tile(emb):
            return jnp.broadcast_to(emb[:, None, :].astype(self.dtype),
                                    (emb.shape[0], num_frames, emb.shape[-1]))

        if self.use_session_embeddings:
            sess_emb = nn.Embed(self.num_sessions, self.embedding_dim,
                                embedding_init=nn.initializers.normal(1.0),
                                name="session_embeddings")(session_ids)
            x = jnp.concatenate([x, _tile(sess_emb)], axis=-1)
        if self.use_speaking_mode_embedding:
            mode_emb = nn.Embed(self.num_speaking_modes, self.embedding_dim,
                                embedding_init=nn.initializers.normal(1.0),
                                name="speaking_mode_embeddings")(speaking_mode_ids)
            x = jnp.concatenate([x, _tile(mode_emb)], axis=-1)

        def mask(h, valid, start):
            if valid is None and start is None:
                return h
            pos = jnp.arange(h.shape[1])[None, :, None]
            keep = jnp.full(h.shape, True)
            if valid is not None:
                keep = keep & (pos < jnp.reshape(jnp.asarray(valid), (-1, 1, 1)))
            if start is not None:
                keep = keep & (pos >= jnp.reshape(jnp.asarray(start), (-1, 1, 1)))
            return jnp.where(keep, h, 0).astype(h.dtype)

        num_valid = num_valid_frames
        num_start = valid_start_frames
        x = mask(x, num_valid, num_start)

        ch = self.channels
        x = mask(WNConv(ch, (1,), dtype=self.dtype, name="input_conv")(x),
                 num_valid, num_start)
        block_spec = gblock_spec(self.speech_feature_type, ch)
        for i, (out_dim, up) in enumerate(block_spec):
            x = GBlock(out_dim, upsample=up, dtype=self.dtype,
                       name=f"gblock_{i}")(x, num_valid, num_start)
            if num_valid is not None:
                num_valid = num_valid * up
            if num_start is not None:
                num_start = num_start * up

        x = nn.relu(x)
        x = mask(WNConv(self.num_emg_channels, (3,), padding=1, dtype=self.dtype,
                        name="out_conv")(x), num_valid, num_start)
        return jnp.tanh(x.astype(jnp.float32))

    def generate(self, variables, speech_features, session_ids,
                 speaking_mode_ids=None):
        """Inference forward (reference EMGGenerator.generate;
        ste_gan/models/generator.py:48-50). Prefer the jit-cached wrapper in
        :mod:`ste_gan_tpu.infer` for repeated calls."""
        return self.apply(variables, speech_features, session_ids,
                          speaking_mode_ids)


def init_emg_generator(cfg, dtype=jnp.float32) -> EMGGeneratorGanTTS:
    """Factory from config (reference init_emg_generator;
    ste_gan/models/generator.py:165-195)."""
    sft = cfg.model.speech_feature_type
    if sft == C.DataType.SPEECH_UNITS:
        speech_input_dim = C.SPEECH_UNITS_FEAT_SIZE
    elif sft == C.DataType.MFCCS:
        speech_input_dim = C.NUM_MFCCS
    else:
        raise ValueError(f"Unrecognized speech feature type: {sft}")
    if cfg.model.type != "EMGGeneratorGanTTS":
        raise ValueError(f"Unrecognized EMG generator type: {cfg.model.type}")
    return EMGGeneratorGanTTS(
        speech_feature_type=sft,
        speech_input_dim=speech_input_dim,
        num_sessions=cfg.data.num_emg_sessions,
        num_emg_channels=cfg.data.num_emg_channels,
        dtype=dtype,
        **(cfg.model.params or {}),
    )
