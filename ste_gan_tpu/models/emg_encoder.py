"""Conv-transformer EMG encoder: 800 Hz EMG -> 50 Hz (Soft-SU, phoneme)
predictions.

Parity with the reference (ste_gan/models/emg_encoder.py:36-88 and
ste_gan/layers/conv.py:106-133): four stride-2 ResBlocks (x16 downsample,
800 Hz -> 50 Hz), a linear projection, six post-norm transformer layers
(d=768, 8 heads, FFN 3072, dropout 0.2, relative positions clipped at 100),
and two linear heads (256-dim speech units + 48-way phonemes). During
training a random left-shift of 0..7 samples with zero fill augments the
input (reference :71-75) — expressed functionally with a PRNG key here.

The encoder is trained standalone (see train/encoder.py) and then frozen as
the perceptual loss network inside the GAN step.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ste_gan_tpu import constants as C
from ste_gan_tpu.models.transformer import Dense, TransformerEncoderLayer
from ste_gan_tpu.ops.conv import Conv


class ResBlock(nn.Module):
    """conv-BN-ReLU x2 with strided residual path
    (reference: ste_gan/layers/conv.py:106-133)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        h = Conv(self.features, (3,), strides=self.stride, padding=1,
                 dtype=self.dtype, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = Conv(self.features, (3,), padding=1, dtype=self.dtype,
                 name="conv2")(h)
        h = bn("bn2")(h)

        if self.stride != 1 or x.shape[-1] != self.features:
            res = Conv(self.features, (1,), strides=self.stride,
                       dtype=self.dtype, name="residual")(x)
            res = bn("res_norm")(res)
        else:
            res = x
        return nn.relu(h + res)


class EMGEncoderTransformer(nn.Module):
    """EMG [B, T, C] -> (speech units [B, T/16, 256], phoneme logits
    [B, T/16, 48]).

    Setup-based (not compact) with reference-matching explicit submodule
    names, so ``__call__`` and :meth:`pipelined` share one parameter layout
    and checkpoint format — the pipelined path is purely an execution-
    schedule choice."""

    num_ins: int = C.NUM_EMG_CHANNELS
    num_outs: int = C.SPEECH_UNITS_FEAT_SIZE
    num_aux_outs: int = C.NUM_PHONEMES
    model_size: int = 768
    num_extra_res_blocks: int = 3
    dropout: float = 0.2
    num_transformer_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 3072
    relative_positional_distance: int = 100
    # Scaling extension (no reference counterpart): > 0 swaps each layer's
    # dense FFN for a mixture-of-experts block whose expert weights can
    # shard over an 'expert' mesh axis (models/moe.py,
    # parallel/expert_parallel.py). Reachable via emg_encoder.params in the
    # YAML config (init_emg_encoder passes params through).
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.5
    dtype: Any = jnp.float32

    def setup(self):
        self.res_blocks = [
            ResBlock(self.model_size, stride=2, dtype=self.dtype,
                     name=f"res_block_{i}")
            for i in range(1 + self.num_extra_res_blocks)]
        self.w_raw_in = Dense(self.model_size, dtype=self.dtype,
                              name="w_raw_in")
        self.transformer_layers = [
            TransformerEncoderLayer(
                d_model=self.model_size, num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout, relative_positional=True,
                relative_positional_distance=self.relative_positional_distance,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype, name=f"transformer_{i}")
            for i in range(self.num_transformer_layers)]
        self.w_out = Dense(self.num_outs, dtype=self.dtype, name="w_out")
        self.w_aux = Dense(self.num_aux_outs, dtype=self.dtype, name="w_aux")

    def _frontend(self, x_raw, train: bool) -> jnp.ndarray:
        """Shift augmentation + strided ResBlocks + input projection —
        shared by the sequential and pipelined forward."""
        x = x_raw.astype(self.dtype)
        if train:
            # Random left-shift augmentation r in [0, 8) with zero fill
            # (reference: ste_gan/models/emg_encoder.py:71-75).
            r = jax.random.randint(self.make_rng("shift"), (), 0, 8)
            t = x.shape[1]
            x = jnp.roll(x, -r, axis=1)
            keep = jnp.arange(t)[None, :, None] < (t - r)
            x = jnp.where(keep, x, 0.0).astype(self.dtype)
        for block in self.res_blocks:
            x = block(x, train=train)
        return self.w_raw_in(x)

    def _heads(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (self.w_out(x).astype(jnp.float32),
                self.w_aux(x).astype(jnp.float32))

    def __call__(self, x_raw, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = self._frontend(x_raw, train)
        for layer in self.transformer_layers:
            x = layer(x, train=train)
        return self._heads(x)

    def embed(self, x_raw) -> jnp.ndarray:
        """Pre-head transformer-stack activations [B, T/16, model_size].

        The embedding space of the Fréchet realism metric (realism.py).
        No training objective ever touches this representation directly —
        the SU/phoneme losses see only the ``w_out``/``w_aux`` projections
        — which is what makes distribution distances over it a fair
        not-directly-optimized realism measure."""
        x = self._frontend(x_raw, train=False)
        for layer in self.transformer_layers:
            x = layer(x, train=False)
        return x.astype(jnp.float32)

    def pipelined(self, x_raw, mesh, num_microbatches: int,
                  train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward with the transformer stack executed as a GPipe pipeline
        over ``mesh``'s 'stage' axis (parallel/pipeline_parallel.py).

        The conv frontend and heads run under plain GSPMD (batch sharded
        over the mesh's 'data' axis, replicated over 'stage'); the layer
        stack — the dominant compute — is stage-sharded: per-layer params
        stack on a leading axis, each device applies only its own layer,
        microbatches ride a ppermute ring. Differentiable end-to-end, so
        this drives training (train/encoder.py --pipeline_stages).

        Caveats: requires init/eval via ``__call__`` (this method applies
        existing layer params, it does not create them); with dropout > 0
        each stage derives its key from the layer index, and the mask is
        shared across microbatches within a step (the sequential path
        samples one mask over the whole batch — neither schedule can
        reproduce the other's stream); MoE layers are not pipelined."""
        if self.moe_experts > 0:
            raise NotImplementedError(
                "pipelined execution of MoE layers is unsupported — use "
                "expert parallelism (parallel/expert_parallel.py) instead")
        from ste_gan_tpu.parallel.pipeline_parallel import (
            STAGE_AXIS, pipeline_apply)

        num_stages = mesh.shape[STAGE_AXIS]
        num_layers = self.num_transformer_layers
        if num_layers % num_stages:
            raise ValueError(
                f"num_transformer_layers {num_layers} not divisible by "
                f"pipeline stages {num_stages}")
        per_stage = num_layers // num_stages

        x = self._frontend(x_raw, train)
        # [S, per_stage, ...]-stacked layer params: stage s owns layers
        # [s*per_stage, (s+1)*per_stage).
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs).reshape(
                num_stages, per_stage, *xs[0].shape),
            *[layer.variables["params"] for layer in self.transformer_layers])
        payload = {"params": stacked}
        use_dropout = train and self.dropout > 0
        if use_dropout:
            keys = jax.random.split(self.make_rng("dropout"), num_layers)
            # [S, per_stage, *key_dims] — works for typed keys (no trailing
            # dims) and legacy uint32[2] keys alike.
            payload["rng"] = keys.reshape(num_stages, per_stage,
                                          *keys.shape[1:])
        # parent=None: a detached template module (NOT a submodule of this
        # encoder — its params are the stage slices fed through payload).
        layer_template = TransformerEncoderLayer(
            d_model=self.model_size, num_heads=self.num_heads,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout, relative_positional=True,
            relative_positional_distance=self.relative_positional_distance,
            dtype=self.dtype, parent=None)

        def layer_fn(p, x_mb):
            for j in range(per_stage):
                params_j = jax.tree.map(lambda a: a[j], p["params"])
                if use_dropout:
                    x_mb = layer_template.apply(
                        {"params": params_j}, x_mb, train=True,
                        rngs={"dropout": p["rng"][j]})
                else:
                    x_mb = layer_template.apply({"params": params_j}, x_mb,
                                                train=False)
            return x_mb

        x = pipeline_apply(layer_fn, payload, x, mesh, num_microbatches)
        return self._heads(x)


def init_emg_encoder(cfg, dtype=jnp.float32) -> EMGEncoderTransformer:
    """Factory from config (reference init_emg_encoder;
    ste_gan/models/emg_encoder.py:91-115)."""
    if cfg.emg_encoder.type != "EMGEncoderTransformer":
        raise ValueError(f"Unknown EMG encoder type: {cfg.emg_encoder.type}")
    return EMGEncoderTransformer(
        num_ins=cfg.data.num_emg_channels,
        num_outs=C.SPEECH_UNITS_FEAT_SIZE,
        num_aux_outs=C.NUM_PHONEMES,
        dtype=dtype,
        **(cfg.emg_encoder.params or {}),
    )
