"""Transformer encoder layer with learned relative positional logits.

Parity with the reference (ste_gan/layers/transformer.py): post-norm encoder
layer (self-attention -> residual+LayerNorm -> ReLU FFN -> residual+
LayerNorm), multi-head attention with per-head projection tensors, and
fairseq-style *unmasked* learned relative positional embeddings clipped at a
maximum distance (100): relative offsets beyond the window contribute a
-1e8 logit, i.e. attention is effectively windowed to +/-(max_distance - 1).

TPU-native design: batch-first [B, T, D] (the reference is time-first), all
projections as einsums that lower onto the MXU, and relative-to-absolute
re-indexing done with the pad/reshape "skew trick" (pure pads/reshapes/
slices). A gather (``take_along_axis``) variant was tried and reverted: on
TPU the gather forces layout-change copies of every [B,H,L,2L-1] logits
tensor (measured +6.5 ms/step in the fused GAN step — see PARITY.md).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init(fan_in: int):
    """U(+/- 1/sqrt(fan_in)) — PyTorch nn.Linear default."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """nn.Dense with PyTorch-default initialisation (parity of init scale)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init(fan_in),
                            (fan_in, self.features))
        y = jnp.einsum("...d,df->...f", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", torch_linear_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def relative_position_index(length: int) -> jnp.ndarray:
    """[L, L] matrix of gather indices: idx[q, k] = (k - q) + (L - 1)."""
    q = jnp.arange(length)[:, None]
    k = jnp.arange(length)[None, :]
    return k - q + (length - 1)


class RelativePositionalLogits(nn.Module):
    """Learned relative positional logits added to attention scores.

    Embedding table covers offsets in [-(max_distance-1), max_distance-1]
    (2*max_distance - 1 entries, per head). Offsets outside the window get a
    -1e8 logit (reference: ste_gan/layers/transformer.py:255-262).
    """

    max_distance: int = 100
    num_heads: int = 8
    head_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q):
        """q: [B, H, L, Dh] queries -> [B, H, L, L] positional logits."""
        length = q.shape[2]
        num_emb = 2 * self.max_distance - 1
        emb = self.param(
            "embeddings",
            nn.initializers.normal(self.head_dim ** -0.5),
            (self.num_heads, num_emb, self.head_dim),
        )
        # Center the learned table inside the [-(L-1), L-1] offset range.
        if length >= self.max_distance:
            pad = length - self.max_distance
            table = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
        else:
            start = self.max_distance - length
            table = jax.lax.dynamic_slice_in_dim(emb, start, 2 * length - 1, axis=1)

        # [B, H, L, M] logits against every offset bucket, then the
        # pad/reshape "skew" re-indexing to [B, H, L, L]. The skew is pure
        # pads/reshapes/slices — unlike a gather it needs no layout-change
        # copies on TPU (measured: the gather variant forced a relayout of
        # every [B,H,L,2L-1] tensor).
        logits = jnp.einsum("bhld,hmd->bhlm", q.astype(self.dtype),
                            table.astype(self.dtype))
        b, h = logits.shape[:2]
        x = jnp.pad(logits, ((0, 0), (0, 0), (0, 0), (0, 1)))  # [b,h,L,2L]
        x = x.reshape(b, h, length * 2 * length)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, length - 1)))
        x = x.reshape(b, h, length + 1, 2 * length - 1)
        out = x[:, :, :length, length - 1:]
        if length > self.max_distance:
            idx = relative_position_index(length)
            offset = idx - (length - 1)
            out_of_range = jnp.abs(offset) >= self.max_distance
            out = out + jnp.where(out_of_range, -1e8, 0.0).astype(out.dtype)
        return out


class MultiHeadAttention(nn.Module):
    """Per-head-projection MHA with relative positional logits
    (reference: ste_gan/layers/transformer.py:63-113); batch-first."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    relative_positional: bool = True
    relative_positional_distance: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d_qkv = self.d_model // self.num_heads
        assert d_qkv * self.num_heads == self.d_model

        def proj_param(name):
            # xavier_normal_ on the reference's [H, d_model, d_qkv] tensor uses
            # PyTorch's >2-D fan rule: fan_in = size(1)*prod(shape[2:]) =
            # d_model*d_qkv, fan_out = size(0)*prod(shape[2:]) = H*d_qkv, so
            # std = sqrt(2 / ((d_model + H) * d_qkv)).
            std = math.sqrt(2.0 / ((self.d_model + self.num_heads) * d_qkv))
            return self.param(name, nn.initializers.normal(std),
                              (self.num_heads, self.d_model, d_qkv))

        w_q, w_k, w_v = proj_param("w_q"), proj_param("w_k"), proj_param("w_v")
        # w_o is [H, d_qkv, d_model]: fan_in = d_qkv*d_model, fan_out = H*d_model.
        std_o = math.sqrt(2.0 / ((d_qkv + self.num_heads) * self.d_model))
        w_o = self.param("w_o", nn.initializers.normal(std_o),
                         (self.num_heads, d_qkv, self.d_model))

        xc = x.astype(self.dtype)
        q = jnp.einsum("btf,hfa->bhta", xc, w_q.astype(self.dtype))
        k = jnp.einsum("btf,hfa->bhta", xc, w_k.astype(self.dtype))
        v = jnp.einsum("btf,hfa->bhta", xc, w_v.astype(self.dtype))

        logits = jnp.einsum("bhqa,bhka->bhqk", q, k)
        logits = logits.astype(jnp.float32) / math.sqrt(d_qkv)
        if self.relative_positional:
            logits = logits + RelativePositionalLogits(
                max_distance=self.relative_positional_distance,
                num_heads=self.num_heads, head_dim=d_qkv, dtype=self.dtype,
                name="relative_positional")(q).astype(jnp.float32)

        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
        o = jnp.einsum("bhqk,bhka->bhqa", probs, v.astype(self.dtype))
        out = jnp.einsum("bhta,haf->btf", o.astype(self.dtype),
                         w_o.astype(self.dtype))
        return out.astype(self.dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer with ReLU FFN
    (reference: ste_gan/layers/transformer.py:8-61).

    ``moe_experts > 0`` swaps the dense FFN for a token-routed
    mixture-of-experts block (``models/moe.py``) — a scaling extension with
    no reference counterpart; the default (0) is parity-exact."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    relative_positional: bool = True
    relative_positional_distance: int = 100
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = MultiHeadAttention(
            d_model=self.d_model, num_heads=self.num_heads, dropout=self.dropout,
            relative_positional=self.relative_positional,
            relative_positional_distance=self.relative_positional_distance,
            dtype=self.dtype, name="self_attn")(x, train=train)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)

        if self.moe_experts > 0:
            from ste_gan_tpu.models.moe import MoEFeedForward

            h = MoEFeedForward(
                num_experts=self.moe_experts,
                dim_feedforward=self.dim_feedforward,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype, name="moe_ffn")(x, train=train)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        else:
            h = Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)
        return x
