"""Mixture-of-Experts feed-forward block (scaling extension).

The reference's transformer FFN is a single dense ReLU MLP
(/root/reference/ste_gan/layers/transformer.py:8-61 ``linear1``/``linear2``);
there is no MoE anywhere in the reference. This module is the framework's
*width*-scaling extension: the encoder's FFN capacity can grow by adding
experts whose weights shard over an ``expert`` mesh axis
(``parallel/expert_parallel.py``) instead of growing the dense matmul —
the canonical TPU recipe for parameter scaling past one chip's HBM.

Design (the GShard/Switch einsum formulation — everything static-shaped and
MXU-friendly; no sorting, no ragged buffers):

* a router projects each token to ``E`` logits; softmax gates in f32;
* top-k assignment with a fixed per-expert **capacity**
  ``C = ceil(capacity_factor * k * S / E)`` — tokens beyond an expert's
  capacity are dropped (their combine weight is zero, so the residual
  connection simply passes them through unchanged);
* dispatch/combine are dense one-hot tensors ``[S, E, C]``; expert input
  gathering, the per-expert FFN, and the weighted return are three einsums
  over expert-stacked weights ``[E, ...]`` — exactly the contraction
  pattern GSPMD partitions into all-to-alls when the ``E`` axis is sharded;
* a Switch-style load-balancing auxiliary loss ``E * sum(f_e * p_e)`` is
  sown into the ``"losses"`` collection; trainers add it with a small
  weight (train/encoder.py::make_encoder_train_step ``moe_aux_weight``).

With ``num_experts=1`` (and enough capacity) the block is exactly the dense
ReLU FFN — asserted in ``tests/test_moe.py``.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ste_gan_tpu.models.transformer import torch_linear_init


class MoEFeedForward(nn.Module):
    """Token-routed mixture of ReLU FFN experts; drop-in for the dense FFN.

    Input/output ``[B, T, D]``; each token is processed by its top-k experts
    and the gated sum returned. Dropped tokens (over capacity) return zero —
    callers keep their residual connection, so a drop degrades to identity.
    """

    num_experts: int
    dim_feedforward: int
    top_k: int = 2
    capacity_factor: float = 1.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, d = x.shape
        s = b * t
        e = self.num_experts
        k = min(self.top_k, e)
        cap = min(s, max(1, int(math.ceil(
            self.capacity_factor * k * s / e))))
        tokens = x.reshape(s, d).astype(self.dtype)

        # Router in f32: gate quality is precision-sensitive, the matmul is
        # tiny ([S, D] x [D, E]).
        router = self.param("router", nn.initializers.normal(d ** -0.5),
                            (d, e))
        logits = jnp.einsum("sd,de->se", tokens.astype(jnp.float32),
                            router.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)  # [S, E] f32

        # Iterative top-k with per-expert positions (cumsum over the token
        # axis continues across the k rounds, Switch/GShard-style: round 0
        # fills first, later choices take what capacity remains).
        counts = jnp.zeros((e,), jnp.float32)
        top1_mask = None
        dispatch = jnp.zeros((s, e, cap), jnp.float32)
        slots = []  # (kept_mask [S,E], pos [S], gate [S]) per round
        remaining = gates
        for _ in range(k):
            idx = jnp.argmax(remaining, axis=-1)
            mask = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # [S, E]
            gate = jnp.sum(gates * mask, axis=-1)  # [S]
            remaining = remaining * (1.0 - mask)
            if top1_mask is None:
                top1_mask = mask
            pos = jnp.cumsum(mask, axis=0) - mask + counts[None, :]
            counts = counts + jnp.sum(mask, axis=0)
            kept = mask * (pos < cap).astype(jnp.float32)
            slots.append((kept, jnp.sum(pos * kept, axis=-1), gate))

        # Normalise gates over the k selections, then build the one-hot
        # dispatch [S, E, C] and its gate-weighted combine counterpart.
        denom = jnp.maximum(sum(g for _, _, g in slots), 1e-9)
        combine = jnp.zeros((s, e, cap), jnp.float32)
        for kept, pos, gate in slots:
            sel = kept[:, :, None] * jax.nn.one_hot(
                pos.astype(jnp.int32), cap, dtype=jnp.float32)[:, None, :]
            dispatch = dispatch + sel
            combine = combine + (gate / denom)[:, None, None] * sel

        # Expert-stacked FFN weights [E, ...] — the leading axis is what
        # expert parallelism shards (parallel/expert_parallel.py).
        w1 = self.param("w1", torch_linear_init(d),
                        (e, d, self.dim_feedforward))
        b1 = self.param("b1", torch_linear_init(d), (e, self.dim_feedforward))
        w2 = self.param("w2", torch_linear_init(self.dim_feedforward),
                        (e, self.dim_feedforward, d))
        b2 = self.param("b2", torch_linear_init(self.dim_feedforward), (e, d))

        xe = jnp.einsum("sec,sd->ecd", dispatch.astype(self.dtype), tokens)
        h = jax.nn.relu(
            jnp.einsum("ecd,edf->ecf", xe, w1.astype(self.dtype))
            + b1[:, None, :].astype(self.dtype))
        ye = (jnp.einsum("ecf,efd->ecd", h, w2.astype(self.dtype))
              + b2[:, None, :].astype(self.dtype))
        y = jnp.einsum("sec,ecd->sd", combine.astype(self.dtype), ye)

        # Switch load-balancing loss on the top-1 assignment: E * Σ f_e p_e
        # (= 1 at perfect balance). f uses the pre-capacity mask so the
        # gradient signal survives even when drops occur.
        f_frac = jnp.mean(top1_mask, axis=0)
        p_frac = jnp.mean(gates, axis=0)
        aux = (e * jnp.sum(f_frac * p_frac)).astype(jnp.float32)
        if not self.is_initializing():  # keep init variables to params only
            self.sow("losses", "moe_aux", aux)
        return y.reshape(b, t, d)
