"""Flat single-buffer AdamW: the whole update as ONE elementwise chain.

Why: the GAN step updates ~300 parameter leaves across two networks. The
optax AdamW chain runs several tree-wide passes, so XLA emits thousands of
tiny kernels — measured ~12.8 ms per step on v5e (benchmarks/opt_probe.py),
~10x off the HBM roofline for the ~1 GB the update actually has to move.
The reference hits the same class of overhead as per-tensor CUDA launches
and would use a multi-tensor/fused optimizer; the TPU-native fix is
structural: ravel every leaf into ONE f32 buffer, run the AdamW math as a
single fused elementwise chain over it (one XLA loop at memory bandwidth),
and slice the leaves back out.

Semantics match ``optax.adamw(lr, b1, b2, eps, weight_decay)`` exactly —
bias-corrected moments + decoupled weight decay (verified bit-for-bit in
tests/test_fused_adamw.py)::

    m' = b1*m + (1-b1)*g
    v' = b2*v + (1-b2)*g^2
    p' = p - lr * ( (m'/(1-b1^t)) / (sqrt(v'/(1-b2^t)) + eps) + wd*p )

The moment buffers live flat in the optimizer state; parameters stay in
their tree (flattened on entry, sliced back on exit — pure bandwidth).
``hyperparams['learning_rate']`` mirrors ``optax.inject_hyperparams`` so
the trainer's per-epoch LR decay keeps writing a host scalar with no
recompilation (ste_gan_tpu/train/gan.py::set_learning_rate).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FlatAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: jnp.ndarray          # [N] f32
    nu: jnp.ndarray          # [N] f32
    hyperparams: Dict[str, jnp.ndarray]


def _flatten(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([l.reshape(-1).astype(jnp.float32) for l in leaves])


def _unflatten_like(flat: jnp.ndarray, tree):
    leaves, treedef = jax.tree.flatten(tree)
    out, off = [], 0
    for l in leaves:
        out.append(flat[off:off + l.size].reshape(l.shape).astype(l.dtype))
        off += l.size
    return jax.tree.unflatten(treedef, out)


def flat_adamw_init(params, learning_rate: float = 2e-4) -> FlatAdamWState:
    n = sum(l.size for l in jax.tree.leaves(params))
    return FlatAdamWState(
        count=jnp.zeros((), jnp.int32),
        mu=jnp.zeros((n,), jnp.float32),
        nu=jnp.zeros((n,), jnp.float32),
        hyperparams={"learning_rate": jnp.asarray(learning_rate, jnp.float32)},
    )


def flat_adamw_apply(params, grads, state: FlatAdamWState, *,
                     lr=None, b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8, weight_decay: float = 1e-2,
                     use_pallas: bool = False,
                     ) -> Tuple[Any, FlatAdamWState]:
    """One AdamW step; returns (new_params, new_state).

    ``lr`` defaults to ``state.hyperparams['learning_rate']``.
    ``use_pallas`` runs the flat chain as one Pallas kernel instead of the
    XLA elementwise chain (A/B'd in benchmarks/opt_probe.py).
    """
    if lr is None:
        lr = state.hyperparams["learning_rate"]
    lr = jnp.asarray(lr, jnp.float32)
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)

    p = _flatten(params)
    g = _flatten(grads)
    if use_pallas:
        from ste_gan_tpu.ops.fused_adamw import _fused_leaf_update

        scalars = jnp.stack([lr, jnp.float32(b1), jnp.float32(b2),
                             jnp.float32(eps), jnp.float32(weight_decay),
                             bc1, bc2])
        p, m, v = _fused_leaf_update(
            p, g, state.mu, state.nu, scalars,
            interpret=jax.default_backend() != "tpu")
    else:
        m = b1 * state.mu + (1.0 - b1) * g
        v = b2 * state.nu + (1.0 - b2) * jnp.square(g)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + eps) + weight_decay * p
        p = p - lr * update

    new_params = _unflatten_like(p, params)
    return new_params, FlatAdamWState(count, m, v, dict(state.hyperparams))
