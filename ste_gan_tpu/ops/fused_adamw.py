"""Fused AdamW update as a Pallas TPU kernel.

optax's AdamW is a chain of small elementwise transforms, each making its
own pass over the parameter/moment buffers — on a v5e the dual-optimizer
update of the GAN step measures ~6 ms, far from the HBM roofline. This
kernel performs the whole update (bias-corrected Adam moments + decoupled
weight decay + parameter application) in ONE pass per buffer: each grid step
reads tiles of (param, grad, m, v) from HBM into VMEM, computes on the VPU,
and writes (param', m', v') back (~1.3x the optax chain on v5e, chained-state
timing).

Semantics match ``optax.adamw(lr, b1, b2, eps, weight_decay)`` exactly
(verified against optax in tests):

    m' = b1*m + (1-b1)*g
    v' = b2*v + (1-b2)*g^2
    update = m'/(1-b1^t) / (sqrt(v'/(1-b2^t)) + eps) + wd*p
    p' = p - lr*update

Exposed both as :func:`fused_adamw_update` (tree-level) and as
:func:`fused_adamw` — an ``optax.GradientTransformation`` with injectable
learning rate, drop-in for the trainer's optimizer. Leaves are flattened and
processed in lane-aligned [rows, 128] tiles; a pure-jnp fallback covers
non-TPU backends and tiny leaves.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

_LANES = 128
_TILE_ROWS = 512  # 512x128 f32 tiles: 256 KiB per buffer, 7 buffers < 2 MiB
_MIN_FUSED_SIZE = _LANES  # smaller leaves just use the jnp path


def _adamw_math(p, g, m, v, lr, b1, b2, eps, wd, bc1, bc2):
    m_new = b1 * m + (1.0 - b1) * g
    v_new = b2 * v + (1.0 - b2) * jnp.square(g)
    m_hat = m_new / bc1
    v_hat = v_new / bc2
    update = m_hat / (jnp.sqrt(v_hat) + eps) + wd * p
    return p - lr * update, m_new, v_new


def _adamw_kernel(scalars_ref, p_ref, g_ref, m_ref, v_ref,
                  p_out, m_out, v_out):
    lr = scalars_ref[0]
    b1 = scalars_ref[1]
    b2 = scalars_ref[2]
    eps = scalars_ref[3]
    wd = scalars_ref[4]
    bc1 = scalars_ref[5]
    bc2 = scalars_ref[6]
    p_new, m_new, v_new = _adamw_math(
        p_ref[:], g_ref[:], m_ref[:], v_ref[:], lr, b1, b2, eps, wd, bc1, bc2)
    p_out[:] = p_new
    m_out[:] = m_new
    v_out[:] = v_new


@partial(jax.jit, static_argnames=("interpret",))
def _fused_leaf_update(p, g, m, v, scalars, interpret=False):
    """One-pass AdamW for a single flat leaf, tiled [TILE_ROWS, 128]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = p.shape
    n = p.size
    cols = _LANES
    rows = -(-n // cols)
    pad = rows * cols - n

    def prep(x):
        x = x.reshape(-1).astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
        return x.reshape(rows, cols)

    p2, g2, m2, v2 = prep(p), prep(g), prep(m), prep(v)
    tile = min(_TILE_ROWS, rows)
    grid = (-(-rows // tile),)
    if rows % tile:
        extra = grid[0] * tile - rows
        p2, g2, m2, v2 = (jnp.pad(x, ((0, extra), (0, 0)))
                          for x in (p2, g2, m2, v2))

    spec = pl.BlockSpec((tile, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(p2.shape, jnp.float32)
    p_new, m_new, v_new = pl.pallas_call(
        _adamw_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(scalars, p2, g2, m2, v2)

    def unprep(x):
        return x.reshape(-1)[:n].reshape(orig_shape)

    return unprep(p_new), unprep(m_new), unprep(v_new)


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def fused_adamw_update(params, grads, state: FusedAdamWState, lr,
                       b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
                       interpret=None):
    """Apply one fused AdamW step; returns (new_params, new_state)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(lr, jnp.float32), jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32), jnp.asarray(eps, jnp.float32),
        jnp.asarray(weight_decay, jnp.float32), bc1, bc2])

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        if p.size >= _MIN_FUSED_SIZE:
            pn, mn, vn = _fused_leaf_update(p, g, m, v, scalars,
                                            interpret=interpret)
        else:
            pn, mn, vn = _adamw_math(
                p.astype(jnp.float32), g.astype(jnp.float32),
                m.astype(jnp.float32), v.astype(jnp.float32),
                scalars[0], scalars[1], scalars[2], scalars[3], scalars[4],
                scalars[5], scalars[6])
        new_p.append(pn.astype(p.dtype))
        new_m.append(mn)
        new_v.append(vn)

    return (jax.tree.unflatten(treedef, new_p),
            FusedAdamWState(count, jax.tree.unflatten(treedef, new_m),
                            jax.tree.unflatten(treedef, new_v)))


def fused_adamw(learning_rate: float, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=1e-2) -> optax.GradientTransformation:
    """optax-compatible wrapper with an injectable LR: the state carries
    ``hyperparams['learning_rate']`` like ``optax.inject_hyperparams`` so
    :func:`ste_gan_tpu.train.gan.set_learning_rate` works unchanged.

    NOTE: ``update`` returns *delta* updates (new_params - params) so
    ``optax.apply_updates`` composes as usual.
    """

    class _State(NamedTuple):
        count: jnp.ndarray
        mu: Any
        nu: Any
        hyperparams: dict

    def init(params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return _State(jnp.zeros((), jnp.int32), zeros,
                      jax.tree.map(jnp.zeros_like, zeros),
                      {"learning_rate": jnp.asarray(learning_rate, jnp.float32)})

    def update(grads, state, params=None):
        assert params is not None, "fused_adamw requires params"
        new_params, inner = fused_adamw_update(
            params, grads,
            FusedAdamWState(state.count, state.mu, state.nu),
            lr=state.hyperparams["learning_rate"],
            b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
        updates = jax.tree.map(lambda n, p: (n - p.astype(n.dtype)).astype(p.dtype),
                               new_params, params)
        return updates, _State(inner.count, inner.mu, inner.nu,
                               dict(state.hyperparams))

    return optax.GradientTransformation(init, update)
