"""Probe: dual-net AdamW update formulations on the real GAN param trees.

step_breakdown.py measured the optax AdamW chain at ~12.8 ms for both nets
— ~10x off the HBM roofline for ~1 GB of optimizer traffic. The parameter
trees have ~300 leaves and optax runs several tree-wide passes, so the cost
is thousands of tiny kernel launches, not bandwidth. Variants:

  optax   — inject_hyperparams(optax.adamw)          (shipped round 1)
  treemap — ONE fused AdamW expression per leaf returning new params
  flat    — ravel+concat all leaves -> ONE elementwise chain -> split
  pallas  — per-leaf Pallas kernel (ops/fused_adamw.py; round-1 shelf item)

All variants share the exact optax.adamw math (bias correction + decoupled
weight decay). Chained timing (state feeds forward; host sync at the end).

Usage: python benchmarks/opt_probe.py [--iters 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ste_gan_tpu.config import Config
from ste_gan_tpu.ops.flat_adamw import flat_adamw_apply, flat_adamw_init
from ste_gan_tpu.ops.fused_adamw import (
    FusedAdamWState, fused_adamw_update)
from ste_gan_tpu.train.gan import build_models, init_state
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

B1, B2, EPS, WD, LR = 0.8, 0.99, 1e-8, 1e-2, 2e-4


def adamw_math(p, g, m, v, lr, bc1, bc2):
    m_new = B1 * m + (1.0 - B1) * g
    v_new = B2 * v + (1.0 - B2) * jnp.square(g)
    update = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS) + WD * p
    return p - lr * update, m_new, v_new


def timeit(step, carry, iters, label):
    carry, aux = step(carry)
    float(np.asarray(aux))
    carry, aux = step(carry)
    float(np.asarray(aux))
    start = time.perf_counter()
    for _ in range(iters):
        carry, aux = step(carry)
    float(np.asarray(aux))
    ms = (time.perf_counter() - start) / iters * 1e3
    print(f"  {label:10s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = Config()
    models = build_models(cfg)
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    params = {"g": state0.gen_params, "d": state0.disc_params}
    n_leaves = len(jax.tree.leaves(params))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"platform={jax.devices()[0].platform} leaves={n_leaves} "
          f"params={n_params/1e6:.1f}M iters={args.iters}", flush=True)
    grads = jax.tree.map(lambda p: p * 1e-3 + 1e-5, params)
    results = {}

    # ---- optax chain (current default) ----
    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD)

    @jax.jit
    def optax_step(carry):
        p, s = carry
        upd, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, upd)
        return (p, s), jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    results["optax"] = timeit(optax_step, (params, opt.init(params)),
                              args.iters, "optax")

    # ---- tree-map fused expression per leaf ----
    @jax.jit
    def treemap_step(carry):
        p, m, v, count = carry
        count = count + 1
        bc1 = 1.0 - B1 ** count.astype(jnp.float32)
        bc2 = 1.0 - B2 ** count.astype(jnp.float32)
        out = jax.tree.map(lambda pi, gi, mi, vi: adamw_math(
            pi, gi, mi, vi, LR, bc1, bc2), p, grads, m, v)
        p = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        v = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return (p, m, v, count), jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    zeros = jax.tree.map(jnp.zeros_like, params)
    results["treemap"] = timeit(
        treemap_step, (params, zeros, jax.tree.map(jnp.zeros_like, zeros),
                       jnp.zeros((), jnp.int32)),
        args.iters, "treemap")

    # ---- flat single-buffer chain ----
    flat_state = flat_adamw_init(params)

    @jax.jit
    def flat_step(carry):
        p, s = carry
        p, s = flat_adamw_apply(p, grads, s, lr=LR, b1=B1, b2=B2, eps=EPS,
                                weight_decay=WD)
        return (p, s), jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    results["flat"] = timeit(flat_step, (params, flat_state), args.iters,
                             "flat")

    # ---- per-leaf pallas (round-1 kernel) ----
    pal_state = FusedAdamWState(
        jnp.zeros((), jnp.int32), jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, params))

    @jax.jit
    def pallas_step(carry):
        p, s = carry
        p, s = fused_adamw_update(p, grads, s, lr=LR, b1=B1, b2=B2, eps=EPS,
                                  weight_decay=WD)
        return (p, s), jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    results["pallas"] = timeit(pallas_step, (params, pal_state), args.iters,
                               "pallas")

    # ---- flat buffers + ONE pallas kernel over them ----
    @jax.jit
    def flat_pallas_step(carry):
        p, s = carry
        p, s = flat_adamw_apply(p, grads, s, lr=LR, b1=B1, b2=B2, eps=EPS,
                                weight_decay=WD, use_pallas=True)
        return (p, s), jnp.sum(jax.tree.leaves(p)[0].astype(jnp.float32))

    results["flat_pallas"] = timeit(flat_pallas_step, (params, flat_state),
                                    args.iters, "flat+pallas")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
