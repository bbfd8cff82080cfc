"""Probe: grouped-conv formulations on the scale-discriminator geometries.

VERDICT r1 item 3: the fused GAN step carries ~4 ms of XLA layout-change
copies around the scale discriminators' grouped convs. This probe measures,
on the real chip, the small-variant grouped stack (layers 1+2; reference
analogue ste_gan/models/discriminator.py:47-67) under competing
formulations, forward-only and forward+backward:

  lax    — jax.lax.conv_general_dilated, feature_group_count (current impl)
  lax_ncw— same but NCW/IOW layouts (does XLA pick better layouts?)
  pallas — ste_gan_tpu.ops.pallas_conv slab block-diagonal MXU kernel

Timing chains the input through every iteration (x <- x * (1 + eps*loss))
because the TPU tunnel memoizes identical (executable, args) executions
(CLAUDE.md), and forces a host sync at the end.

Usage: python benchmarks/grouped_conv_probe.py [--iters 30] [--batch 64]
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

from ste_gan_tpu.ops.pallas_conv import grouped_conv1d, lax_grouped_conv1d
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

# Small-variant scale-disc grouped layers at bench shapes (B doubled by
# fused (fake,real) passes): L1 128->256 k37 s2 g4, L2 256->512 k37 s2 g16.
LAYERS = [
    dict(cin=128, cout=256, k=37, stride=2, pad=18, groups=4),
    dict(cin=256, cout=512, k=37, stride=2, pad=18, groups=16),
]


def make_params(rng, dtype):
    ws = []
    for spec in LAYERS:
        w = rng.normal(size=(spec["k"], spec["cin"] // spec["groups"],
                             spec["cout"])).astype(np.float32) * 0.05
        ws.append(jnp.asarray(w, dtype))
    return ws


def stack_fn(conv, dtype):
    def fwd(x, ws):
        h = x.astype(dtype)
        for w, spec in zip(ws, LAYERS):
            h = conv(h, w, stride=spec["stride"],
                     padding=(spec["pad"], spec["pad"]),
                     groups=spec["groups"])
            h = jax.nn.leaky_relu(h, 0.1)
        return h
    return fwd


def lax_ncw(x, w, *, stride, padding, groups):
    # x [B,T,C] -> NCW; kernel [K,cg,Cout] -> OIW.
    xt = jnp.transpose(x, (0, 2, 1))
    wt = jnp.transpose(w, (2, 1, 0))
    dn = jax.lax.conv_dimension_numbers(xt.shape, wt.shape,
                                        ("NCW", "OIW", "NCW"))
    y = jax.lax.conv_general_dilated(
        xt, wt.astype(xt.dtype), window_strides=(stride,), padding=(padding,),
        dimension_numbers=dn, feature_group_count=groups)
    return jnp.transpose(y, (0, 2, 1))


def timeit(step, x, ws, iters, label):
    x, aux = step(x, ws)          # compile + warm
    float(jnp.sum(aux))
    x, aux = step(x, ws)
    float(jnp.sum(aux))
    start = time.perf_counter()
    for _ in range(iters):
        x, aux = step(x, ws)
    float(jnp.sum(aux))           # host sync: everything really executed
    ms = (time.perf_counter() - start) / iters * 1e3
    print(f"  {label:28s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    enable_compilation_cache()
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(args.batch, args.t, LAYERS[0]["cin"])),
                     jnp.float32)
    ws = make_params(rng, dtype)
    variants = {
        "lax": lax_grouped_conv1d,
        "lax_ncw": lax_ncw,
        "pallas": grouped_conv1d,
    }
    results = {}
    print(f"platform={jax.devices()[0].platform} B={args.batch} T={args.t} "
          f"dtype={args.dtype} iters={args.iters}", flush=True)

    for name, conv in variants.items():
        fwd = stack_fn(conv, dtype)

        @jax.jit
        def fwd_step(x, ws, fwd=fwd):
            # optimization_barrier: keep the chain update out of the conv
            # fusions (fusing it crashes XLA's fusion emitter on strided
            # convs, and it would distort the measurement anyway).
            x = jax.lax.optimization_barrier(x)
            y = fwd(x, ws)
            loss = jnp.mean(jnp.square(y).astype(jnp.float32))
            # chain: next input depends on this result -> no memoization
            return x * (1.0 + 1e-9 * loss), loss

        @jax.jit
        def grad_step(x, ws, fwd=fwd):
            x = jax.lax.optimization_barrier(x)
            def loss_fn(x_, ws_):
                y = fwd(x_, ws_)
                return jnp.mean(jnp.square(y).astype(jnp.float32))
            loss, (dx, dws) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(x, ws)
            chained = x * (1.0 + 1e-9 * loss) + 1e-9 * dx
            return chained, loss + sum(jnp.sum(d).astype(jnp.float32)
                                       for d in jax.tree.leaves(dws))

        results[f"{name}/fwd"] = timeit(fwd_step, x0, ws, args.iters,
                                        f"{name} fwd")
        results[f"{name}/fwd+bwd"] = timeit(grad_step, x0, ws, args.iters,
                                            f"{name} fwd+bwd")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
