"""Per-component timing breakdown of the fused GAN train step.

Times each constituent of the 57 ms step in isolation (chained inputs to
defeat the tunnel's (executable, args) memoization, host sync at the end),
at the exact bench shapes: batch 32 x 2048 samples, bf16, small
discriminators, full generator + frozen full encoder.

Components:
  gen fwd / fwd+bwd          generator apply, + vjp pullback of a cotangent
  disc fwd / fwd+bwd         ensemble on the stacked (fake, real) pair (B=64)
  enc fwd / fwd+bwd          frozen encoder fwd, + input-gradient pullback
  td_loss fwd+bwd            multi-window time-domain loss + grad
  gan+fm losses fwd+bwd      adversarial MSE + feature matching over fmaps
  optimizers                 both AdamW updates (optax chain)
  FULL STEP                  the real fused step (reference point)

The sum of parts exceeding the full step = XLA's cross-component fusion /
scheduling win; a component dominating the sum = the optimization target.

Usage: python benchmarks/step_breakdown.py [--iters 20]
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

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.losses.encoder_loss import emg_encoder_loss
from ste_gan_tpu.losses.gan_loss import (
    discriminator_loss, feature_matching_loss, generator_adversarial_loss)
from ste_gan_tpu.losses.td_loss import multi_time_domain_loss
from ste_gan_tpu.train.gan import build_models, init_state, make_train_step
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache


def timeit(step, state, iters, label):
    state, aux = step(state)
    float(np.asarray(aux))
    state, aux = step(state)
    float(np.asarray(aux))
    start = time.perf_counter()
    for _ in range(iters):
        state, aux = step(state)
    float(np.asarray(aux))
    ms = (time.perf_counter() - start) / iters * 1e3
    print(f"  {label:26s} {ms:8.3f} ms", flush=True)
    return ms


def chain(x, scalar):
    """Perturb a tensor by a result-dependent epsilon (breaks memoization)."""
    return x * (1.0 + 1e-9 * scalar.astype(jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = Config()
    cfg.train.fused_disc_passes = True
    models = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    b, chunk = cfg.train.batch_size, cfg.train.chunk_size
    frames = chunk // C.HOPSIZE
    rng_np = np.random.default_rng(0)

    enc_vars = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, chunk, 8)), train=False))(rng)
    state0 = init_state(cfg, models, rng)

    feats = jnp.asarray(rng_np.normal(size=(b, frames, 256)), jnp.float32)
    real = jnp.asarray(np.tanh(rng_np.normal(0, 0.4, (b, chunk, 8))),
                       jnp.float32)
    su = feats
    ph = jnp.asarray(rng_np.integers(0, C.NUM_PHONEMES, (b, frames)), jnp.int32)
    ids = jnp.asarray(rng_np.integers(0, C.NUM_EMG_SESSIONS, (b,)), jnp.int32)
    zeros = jnp.zeros((b,), jnp.int32)
    emg_pair = jnp.concatenate([real, real * 0.9], axis=0)

    gen_params = state0.gen_params
    disc_params = state0.disc_params
    spectral = state0.disc_spectral
    results = {}
    print(f"platform={jax.devices()[0].platform} B={b} chunk={chunk} "
          f"iters={args.iters}", flush=True)

    # ---- generator ----
    @jax.jit
    def gen_fwd(feats):
        feats = jax.lax.optimization_barrier(feats)
        y = models.generator.apply({"params": gen_params}, feats, ids, zeros)
        s = jnp.mean(y.astype(jnp.float32))
        return chain(feats, s), s

    @jax.jit
    def gen_fwdbwd(feats):
        feats = jax.lax.optimization_barrier(feats)
        def f(p):
            y = models.generator.apply({"params": p}, feats, ids, zeros)
            return jnp.mean(jnp.square(y).astype(jnp.float32))
        loss, grads = jax.value_and_grad(f)(gen_params)
        gsum = sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(grads))
        return chain(feats, loss), loss + gsum

    results["gen/fwd"] = timeit(gen_fwd, feats, args.iters, "gen fwd")
    results["gen/fwd+bwd"] = timeit(gen_fwdbwd, feats, args.iters, "gen fwd+bwd")

    # ---- discriminator ensemble (stacked pair, like the fused step) ----
    @jax.jit
    def disc_fwd(x):
        x = jax.lax.optimization_barrier(x)
        fmaps, _ = models.discriminator.apply(
            {"params": disc_params, "spectral": spectral}, x, train=True,
            mutable=["spectral"])
        s = sum(jnp.sum(fl[-1].astype(jnp.float32)) for fl in fmaps)
        return chain(x, s), s

    @jax.jit
    def disc_fwdbwd(x):
        x = jax.lax.optimization_barrier(x)
        def f(p, xin):
            fmaps, _ = models.discriminator.apply(
                {"params": p, "spectral": spectral}, xin, train=True,
                mutable=["spectral"])
            bsz = b
            fake = [[fm[:bsz] for fm in fl] for fl in fmaps]
            rl = [[fm[bsz:] for fm in fl] for fl in fmaps]
            return discriminator_loss(fake, rl)
        loss, (gp, gx) = jax.value_and_grad(f, argnums=(0, 1))(disc_params, x)
        gsum = sum(jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(gp))
        return chain(x, loss) + 1e-9 * gx, loss + gsum

    results["disc/fwd"] = timeit(disc_fwd, emg_pair, args.iters, "disc fwd (pair)")
    results["disc/fwd+bwd"] = timeit(disc_fwdbwd, emg_pair, args.iters,
                                     "disc fwd+bwd (pair)")

    # ---- frozen encoder (fwd + input gradients, as in the G loss) ----
    @jax.jit
    def enc_fwd(x):
        x = jax.lax.optimization_barrier(x)
        su_out, ph_out = models.encoder.apply(enc_vars, x, train=False)
        s = jnp.mean(su_out.astype(jnp.float32))
        return chain(x, s), s

    @jax.jit
    def enc_fwdbwd(x):
        x = jax.lax.optimization_barrier(x)
        def f(xin):
            su_l, ph_l, _ = emg_encoder_loss(
                lambda e: models.encoder.apply(enc_vars, e, train=False),
                xin, su, ph)
            return su_l + ph_l
        loss, gx = jax.value_and_grad(f)(x)
        return chain(x, loss) + 1e-9 * gx, loss

    results["enc/fwd"] = timeit(enc_fwd, real, args.iters, "enc fwd")
    results["enc/fwd+bwd"] = timeit(enc_fwdbwd, real, args.iters,
                                    "enc loss fwd+dx")

    # ---- TD loss ----
    @jax.jit
    def td_fwdbwd(x):
        x = jax.lax.optimization_barrier(x)
        loss, gx = jax.value_and_grad(
            lambda xin: multi_time_domain_loss(real, xin))(x)
        return chain(x, loss) + 1e-9 * gx, loss

    results["td/fwd+bwd"] = timeit(td_fwdbwd, real, args.iters, "td loss fwd+dx")

    # ---- optimizer updates (both nets, optax chain) ----
    opt = optax.inject_hyperparams(optax.adamw)(
        learning_rate=2e-4, b1=0.8, b2=0.99, eps=1e-8, weight_decay=1e-2)
    opt_g = opt.init(gen_params)
    opt_d = opt.init(disc_params)
    fake_gg = jax.tree.map(lambda p: p * 1e-3, gen_params)
    fake_gd = jax.tree.map(lambda p: p * 1e-3, disc_params)

    @jax.jit
    def opt_step(carry):
        gp, dp, og, od = carry
        gp = jax.lax.optimization_barrier(gp)
        ug, og = opt.update(fake_gg, og, gp)
        gp = optax.apply_updates(gp, ug)
        ud, od = opt.update(fake_gd, od, dp)
        dp = optax.apply_updates(dp, ud)
        s = jnp.sum(jax.tree.leaves(gp)[0].astype(jnp.float32))
        return (gp, dp, og, od), s

    results["opt/both"] = timeit(opt_step, (gen_params, disc_params, opt_g, opt_d),
                                 args.iters, "optimizers (both)")

    # ---- full fused step ----
    step = jax.jit(make_train_step(cfg, models), donate_argnums=0)
    batch = {
        C.DataType.REAL_EMG: real, C.DataType.SPEECH_UNITS: su,
        C.DataType.PHONEMES: ph, C.DataType.SESSION_INDEX: ids,
        C.DataType.SPEAKING_MODE_INDEX: zeros,
    }

    def full(state):
        new_state, metrics = step(state, batch, enc_vars)
        return new_state, metrics["loss/generator"]

    results["full_step"] = timeit(full, state0, args.iters, "FULL STEP")

    parts = (results["gen/fwd+bwd"] + results["disc/fwd+bwd"] * 2
             + results["enc/fwd+bwd"] + results["td/fwd+bwd"]
             + results["opt/both"])
    print(f"  {'sum-of-parts (approx)':26s} {parts:8.3f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
