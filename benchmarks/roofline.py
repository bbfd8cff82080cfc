"""Roofline analysis of the fused GAN train step (VERDICT r4 #3).

Answers, with XLA's own numbers rather than an assertion: how far is the
measured 57 ms step from what this chip can do?

Method: compile the EXACT benchmark program (bench.py configuration —
batch 32 x 2048 samples, full generator + small discriminators + frozen
encoder, every loss, bf16) and read the compiled executable's cost
analysis (total FLOPs and bytes accessed of the optimized, fused HLO).
Combine with the chip's peak matrix throughput and HBM bandwidth:

    t_compute = FLOPs / peak_FLOPs    (every op on the MXU at peak)
    t_memory  = bytes / peak_HBM_BW   (every byte streamed once at peak)
    attainable >= max(t_compute, t_memory)  (the roofline)

and compare against the measured step time. The same decomposition is
reported per phase (generator fwd, generator fwd+bwd, discriminator pair
pass fwd / with grads, encoder fwd) by compiling each sub-program
separately.

Caveats stated up front: HLO "bytes accessed" is post-fusion logical
traffic — a good HBM proxy but not a measurement; peak FLOPs assumes
every multiply lands on the MXU in bf16 (f32 reductions and elementwise
VPU work count against it); the attainable bound ignores kernel launch
gaps and the serial dependency chain (G fwd -> D update -> G loss ->
G update), so TRUE attainable is higher than max(t_c, t_m). The
utilization numbers below are therefore optimistic lower bounds on
remaining headroom.

Usage (TPU): python benchmarks/roofline.py
Writes benchmarks/roofline.json; prose in benchmarks/ROOFLINE.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

#: (peak bf16 matrix TFLOP/s, peak HBM GB/s) per device kind substring.
#: Sources: public TPU system architecture documentation.
PEAKS = {
    "v6e": (918.0, 1640.0),
    "v6": (918.0, 1640.0),
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v5": (197.0, 819.0),
    "v4": (275.0, 1228.0),
}


def peak_for(device_kind: str):
    kind = device_kind.lower()
    for key, peaks in PEAKS.items():
        if key in kind:
            return peaks
    raise SystemExit(f"unknown device kind {device_kind!r}; add to PEAKS")


def cost_of(compiled) -> dict:
    """Total FLOPs / bytes accessed of a compiled executable."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0))}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ste_gan_tpu import constants as C
    from ste_gan_tpu.config import Config
    from ste_gan_tpu.train.gan import build_models, init_state, make_train_step
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    models = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    encoder_variables = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels)),
        train=False))(rng)
    state = init_state(cfg, models, rng)

    b, chunk = cfg.train.batch_size, cfg.train.chunk_size
    frames = chunk // C.HOPSIZE
    rng_np = np.random.default_rng(0)
    batch = {
        C.DataType.REAL_EMG: jnp.asarray(
            np.tanh(rng_np.normal(0, 0.4, (b, chunk, 8))), jnp.float32),
        C.DataType.SPEECH_UNITS: jnp.asarray(
            rng_np.normal(size=(b, frames, 256)), jnp.float32),
        C.DataType.PHONEMES: jnp.asarray(
            rng_np.integers(0, C.NUM_PHONEMES, (b, frames)), jnp.int32),
        C.DataType.SESSION_INDEX: jnp.asarray(
            rng_np.integers(0, C.NUM_EMG_SESSIONS, (b,)), jnp.int32),
        C.DataType.SPEAKING_MODE_INDEX: jnp.zeros((b,), jnp.int32),
    }

    device = jax.devices()[0]
    peak_tflops, peak_gbps = peak_for(device.device_kind)

    # ---- the full fused step: cost analysis + measured time ----
    step = jax.jit(make_train_step(cfg, models), donate_argnums=0)
    compiled = step.lower(state, batch, encoder_variables).compile()
    total = cost_of(compiled)

    state, metrics = step(state, batch, encoder_variables)
    float(np.asarray(metrics["loss/generator"]))
    for _ in range(5):
        state, metrics = step(state, batch, encoder_variables)
    float(np.asarray(metrics["loss/generator"]))
    num_steps = 30
    start = time.perf_counter()
    for _ in range(num_steps):
        state, metrics = step(state, batch, encoder_variables)
    float(np.asarray(metrics["loss/generator"]))
    measured_s = (time.perf_counter() - start) / num_steps

    # ---- per-phase sub-programs (forward / forward+backward costs) ----
    feature_key = cfg.model.speech_feature_type

    def gen_fwd(p, bt):
        return models.generator.apply(
            {"params": p}, bt[feature_key], bt[C.DataType.SESSION_INDEX],
            bt[C.DataType.SPEAKING_MODE_INDEX])

    def gen_fwd_bwd(p, bt):
        fake, vjp = jax.vjp(lambda q: gen_fwd(q, bt), p)
        return vjp(jnp.ones_like(fake))

    def disc_pair(dp, sp, fake, real):
        (ff, fr), mut = models.discriminator.apply(
            {"params": dp, "spectral": sp}, fake, train=True, pair=real,
            mutable=["spectral"])
        return ff, fr, mut["spectral"]

    def disc_pair_grad(dp, sp, fake, real):
        def loss(dp_):
            ff, fr, sp_ = disc_pair(dp_, sp, fake, real)
            out = sum(jnp.mean(jnp.square(f[-1])) + jnp.mean(jnp.square(r[-1]))
                      for f, r in zip(ff, fr))
            return out
        return jax.grad(loss)(dp)

    def enc_fwd(ev, emg):
        return models.encoder.apply(ev, emg, train=False)

    real = batch[C.DataType.REAL_EMG]
    fake = jnp.zeros_like(real)
    phases = {
        "generator_fwd": jax.jit(gen_fwd).lower(
            state.gen_params, batch).compile(),
        "generator_fwd_bwd": jax.jit(gen_fwd_bwd).lower(
            state.gen_params, batch).compile(),
        "disc_pair_fwd": jax.jit(disc_pair).lower(
            state.disc_params, state.disc_spectral, fake, real).compile(),
        "disc_pair_fwd_bwd": jax.jit(disc_pair_grad).lower(
            state.disc_params, state.disc_spectral, fake, real).compile(),
        "encoder_fwd": jax.jit(enc_fwd).lower(
            encoder_variables, fake).compile(),
    }
    phase_costs = {name: cost_of(c) for name, c in phases.items()}

    def roof(cost):
        t_c = cost["flops"] / (peak_tflops * 1e12)
        t_m = cost["bytes"] / (peak_gbps * 1e9)
        return {"tflops": round(cost["flops"] / 1e12, 4),
                "gbytes": round(cost["bytes"] / 1e9, 4),
                "t_compute_ms": round(1e3 * t_c, 3),
                "t_memory_ms": round(1e3 * t_m, 3),
                "attainable_ms": round(1e3 * max(t_c, t_m), 3),
                "bound": "compute" if t_c > t_m else "memory"}

    total_roof = roof(total)
    report = {
        "device_kind": device.device_kind,
        "peak_bf16_tflops": peak_tflops,
        "peak_hbm_gbps": peak_gbps,
        "batch": b,
        "chunk": chunk,
        "measured_ms": round(1e3 * measured_s, 2),
        "step": total_roof,
        "mxu_utilization_pct": round(
            100.0 * total_roof["t_compute_ms"] / (1e3 * measured_s), 1),
        "hbm_utilization_pct": round(
            100.0 * total_roof["t_memory_ms"] / (1e3 * measured_s), 1),
        "roofline_headroom_pct": round(
            100.0 * (1.0 - total_roof["attainable_ms"] / (1e3 * measured_s)),
            1),
        "phases": {name: roof(c) for name, c in phase_costs.items()},
        "note": ("attainable ignores launch gaps, the serial G->D->G "
                 "dependency chain, and non-MXU (VPU) work, so true "
                 "attainable is HIGHER than reported — headroom_pct is an "
                 "upper bound on what any optimization could recover"),
    }
    out = Path(__file__).parent / "roofline.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
