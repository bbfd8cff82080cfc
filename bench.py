"""Benchmark: fused GAN train-step throughput on the local accelerator.

Runs the full-size training configuration (batch 32 x 2048-sample chunks,
full generator + small discriminator ensemble + frozen full encoder, every
loss term, bf16 compute) through the single fused jit step and reports EMG
channel-samples/sec — the BASELINE.md headline metric. ``vs_baseline`` is
the ratio against the PyTorch reference measured on this machine's CPU
(benchmarks/torch_cpu_baseline.json; target >= 10x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

``--assert_floor`` (or STE_BENCH_ASSERT_FLOOR=1): after printing, exit
non-zero if the measured TPU throughput is below the committed floor in
benchmarks/perf_floor.json — the perf-regression gate; skipped off-TPU.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np


def check_floor(value: float, platform: str, key: str) -> None:
    """Exit(1) when a TPU measurement is below the committed floor."""
    if platform == "cpu":
        print(f"floor check skipped (platform={platform})", file=sys.stderr)
        return
    floor_path = (Path(__file__).resolve().parent
                  / "benchmarks" / "perf_floor.json")
    floor = json.loads(floor_path.read_text())[key]
    if value < floor:
        print(f"PERF REGRESSION: {key} = {value:.0f} < floor {floor:.0f} "
              f"(benchmarks/perf_floor.json)", file=sys.stderr)
        sys.exit(1)
    print(f"floor check OK: {key} = {value:.0f} >= {floor:.0f}",
          file=sys.stderr)


def parse_args(argv):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=0,
                    help="override train batch size (0 = config default "
                         "32). --batch 128 is the gated throughput-mode "
                         "operating point (floor key "
                         "gan_step_b128_ch_samples_per_sec).")
    ap.add_argument("--assert_floor", action="store_true",
                    help="exit non-zero when below the committed floor "
                         "(benchmarks/perf_floor.json); skipped off-TPU")
    return ap.parse_args(argv)


def main() -> None:
    args = parse_args(sys.argv[1:])

    import jax
    import jax.numpy as jnp

    from ste_gan_tpu import constants as C
    from ste_gan_tpu.config import Config
    from ste_gan_tpu.parallel.mesh import (
        create_mesh, largest_divisor_mesh_size, replicate, shard_batch)
    from ste_gan_tpu.train.gan import (
        build_models, init_state, make_train_step)
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()  # full-size defaults: batch 32, chunk 2048, bf16
    # Paired discriminator passes (the config default) are semantics-exact:
    # dual-sigma SNConvs advance the power iteration twice per stacked
    # (fake, real) pass — see TrainConfig.fused_disc_passes.
    # Perf-knob env overrides (A/B sweeps; defaults are the shipped config).
    if os.environ.get("STE_BENCH_PALLAS_CONV"):
        cfg.train.pallas_grouped_conv = True
    if os.environ.get("STE_BENCH_VMAP_CONV"):
        # Grouped convs as vmapped dense convs (ops/conv.py impl="vmap").
        cfg.train.grouped_conv_impl = "vmap"
    if os.environ.get("STE_BENCH_PADDED_CONV"):
        # Per-group in-channels zero-padded to full 128-lane tiles
        # (ops/conv.py impl="padded") — the VERDICT r4 #3 relayout
        # experiment: trade zero-FLOPs for XLA's grouped-conv copies.
        cfg.train.grouped_conv_impl = "padded"
    if os.environ.get("STE_BENCH_FUSED_OPT"):
        cfg.train.fused_optimizer = True
    if os.environ.get("STE_BENCH_BATCH"):
        # Throughput-scaling sweeps (vs_baseline stays normalised per
        # sample, so bigger batches show the per-chip capacity headroom).
        cfg.train.batch_size = int(os.environ["STE_BENCH_BATCH"])
    if args.batch > 0:
        cfg.train.batch_size = args.batch
    if os.environ.get("STE_BENCH_GRAD_ACCUM"):
        # K sequential microbatches, one dual update — activation memory
        # ~B/K at the cost of an extra generator forward per microbatch
        # (train/gan.py::train_step_accum; math equals the full batch).
        cfg.train.grad_accum = int(os.environ["STE_BENCH_GRAD_ACCUM"])
    if os.environ.get("STE_BENCH_EMA"):
        # Generator weight EMA (train.generator_ema): one extra fused
        # elementwise chain over the generator tree per step.
        cfg.train.generator_ema = 0.999
    if os.environ.get("STE_BENCH_REMAT"):
        # Rematerialise activations (jax.checkpoint around the generator
        # forward + both loss phases): memory knob, identical math
        # (train/gan.py; benchmarks/memory_probe.py has the HBM numbers).
        cfg.train.remat = True
    if os.environ.get("STE_BENCH_FULL_DISC"):
        # Full (non-small) MPD+MSD ensemble — the reference's
        # discriminator_small=false variant (5-layer period discs to 1024
        # ch, 7-layer scale discs). The shipped protocol uses small discs
        # (reference configs/ste_gan_base_gantts.yaml:11).
        cfg.model.discriminator_small = False
    resident = bool(os.environ.get("STE_BENCH_RESIDENT"))
    # STE_BENCH_RESIDENT=1: the PRODUCTION step — crops gathered from a
    # device-resident corpus INSIDE the jitted step (synthetic_large-scale
    # corpus shape; measured <=1 ms over the bare step — XLA overlaps the
    # gather with the step's conv work).
    models = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    encoder_variables = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels)),
        train=False))(rng)
    state = init_state(cfg, models, rng)

    n_dev = largest_divisor_mesh_size(cfg.train.batch_size, len(jax.devices()))
    mesh = create_mesh(n_dev)
    state = replicate(mesh, state)
    encoder_variables = replicate(mesh, encoder_variables)

    b, chunk = cfg.train.batch_size, cfg.train.chunk_size
    frames = chunk // C.HOPSIZE
    rng_np = np.random.default_rng(0)

    raw_step = make_train_step(cfg, models)
    if resident:
        from ste_gan_tpu.data.device_corpus import DeviceCorpus
        from ste_gan_tpu.parallel.mesh import replicate_sharding

        # Corpus replicated over the mesh exactly like the trainer
        # (train_gan.py), so sharded descriptor batches gather locally.
        rep = replicate_sharding(mesh)
        # device_put straight from host numpy -> ONE transfer per array
        # (committing to the default device first would double it, and the
        # tunnel client leaks every H2D buffer).
        put = lambda a: jax.device_put(a, rep)
        n_utts, lmax = 960, 2 * frames  # synthetic_large-scale corpus
        f16 = np.float16
        corpus = DeviceCorpus(
            emg=put(np.tanh(rng_np.normal(
                0, 0.4, (n_utts, lmax * C.HOPSIZE, 8))).astype(f16)),
            speech_units=put(
                rng_np.normal(size=(n_utts, lmax, 256)).astype(f16)),
            phonemes=put(rng_np.integers(
                0, C.NUM_PHONEMES, (n_utts, lmax)).astype(np.int32)),
            mfccs=None,
            session_index=put(rng_np.integers(
                0, C.NUM_EMG_SESSIONS, (n_utts,)).astype(np.int32)),
            speaking_mode_index=put(np.zeros((n_utts,), np.int32)),
            emg_train_length=chunk, hopsize=C.HOPSIZE)
        batch = shard_batch(mesh, {
            "rows": jnp.asarray(rng_np.integers(0, n_utts, (b,)), jnp.int32),
            "starts": jnp.asarray(
                rng_np.integers(0, lmax - frames + 1, (b,)), jnp.int32)})
        # Corpus as a jit ARGUMENT (registered pytree), like the trainers —
        # a closure would ship the whole corpus in the compile payload.
        jit_resident = jax.jit(
            lambda st, idx, ev, cp: raw_step(
                st, cp.gather(idx["rows"], idx["starts"]), ev),
            donate_argnums=0)
        step = lambda st, idx, ev: jit_resident(st, idx, ev, corpus)
    else:
        batch = shard_batch(mesh, {
            C.DataType.REAL_EMG: jnp.asarray(
                np.tanh(rng_np.normal(0, 0.4, (b, chunk, 8))), jnp.float32),
            C.DataType.SPEECH_UNITS: jnp.asarray(
                rng_np.normal(size=(b, frames, 256)), jnp.float32),
            C.DataType.PHONEMES: jnp.asarray(
                rng_np.integers(0, C.NUM_PHONEMES, (b, frames)), jnp.int32),
            C.DataType.SESSION_INDEX: jnp.asarray(
                rng_np.integers(0, C.NUM_EMG_SESSIONS, (b,)), jnp.int32),
            C.DataType.SPEAKING_MODE_INDEX: jnp.zeros((b,), jnp.int32),
        })
        step = jax.jit(raw_step, donate_argnums=0)

    # Warmup / compile.
    compile_start = time.perf_counter()
    state, metrics = step(state, batch, encoder_variables)
    float(np.asarray(metrics["loss/generator"]))  # forced host sync
    compile_secs = time.perf_counter() - compile_start
    for _ in range(5):  # settle steady state
        state, metrics = step(state, batch, encoder_variables)
    float(np.asarray(metrics["loss/generator"]))

    # Timed steps (chained via state donation; the trailing device->host
    # transfer guarantees every step actually executed).
    num_steps = 30
    start = time.perf_counter()
    for _ in range(num_steps):
        state, metrics = step(state, batch, encoder_variables)
    float(np.asarray(metrics["loss/generator"]))
    elapsed = (time.perf_counter() - start) / num_steps

    ch_samples = b * chunk * cfg.data.num_emg_channels
    value = ch_samples / elapsed / n_dev  # per-chip

    baseline_path = Path(__file__).parent / "benchmarks/torch_cpu_baseline.json"
    vs_baseline = None
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())
        vs_baseline = value * n_dev / baseline["emg_channel_samples_per_sec"]

    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": "GAN train-step throughput",
        "value": round(value, 1),
        "unit": "EMG channel-samples/sec/chip",
        "vs_baseline": None if vs_baseline is None else round(vs_baseline, 2),
        "sec_per_step": round(elapsed, 4),
        "compile_secs": round(compile_secs, 1),
        "devices": n_dev,
        "platform": platform,
        "loss_G": round(float(metrics["loss/generator"]), 3),
    }))
    if args.assert_floor or os.environ.get("STE_BENCH_ASSERT_FLOOR"):
        # The parity point (B=32) and the throughput point (B=128) are
        # separately gated; other batch sizes check no floor.
        if cfg.train.batch_size == 32:
            check_floor(value, platform, "gan_step_ch_samples_per_sec")
        elif cfg.train.batch_size == 128:
            check_floor(value, platform, "gan_step_b128_ch_samples_per_sec")
        else:
            print(f"floor check skipped (no floor committed for batch "
                  f"{cfg.train.batch_size})", file=sys.stderr)


if __name__ == "__main__":
    main()
