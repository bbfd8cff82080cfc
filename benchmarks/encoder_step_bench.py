"""Benchmark: EMG-encoder pre-training step throughput on the accelerator.

The second training runtime (reference: ste_gan/emg_encoder/train.py). One
step at the reference protocol's full batch budget: 128,000 EMG samples
packed and folded into 80 windows of 1600 samples (SEQ_LEN*8;
ste_gan/emg_encoder/constants.py:9,24), full-size encoder (4 ResBlocks
8->768, 6 transformer layers d=768), AdamW, bf16 compute.

Chained-state timing (the tunnel memoizes identical executions).

Usage: python benchmarks/encoder_step_bench.py [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu import constants as C
from ste_gan_tpu import emg_encoder_constants as EC
from ste_gan_tpu.config import Config
from ste_gan_tpu.models.emg_encoder import init_emg_encoder
from ste_gan_tpu.train.encoder import (
    EncoderTrainState, make_encoder_train_step, make_optimizer)
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--assert_floor", action="store_true",
                    help="exit non-zero if below the committed TPU floor "
                         "(benchmarks/perf_floor.json); skipped off-TPU")
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = Config()
    model = init_emg_encoder(cfg, dtype=jnp.bfloat16)

    max_samples = EC.TRAIN_BATCH_MAX_LEN       # 128_000 EMG samples
    win = EC.SEQ_LEN * 8                       # 1600
    n_win = max_samples // win                 # 80 windows
    frames = win // 16                         # 100 SU frames / window

    rng_np = np.random.default_rng(0)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, win, C.NUM_EMG_CHANNELS)), train=False))(rng)
    opt = make_optimizer()
    state = EncoderTrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]))

    total_frames = n_win * frames
    sample_slots = 2 * n_win  # sample-id segment slots (trainer: 391)
    batch = {
        "emg_windows": jnp.asarray(np.tanh(
            rng_np.normal(0, 0.4, (n_win, win, C.NUM_EMG_CHANNELS))),
            jnp.float32),
        "su_targets": jnp.asarray(
            rng_np.normal(size=(total_frames, C.SPEECH_UNITS_FEAT_SIZE)),
            jnp.float32),
        "ph_targets": jnp.asarray(
            rng_np.integers(0, C.NUM_PHONEMES, (total_frames,)), jnp.int32),
        "frame_sample_id": jnp.asarray(
            np.minimum(np.arange(total_frames) // frames, 31), jnp.int32),
        "silent": jnp.zeros((sample_slots,), bool),
        "num_samples": jnp.asarray(32, jnp.int32),
    }

    step = jax.jit(make_encoder_train_step(model, sample_slots),
                   donate_argnums=0)

    compile_start = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    float(np.asarray(metrics["loss"]))
    compile_secs = time.perf_counter() - compile_start
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    float(np.asarray(metrics["loss"]))

    start = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
    float(np.asarray(metrics["loss"]))
    elapsed = (time.perf_counter() - start) / args.iters

    ch_samples = n_win * win * C.NUM_EMG_CHANNELS
    value = ch_samples / elapsed
    platform = jax.devices()[0].platform
    print(json.dumps({
        "metric": "encoder train-step throughput",
        "sec_per_step": round(elapsed, 4),
        "emg_channel_samples_per_sec": round(value, 1),
        "windows": n_win, "window_samples": win,
        "compile_secs": round(compile_secs, 1),
        "platform": platform,
        "loss": round(float(metrics["loss"]), 4),
    }))
    if args.assert_floor or os.environ.get("STE_BENCH_ASSERT_FLOOR"):
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from bench import check_floor

        check_floor(value, platform, "encoder_step_ch_samples_per_sec")


if __name__ == "__main__":
    main()
