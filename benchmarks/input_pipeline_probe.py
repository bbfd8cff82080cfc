"""Probe: where do real-training steps spend their extra ~100 ms?

The device step is 57 ms (bench.py) but the stability run logged 163-290
ms/step end to end — the gap is host collate + host->device transfer
through the tunnel on this 1-core host. This probe separates the phases on
the synthetic corpus at the full training shape (batch 32 x 2048):

  host collate        iterate the train loader, numpy only
  +device_put (f32)   shard_batch on top, block on arrival
  +device_put (f16)   same with float features cast to f16 for transfer
                      (halves the bytes; cast back on device in-step)
  full loop           actual fused steps consuming the prefetched pipeline

Usage: python benchmarks/input_pipeline_probe.py [--batches 20]
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

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.data.loader import Prefetcher, loaders
from ste_gan_tpu.parallel.mesh import (
    create_mesh, largest_divisor_mesh_size, replicate, shard_batch)
from ste_gan_tpu.train.gan import build_models, init_state, make_train_step
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

FLOAT_KEYS = (C.DataType.REAL_EMG, C.DataType.SPEECH_UNITS, C.DataType.MFCCS)


def cast_f16(batch):
    return {k: (v.astype(np.float16) if k in FLOAT_KEYS and
                isinstance(v, np.ndarray) and v.dtype == np.float32 else v)
            for k, v in batch.items()}


def drop_none(batch):
    return {k: v for k, v in batch.items() if v is not None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--data_root", default="data/synthetic")
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = Config()
    n = args.batches
    results = {}

    def endless(loader):
        while True:
            yield from loader

    def loop_batches(transform=None, device=False, label=""):
        train_loader, _, _ = loaders(Path(args.data_root), batch_size=32)
        mesh = create_mesh(largest_divisor_mesh_size(32, len(jax.devices())))
        it = endless(train_loader)
        # Warm a full epoch (fills the RAM cache).
        for _ in range(4):
            drop_none(next(it))
        start = time.perf_counter()
        last = None
        for _ in range(n):
            host_batch = drop_none(next(it))
            if transform:
                host_batch = transform(host_batch)
            if device:
                last = shard_batch(mesh, host_batch)
        if device and last is not None:
            jax.block_until_ready(last)
        ms = (time.perf_counter() - start) / n * 1e3
        print(f"  {label:24s} {ms:8.2f} ms/batch", flush=True)
        return ms

    results["host_collate"] = loop_batches(label="host collate")
    results["device_put_f32"] = loop_batches(device=True, label="+device_put f32")
    results["device_put_f16"] = loop_batches(transform=cast_f16, device=True,
                                             label="+device_put f16")

    # Full training loop (prefetched pipeline + fused step), f32 and f16.
    models = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    encoder_variables = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, 8)), train=False))(rng)
    mesh = create_mesh(largest_divisor_mesh_size(32, len(jax.devices())))
    step = jax.jit(make_train_step(cfg, models), donate_argnums=0)

    for label, transform in (("full loop f32", None),
                             ("full loop f16", cast_f16)):
        state = replicate(mesh, init_state(cfg, models, rng))
        encoder_vars_r = replicate(mesh, encoder_variables)
        train_loader, _, _ = loaders(Path(args.data_root), batch_size=32)

        def sharded():
            while True:
                for hb in train_loader:
                    hb = drop_none(hb)
                    if transform:
                        hb = transform(hb)
                    yield shard_batch(mesh, hb)

        it = iter(Prefetcher(sharded, 2))
        for _ in range(3):  # compile + warm, settle the pipeline
            state, metrics = step(state, next(it), encoder_vars_r)
        float(np.asarray(metrics["loss/generator"]))
        start = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, next(it), encoder_vars_r)
        float(np.asarray(metrics["loss/generator"]))
        ms = (time.perf_counter() - start) / n * 1e3
        key = label.replace(" ", "_")
        results[key] = ms
        print(f"  {label:24s} {ms:8.2f} ms/step "
              f"(G={float(metrics['loss/generator']):.3f})", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
