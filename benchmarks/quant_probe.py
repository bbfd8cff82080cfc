"""int8 weight-only quantization probe: artifact size, output fidelity,
and serving latency of the FULL-SIZE generator, f32 vs int8.

Writes benchmarks/quant_probe.json. Run with --run_dir to probe trained
weights (recommended — quantization error on trained weights is the
deployable number); without it, torch-default random init is used (same
weight statistics as a fresh reference model, so the size/latency numbers
are representative and the fidelity number is a lower bound of interest).

Usage:
    python benchmarks/quant_probe.py [--run_dir <gan_run>] [--tag best]
        [--time] [--device cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", type=Path, default=None)
    ap.add_argument("--tag", default="best")
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--time", action="store_true",
                    help="also time both artifacts (needs a quiet device)")
    ap.add_argument("--device", type=str, default="default",
                    choices=("default", "cpu"))
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent / "quant_probe.json")
    args = ap.parse_args()

    if args.device == "cpu":
        from ste_gan_tpu.utils.jax_setup import force_platform
        force_platform("cpu")
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ste_gan_tpu.config import Config
    from ste_gan_tpu.export import export_generator
    from ste_gan_tpu.models.generator import init_emg_generator
    from ste_gan_tpu.quant import (export_generator_quantized,
                                   quantize_generator_params,
                                   quantized_param_bytes)

    if args.run_dir is not None:
        from ste_gan_tpu.train.gan import load_trained_state
        cfg, _, state = load_trained_state(args.run_dir, args.tag)
        gen = init_emg_generator(cfg)
        params = state.gen_params
        source = f"{args.run_dir}@{args.tag}"
    else:
        cfg = Config()
        gen = init_emg_generator(cfg)
        params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, cfg.speech_input_dim)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1,), jnp.int32))["params"]
        source = "random-init"

    dim = cfg.speech_input_dim
    e_f32 = export_generator(gen, params, dim)
    e_q = export_generator_quantized(gen, params, dim)
    b_f32, b_q = len(e_f32.serialize()), len(e_q.serialize())

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(args.batch, args.frames, dim)),
                        jnp.float32)
    sess = jnp.asarray(rng.integers(0, cfg.data.num_emg_sessions,
                                    (args.batch,)), jnp.int32)
    y = np.asarray(e_f32.call(feats, sess))
    yq = np.asarray(e_q.call(feats, sess))
    dev = np.abs(y - yq)

    result = {
        "source": source,
        "param_bytes_f32": quantized_param_bytes(params),
        "param_bytes_int8": quantized_param_bytes(
            quantize_generator_params(params)),
        "artifact_bytes_f32": b_f32,
        "artifact_bytes_int8": b_q,
        "artifact_ratio": round(b_q / b_f32, 4),
        "output_dev_max": float(dev.max()),
        "output_dev_mean": float(dev.mean()),
        "output_rms": float(np.sqrt(np.mean(y ** 2))),
        "platform": jax.devices()[0].platform,
    }

    if args.time:
        def bench(exported):
            # Chain ALL iterations inside ONE jitted program: per-call
            # eager ops / dispatches through the remote-TPU tunnel cost
            # seconds each and would swamp the model time (see CLAUDE.md).
            # The warmup call uses a different input than the timed call,
            # defeating the tunnel's (executable, args) memoization.
            def chained(f):
                out = exported.call(f, sess)

                def body(_, carry):
                    f, out = carry
                    f = f + jnp.mean(out) * 1e-6
                    return f, exported.call(f, sess)

                return jax.lax.fori_loop(0, args.iters - 1, body,
                                         (f, out))[1]

            call = jax.jit(chained)
            jax.block_until_ready(call(feats + 1.0))   # compile
            start = time.perf_counter()
            out = call(feats)
            jax.block_until_ready(out)
            return (time.perf_counter() - start) / args.iters * 1e3

        result["latency_ms_f32"] = round(bench(e_f32), 3)
        result["latency_ms_int8"] = round(bench(e_q), 3)

    args.out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
