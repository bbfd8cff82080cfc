"""Export a trained run's generator as a self-contained StableHLO artifact.

Loads a training run directory (config snapshot + checkpoint), bakes the
trained weights into a shape-polymorphic `jax.export` serialization, and
writes ``<run_dir>/export/generator-<tag>.jaxexport`` (plus the session
vocabulary JSON next to it, since embedding indices are the one piece of
run state a deployment still needs — reference
ste_gan/data/emg_dataset.py:202-218). The artifact runs on any of the
requested platforms with no dependency on this package; see
``ste_gan_tpu/export.py``.

Usage:
    python scripts/export_generator.py --run_dir exp/ste-gan/<run> \
        [--tag best] [--platforms tpu,cpu] [--out <path>]
"""
from __future__ import annotations

import argparse
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from ste_gan_tpu.export import (export_generator, generator_meta,
                                load_exported, save_exported,
                                speech_feature_dim)
from ste_gan_tpu.models.generator import init_emg_generator
from ste_gan_tpu.train.gan import eval_generator_params, load_trained_state
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run_dir", type=Path, required=True)
    parser.add_argument("--tag", type=str, default="best",
                        help="checkpoint tag: best | latest | checkpoint-XXXXXXXX")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="comma-separated lowering platforms")
    parser.add_argument("--out", type=Path, default=None)
    parser.add_argument("--serving", action="store_true",
                        help="export the micro-batching serving signature "
                             "(feats, session, mode, num_valid) with "
                             "per-row valid-length masking; the artifact "
                             "can back ste_gan_tpu.serve --artifact")
    parser.add_argument("--verify", action="store_true",
                        help="reload the artifact and diff one call "
                             "against the in-framework generator")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "bfloat16"),
                        help="compute dtype baked into the artifact. "
                             "float32 (default) for deployment-grade "
                             "numerics regardless of the training config's "
                             "bf16; bfloat16 for maximum-throughput "
                             "serving (bit-for-bit reproducibility across "
                             "recompiles is not guaranteed under bf16)")
    parser.add_argument("--device", type=str, default="default",
                        choices=("default", "cpu"),
                        help="backend to trace/verify on; multi-platform "
                             "lowering does not need the target hardware, "
                             "so --device cpu exports TPU artifacts while "
                             "the TPU is busy")
    parser.add_argument("--quantize", type=str, default="none",
                        choices=("none", "int8"),
                        help="int8: store weights as per-channel symmetric "
                             "int8 constants with traced dequantisation "
                             "(~4x smaller artifact; XLA constant-folds "
                             "the dequant at compile time — see "
                             "ste_gan_tpu/quant.py)")
    args = parser.parse_args()

    if args.device == "cpu":
        from ste_gan_tpu.utils.jax_setup import force_platform
        force_platform("cpu")
    enable_compilation_cache()
    run_dir = Path(args.run_dir)
    cfg, _, state = load_trained_state(run_dir, args.tag)

    feature_dim = speech_feature_dim(cfg)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    # The export generator's compute dtype is an explicit deployment choice
    # (the training config's bf16 setting stays a training concern); the
    # trained parameters are f32 either way.
    export_gen = init_emg_generator(
        cfg, dtype=jnp.float32 if args.dtype == "float32" else jnp.bfloat16)
    if args.quantize == "int8":
        from ste_gan_tpu.quant import export_generator_quantized

        exported = export_generator_quantized(
            export_gen, eval_generator_params(state), feature_dim,
            platforms=platforms, serving=args.serving)
    else:
        exported = export_generator(export_gen, eval_generator_params(state),
                                    feature_dim, platforms=platforms,
                                    serving=args.serving)

    suffix = "-serving" if args.serving else ""
    if args.quantize != "none":
        suffix += f"-{args.quantize}"
    out = (args.out or
           run_dir / "export" / f"generator-{args.tag}{suffix}.jaxexport")
    meta = generator_meta(export_gen, feature_dim, args.serving)
    meta["quantize"] = args.quantize
    n_bytes = save_exported(exported, out, meta=meta)
    for vocab in ("session_idx_to_id.json", "speaking_mode_idx_to_id.json"):
        if (run_dir / vocab).exists():
            shutil.copy2(run_dir / vocab, out.parent / vocab)
    print(f"wrote {out} ({n_bytes / 1e6:.1f} MB, platforms={platforms}, "
          f"feature_dim={feature_dim})")

    if args.verify:
        loaded = load_exported(out)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(1, 64, feature_dim)), jnp.float32)
        sess = jnp.zeros((1,), jnp.int32)
        start = time.perf_counter()
        if args.serving:
            got = loaded.call(feats, sess, jnp.zeros((1,), jnp.int32),
                              jnp.full((1,), feats.shape[1], jnp.int32))
        else:
            got = loaded.call(feats, sess)
        compile_s = time.perf_counter() - start
        ref_params = eval_generator_params(state)
        if args.quantize == "int8":
            # The artifact must match the *dequantised* weights exactly
            # (the f32-vs-int8 quality delta is a property of the weights,
            # not the export; benchmarks/quant_probe.py measures it).
            from ste_gan_tpu.quant import (dequantize_generator_params,
                                           quantize_generator_params)
            ref_params = dequantize_generator_params(
                quantize_generator_params(ref_params))
            f32_out = export_gen.apply({"params": eval_generator_params(state)},
                                       feats, sess)
        want = export_gen.apply({"params": ref_params}, feats, sess)
        diff = float(jnp.max(jnp.abs(got - want)))
        if args.quantize == "int8":
            qdev = float(jnp.max(jnp.abs(want - f32_out)))
            print(f"int8 quantisation output deviation vs f32 weights: "
                  f"max {qdev:.2e} (tanh-bounded outputs)")
        # bf16 artifacts are not bit-reproducible across recompiles (the
        # --dtype help text's caveat): fusion-order differences between the
        # deserialized StableHLO and the freshly traced program are normal
        # at bf16 resolution, so the gate widens accordingly.
        tol = 1e-4 if args.dtype == "float32" else 5e-2
        print(f"verify: out {got.shape}, max |artifact - framework| = "
              f"{diff:.2e} (tol {tol:g}, first-call {compile_s:.1f}s)")
        if diff > tol:
            raise SystemExit("verification FAILED")


if __name__ == "__main__":
    main()
