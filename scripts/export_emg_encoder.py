"""Export a trained EMG encoder as a self-contained StableHLO artifact.

The encoder is the silent-speech *decoding* direction (EMG → soft speech
units + phoneme logits; reference ste_gan/models/emg_encoder.py:36-88) —
the deployable half of a silent-speech interface. Loads an encoder
pre-training run's checkpoint (``best_val_loss_model`` /
``last_model``), bakes the weights into a shape-polymorphic `jax.export`
serialization (symbolic batch + length, EMG length a multiple of 16 and
>= 1,616 samples — see ``ste_gan_tpu.export.export_emg_encoder``), and
writes ``<ckpt>.jaxexport`` next to the checkpoint.

Usage:
    python scripts/export_emg_encoder.py \
        --ckpt exp/emg_encoder/<run>/best_val_loss_model \
        [--config <run>/config.yaml] [--platforms tpu,cpu] [--device cpu]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", type=Path, required=True,
                        help="encoder checkpoint dir (Orbax pytree)")
    parser.add_argument("--config", type=Path, default=None,
                        help="config.yaml with the emg_encoder params "
                             "(default: next to the checkpoint)")
    parser.add_argument("--platforms", type=str, default="tpu,cpu")
    parser.add_argument("--out", type=Path, default=None)
    parser.add_argument("--device", type=str, default="default",
                        choices=("default", "cpu"))
    parser.add_argument("--quantize", type=str, default="none",
                        choices=("none", "int8"),
                        help="int8: per-channel weight-only quantisation "
                             "of conv kernels / attention projections / "
                             "rel-pos tables (~4x smaller artifact; "
                             "ste_gan_tpu/quant.py)")
    parser.add_argument("--verify", action="store_true")
    args = parser.parse_args()

    if args.device == "cpu":
        from ste_gan_tpu.utils.jax_setup import force_platform
        force_platform("cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ste_gan_tpu.config import load_config
    from ste_gan_tpu.export import export_emg_encoder, save_exported
    from ste_gan_tpu.models.emg_encoder import init_emg_encoder
    from ste_gan_tpu.train.checkpoint import load_pytree
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    config_path = args.config or args.ckpt.parent / "config.yaml"
    cfg = load_config(config=config_path)
    channels = cfg.data.num_emg_channels

    # The factory validates cfg.emg_encoder.type and wires the channel /
    # head dims from the config (models/emg_encoder.py:103).
    model = init_emg_encoder(cfg)
    min_len = 16 * (int(model.relative_positional_distance) + 1)
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, min_len, channels)), train=False))(
        jax.random.PRNGKey(0))
    variables = load_pytree(args.ckpt, template)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if args.quantize == "int8":
        from ste_gan_tpu.quant import export_emg_encoder_quantized

        exported = export_emg_encoder_quantized(model, variables, channels,
                                                platforms=platforms)
    else:
        exported = export_emg_encoder(model, variables, channels,
                                      platforms=platforms)
    suffix = "" if args.quantize == "none" else f"-{args.quantize}"
    out = args.out or Path(str(args.ckpt) + suffix + ".jaxexport")
    min_frames = int(model.relative_positional_distance) + 1
    n_bytes = save_exported(exported, out, meta={
        "kind": "emg_encoder",
        "num_emg_channels": channels,
        "min_frames": min_frames,
        "quantize": args.quantize,
    })
    print(f"wrote {out} ({n_bytes / 1e6:.1f} MB, platforms={platforms}, "
          f"min_frames={min_frames})")

    if args.verify:
        from ste_gan_tpu.export import load_exported

        loaded = load_exported(out)
        rng = np.random.default_rng(0)
        probe_frames = max(128, min_frames)
        emg = jnp.asarray(
            rng.normal(size=(1, 16 * probe_frames, channels)) * 0.1,
            jnp.float32)
        start = time.perf_counter()
        su, ph = loaded.call(emg)
        compile_s = time.perf_counter() - start
        ref_vars = variables
        if args.quantize == "int8":
            # Exactness gate is vs the dequantised weights; the quality
            # delta vs f32 is reported separately.
            from ste_gan_tpu.quant import dequantize_params, quantize_params
            ref_vars = dict(variables, params=dequantize_params(
                quantize_params(variables["params"], generic=True)))
            su_f, ph_f = model.apply(variables, emg, train=False)
        su2, ph2 = model.apply(ref_vars, emg, train=False)
        diff = max(float(jnp.max(jnp.abs(su - su2))),
                   float(jnp.max(jnp.abs(ph - ph2))))
        if args.quantize == "int8":
            print(f"int8 deviation vs f32 weights: units max "
                  f"{float(jnp.max(jnp.abs(su2 - su_f))):.2e}, phoneme "
                  f"argmax agreement "
                  f"{float(jnp.mean(jnp.argmax(ph2, -1) == jnp.argmax(ph_f, -1))):.4f}")
        print(f"verify: units {su.shape}, phonemes {ph.shape}, max diff "
              f"{diff:.2e} (first-call {compile_s:.1f}s)")
        if diff > 1e-4:
            raise SystemExit("verification FAILED")


if __name__ == "__main__":
    main()
