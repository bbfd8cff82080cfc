"""Export a trained run's models as reference-layout torch checkpoints.

The inverse of ``scripts/import_torch_checkpoint.py``: loads a GAN training
run (config + Orbax checkpoint) and writes ``netG-<tag>.pt`` /
``netD-<tag>.pt`` state_dict files the PyTorch reference loads with
``strict=True`` (its checkpoint layout: reference ste_gan/train.py:425-436,
ste_gan/utils/common.py:23-61). With ``--encoder_ckpt`` it instead converts
an EMG-encoder pre-training checkpoint to the reference's
``best_val_loss_model.pt`` format (reference emg_encoder/train.py:242-250).

Round-trip fidelity is asserted in tests/test_torch_export.py (the actual
reference modules load the exported dicts and reproduce our outputs).

Usage:
    python scripts/export_torch_checkpoint.py --run_dir exp/ste-gan/<run> \
        [--tag best] [--out_dir <run>/export]
    python scripts/export_torch_checkpoint.py \
        --encoder_ckpt exp/emg_encoder/<run>/best_val_loss_model
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--run_dir", type=Path,
                     help="GAN training run directory")
    src.add_argument("--encoder_ckpt", type=Path,
                     help="EMG-encoder checkpoint dir (Orbax pytree)")
    parser.add_argument("--tag", type=str, default="best")
    parser.add_argument("--out_dir", type=Path, default=None)
    args = parser.parse_args()

    from ste_gan_tpu.utils.jax_setup import force_platform

    force_platform("cpu")  # conversion is host-side array shuffling

    import jax
    import torch

    from ste_gan_tpu.config import load_config
    from ste_gan_tpu.interop.torch_export import (
        discriminator_params_to_state_dict, encoder_variables_to_state_dict,
        generator_params_to_state_dict, to_torch_tensors)
    from ste_gan_tpu.train.checkpoint import load_pytree

    if args.encoder_ckpt is not None:
        import jax.numpy as jnp

        from ste_gan_tpu.models.emg_encoder import init_emg_encoder

        cfg = load_config(config=args.encoder_ckpt.parent / "config.yaml")
        model = init_emg_encoder(cfg)
        template = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, 512, cfg.data.num_emg_channels)),
            train=False))(jax.random.PRNGKey(0))
        variables = load_pytree(args.encoder_ckpt, template)
        sd = to_torch_tensors(encoder_variables_to_state_dict(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))
        out_dir = args.out_dir or args.encoder_ckpt.parent / "export"
        out_dir.mkdir(parents=True, exist_ok=True)
        out = out_dir / f"{args.encoder_ckpt.name}.pt"
        torch.save(sd, out)
        print(f"wrote {out} ({len(sd)} tensors)")
        return

    from ste_gan_tpu.train.gan import (eval_generator_params,
                                       load_trained_state)

    run_dir = Path(args.run_dir)
    cfg, _, state = load_trained_state(run_dir, args.tag)

    out_dir = args.out_dir or run_dir / "export"
    out_dir.mkdir(parents=True, exist_ok=True)
    net_g = to_torch_tensors(generator_params_to_state_dict(
        eval_generator_params(state), cfg.model.speech_feature_type))
    net_d = to_torch_tensors(discriminator_params_to_state_dict(
        state.disc_params, state.disc_spectral))
    g_path = out_dir / f"netG-{args.tag}.pt"
    d_path = out_dir / f"netD-{args.tag}.pt"
    torch.save(net_g, g_path)
    torch.save(net_d, d_path)
    print(f"wrote {g_path} ({len(net_g)} tensors) and {d_path} "
          f"({len(net_d)} tensors) at step {int(state.step)}")


if __name__ == "__main__":
    main()
