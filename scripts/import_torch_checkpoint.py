"""Convert a reference PyTorch checkpoint (.pt state_dict) to Orbax.

Supports the reference's shipped artifacts (ste_gan/train.py:425-436,
ste_gan/emg_encoder/train.py:242-250):

* generator:      ``netG-{step:08d}.pt`` / ``best_netG.pt``
* discriminator:  ``netD-{step:08d}.pt`` / ``best_netD.pt``
* encoder:        ``best_val_loss_model.pt`` / ``last_model.pt``

The output is a single Orbax pytree directory. Encoder imports are directly
usable as ``--emg_enc_ckpt`` for GAN training; generator imports load into
:class:`ste_gan_tpu.infer.EMGSynthesizer` for serving (see
``tests/test_torch_import.py`` for the round trip).

Usage:
    python scripts/import_torch_checkpoint.py --kind generator \
        --pt /path/netG-00025000.pt --out exp/imported/netG
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ste_gan_tpu.interop.torch_import import (
    convert_discriminator_state_dict, convert_encoder_state_dict,
    convert_generator_state_dict, load_torch_state_dict)
from ste_gan_tpu.train.checkpoint import save_pytree


def import_checkpoint(kind: str, pt_path: Path, out_dir: Path) -> dict:
    sd = load_torch_state_dict(pt_path)
    if kind == "generator":
        tree = {"params": convert_generator_state_dict(sd)}
    elif kind == "discriminator":
        params, spectral = convert_discriminator_state_dict(sd)
        tree = {"params": params, "spectral": spectral}
    elif kind == "encoder":
        tree = convert_encoder_state_dict(sd)
    else:
        raise ValueError(f"unknown kind: {kind}")
    save_pytree(Path(out_dir), tree)
    return tree


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", required=True,
                        choices=("generator", "discriminator", "encoder"))
    parser.add_argument("--pt", type=Path, required=True,
                        help="Reference .pt state_dict file.")
    parser.add_argument("--out", type=Path, required=True,
                        help="Output Orbax checkpoint directory.")
    args = parser.parse_args()

    tree = import_checkpoint(args.kind, args.pt, args.out)
    num = sum(x.size for x in __import__("jax").tree.leaves(tree))
    meta = {"kind": args.kind, "source": str(args.pt), "num_params": int(num)}
    Path(str(args.out) + ".meta.json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
