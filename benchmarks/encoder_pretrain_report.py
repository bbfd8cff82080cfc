"""Summarise an EMG-encoder pre-training run into a committed artifact.

The round-2 verdict's top directive: show the perceptual pathway
*demonstrably learning* — encoder pre-training must reach substantially-
above-chance phoneme accuracy (>50%; chance is 1/48 ~= 2.1%) on the
synthetic corpus before its frozen features can mean anything to the GAN's
perceptual losses (reference protocol: ste_gan/emg_encoder/train.py).

Reads the run's metrics.jsonl and writes
``benchmarks/stability_r3/encoder_pretrain.json`` with the val loss /
val phoneme-accuracy trajectories; ``tests/test_stability_report.py``
asserts the committed numbers.

Usage: python benchmarks/encoder_pretrain_report.py --run_dir exp/emg_encoder/<run>
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run_dir", type=Path, required=True)
    parser.add_argument("--out_dir", type=Path,
                        default=Path(__file__).parent / "stability_r3")
    parser.add_argument("--out_name", type=str, default="encoder_pretrain.json",
                        help="Artifact filename (e.g. encoder_mixed.json for "
                             "the mixed voiced+silent training demo).")
    args = parser.parse_args()

    metrics_path = Path(args.run_dir)
    if metrics_path.is_dir():
        metrics_path = metrics_path / "metrics.jsonl"
    series = defaultdict(list)
    with open(metrics_path) as fh:
        for line in fh:
            rec = json.loads(line)
            series[rec["tag"]].append((rec["step"], rec["value"]))

    val_loss = sorted(series["val/loss"])
    val_acc = sorted(series["val/phon_acc"])
    summary = {
        "epochs": len(val_loss),
        "val_loss_first": val_loss[0][1],
        "val_loss_best": min(v for _, v in val_loss),
        "val_loss_last": val_loss[-1][1],
        "val_phoneme_accuracy_first": val_acc[0][1],
        "val_phoneme_accuracy_best": max(v for _, v in val_acc),
        "val_phoneme_accuracy_last": val_acc[-1][1],
        "chance_accuracy": 1.0 / 48,
        "val_phoneme_accuracy_series": [[s, round(v, 5)] for s, v in val_acc],
        "val_loss_series": [[s, round(v, 5)] for s, v in val_loss],
    }
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / args.out_name).write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items()
                      if not k.endswith("_series")}, indent=2))


if __name__ == "__main__":
    main()
