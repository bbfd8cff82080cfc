"""A/B the generator-EMA knob (train.generator_ema) on the chip.

Two identical CLI-trainer runs on the learnable synthetic_large corpus —
same seed, same data order, same budget — one with EMA off (reference
parity) and one with EMA on. With EMA on, validation (and best-model
selection) scores the EMA weights; this measures what that buys on the
validation axes of the reference protocol, and what the extra in-step
elementwise chain costs (also measurable in isolation with
``STE_BENCH_EMA=1 python bench.py``).

Writes ``benchmarks/ema_ab.json``:
  per arm: the full val series, best/final val SU error, median step ms.

Usage (TPU; ~2x <steps> x ~65 ms + compiles):
  python benchmarks/ema_ab.py [--steps 3000] [--decay 0.999]
  # corpus: python -m ste_gan_tpu.data.synthetic --root data/synthetic_large \
  #   --num_train 960 --num_valid 48 --num_test 32
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ste_gan_tpu.config import load_config
from ste_gan_tpu.train import train_gan
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache


def run_arm(name: str, decay: float, steps: int, out_root: Path,
            data_cfg: str, emg_enc_ckpt=None) -> dict:
    cfg = load_config(config="configs/ste_gan_base_gantts.yaml",
                      data=data_cfg)
    cfg.train.max_steps = steps
    cfg.train.interval_valid = max(100, steps // 10)
    cfg.train.interval_sample = 10 * steps  # no plots
    cfg.train.interval_save = steps  # final only
    cfg.train.generator_ema = decay
    run_dir = out_root / name
    final_val = train_gan.train(cfg, run_dir, resume=False, debug=False,
                                emg_enc_ckpt=emg_enc_ckpt)
    # Snapshot the arm's config: downstream tools (load_trained_state,
    # benchmarks/ema_tail_check.py) consume the run-dir layout.
    cfg.save(run_dir / "config.yaml")

    # metrics.jsonl is one {tag, value, step} record per scalar.
    by_step: dict = {}
    steps_ms = []
    for line in (run_dir / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        if rec["tag"].startswith("val/"):
            by_step.setdefault(rec["step"], {})[rec["tag"]] = rec["value"]
        elif rec["tag"] == "perf/ms_per_step":
            steps_ms.append(rec["value"])
    vals = [{"step": s,
             "su": m.get("val/speech_unit"),
             "td": m.get("val/multi_td"),
             "ph_acc": m.get("val/phoneme_accuracy_avg")}
            for s, m in sorted(by_step.items())]
    steps_ms.sort()
    return {
        "generator_ema": decay,
        "val_series": vals,
        "best_val_su": min(v["su"] for v in vals),
        "final_val": final_val,
        "median_ms_per_step": (steps_ms[len(steps_ms) // 2]
                               if steps_ms else None),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--decay", type=float, default=0.999)
    ap.add_argument("--data", default="configs/data/synthetic_large.yaml")
    ap.add_argument("--emg_enc_ckpt", type=Path, default=None,
                    help="pretrained frozen-encoder checkpoint — required "
                         "for meaningful val SU (best-model selection); "
                         "e.g. exp/ablation_r4/encoder_pretrain/"
                         "best_val_loss_model")
    ap.add_argument("--out_root", type=Path, default=Path("exp/ema_ab"))
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent / "ema_ab.json")
    args = ap.parse_args()

    enable_compilation_cache()
    report = {
        "steps": args.steps,
        "data": args.data,
        "emg_enc_ckpt": str(args.emg_enc_ckpt),
        "off": run_arm("ema_off", 0.0, args.steps, args.out_root, args.data,
                       args.emg_enc_ckpt),
        "on": run_arm(f"ema_{args.decay}", args.decay, args.steps,
                      args.out_root, args.data, args.emg_enc_ckpt),
    }
    args.out.write_text(json.dumps(report, indent=2))
    slim = {arm: {k: report[arm][k] for k in
                  ("generator_ema", "best_val_su", "median_ms_per_step")}
            for arm in ("off", "on")}
    print(json.dumps(slim, indent=2))


if __name__ == "__main__":
    main()
