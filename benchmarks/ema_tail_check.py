"""25k-horizon EMA tail check (VERDICT r4 #2, follow-up to the flip).

The debiased 3k-step A/B (benchmarks/ema_ab_r5.json) flipped the round-4
conclusion: ramped-decay EMA scores BETTER. This script supplies the
long-horizon check at zero extra training cost: EMA is passive (it never
feeds back into gradients), so an EMA-on run's raw-weights trajectory IS
the EMA-off run at the same seed — one checkpoint carries both weight
trees, and scoring each on the same data is an exactly-paired A/B at the
checkpoint's horizon.

Usage (after a long EMA-on run, e.g. the round-5 stability flagship):
  python benchmarks/ema_tail_check.py --run_dir <run> [--tag checkpoint-final]
Writes benchmarks/ema_tail_check.json.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", type=Path, required=True)
    ap.add_argument("--tag", default="checkpoint-final")
    ap.add_argument("--emg_enc_ckpt", type=Path, required=True)
    ap.add_argument("--partition", default="valid")
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent / "ema_tail_check.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ste_gan_tpu.data.dataset import EMGDataset
    from ste_gan_tpu.evaluate import _vocab_from_run_dir, evaluate_gan_chunked
    from ste_gan_tpu.train.checkpoint import load_pytree
    from ste_gan_tpu.train.gan import load_trained_state
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    cfg, models, state = load_trained_state(args.run_dir, args.tag)
    if state.gen_ema is None:
        raise SystemExit("run has no EMA tree — nothing to compare")

    template = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels)),
        train=False))(jax.random.PRNGKey(0))
    encoder_variables = load_pytree(Path(args.emg_enc_ckpt), template)
    sess_vocab, mode_vocab = _vocab_from_run_dir(args.run_dir)
    dataset = EMGDataset(
        Path(cfg.data.dataset_root), partition=args.partition,
        session_id_to_idx=sess_vocab, speaking_mode_id_to_idx=mode_vocab,
        only_include_voiced=True, filter_by_length=True,
        train_emg_length=cfg.train.chunk_size, strict=cfg.data.strict)

    sides = {}
    for name, params in (("raw", state.gen_params), ("ema", state.gen_ema)):
        sides[name] = {
            k: round(float(v), 5)
            for k, v in evaluate_gan_chunked(
                cfg, models, params, encoder_variables, dataset).items()}
        print(name, json.dumps(sides[name]), flush=True)

    su_raw = sides["raw"]["val/speech_unit"]
    su_ema = sides["ema"]["val/speech_unit"]
    report = {
        "run_dir": str(args.run_dir),
        "tag": args.tag,
        "step": int(np.asarray(state.step)),
        "partition": args.partition,
        "generator_ema": float(cfg.train.generator_ema),
        "raw": sides["raw"],
        "ema": sides["ema"],
        "ema_better_su": bool(su_ema < su_raw),
        "su_delta_pct": round(100.0 * (su_ema - su_raw) / su_raw, 3),
    }
    args.out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: report[k] for k in
                      ("step", "ema_better_su", "su_delta_pct")}))


if __name__ == "__main__":
    main()
