"""Cross-runtime proof on TRAINED weights (VERDICT r4 #7).

tests/test_torch_export.py proves fresh-parameter export equivalence; this
script proves the shipped artifact of a real training run is portable: it
exports the flagship run's best checkpoint to a reference-layout torch
state_dict, loads it into the ACTUAL PyTorch reference generator
(/root/reference, strict=True), synthesizes every held-out test utterance
with BOTH runtimes — the reference's full-length forward
(ste_gan/models/generator.py:48-75) on CPU torch vs this repo's bucketed
production inference (infer.EMGSynthesizer) — and compares the generated
EMG sample-by-sample.

Host-side (forces the CPU backend; the TPU can stay busy). Both sides run
f32 for a tight tolerance — parameters are stored f32; bf16 is a compute
policy of the training step, not of the checkpoint.

Usage:
  python benchmarks/cross_runtime_trained.py [--run_dir exp/ste-gan/<run>]
      [--tag best] [--max_utterances N]

Writes ``benchmarks/cross_runtime_trained.json``; checked by
tests/test_cross_runtime_artifact.py.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

DEFAULT_RUN = ("exp/ste-gan/synthetic_large_EMGGeneratorGanTTS_SPEECH_UNITS_"
               "small_dis_chunk_2048_with_adv_loss_fmw_7.0_tdw_15.0_suw_1.0_"
               "phw_1.0_wv_0.0")

#: Gates on the generated-EMG disagreement (tanh-bounded signals in
#: [-1, 1]): the two runtimes must agree to well below any signal scale.
MAX_ABS_GATE = 5e-3
MEAN_ABS_GATE = 1e-4


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", type=Path, default=Path(DEFAULT_RUN))
    ap.add_argument("--tag", default="best")
    ap.add_argument("--max_utterances", type=int, default=None)
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).parent
                    / "cross_runtime_trained.json")
    args = ap.parse_args()

    from ste_gan_tpu.utils.jax_setup import force_platform

    force_platform("cpu")

    import jax
    import torch

    from ste_gan_tpu import constants as C
    from ste_gan_tpu.config import load_config
    from ste_gan_tpu.data.dataset import EMGDataset
    from ste_gan_tpu.evaluate import _vocab_from_run_dir
    from ste_gan_tpu.infer import EMGSynthesizer
    from ste_gan_tpu.interop.torch_export import (
        generator_params_to_state_dict, to_torch_tensors)
    from ste_gan_tpu.train.checkpoint import CheckpointManager
    from ste_gan_tpu.train.gan import (build_models, eval_generator_params,
                                       init_state)
    from ref_loader import import_reference

    run_dir = Path(args.run_dir)
    cfg = load_config(config=run_dir / "config.yaml")
    # f32 on both sides: the checkpoint stores f32 parameters; bf16 is a
    # train-step compute policy, not a property of the artifact.
    cfg.train.mixed_precision = False
    models = build_models(cfg)
    template = init_state(cfg, models, jax.random.PRNGKey(0))
    state, _ = CheckpointManager(run_dir).restore(args.tag, template)
    gen_params = eval_generator_params(state)

    # --- reference runtime: exported state_dict into the torch model ---
    sd = to_torch_tensors(generator_params_to_state_dict(
        gen_params, cfg.model.speech_feature_type))
    ref_gen = import_reference("ste_gan.models.generator")
    ref_kwargs = dict(cfg.model.params or {})
    netg = ref_gen.EMGGeneratorGanTTS(
        speech_feature_type=cfg.model.speech_feature_type,
        speech_input_dim=cfg.speech_input_dim,
        num_sessions=cfg.data.num_emg_sessions,
        num_emg_channels=cfg.data.num_emg_channels, **ref_kwargs)
    netg.load_state_dict(sd, strict=True)
    netg.eval()

    # --- our production inference path (bucketed, valid-masked) ---
    synth = EMGSynthesizer.from_config(cfg, gen_params, bucket=64)

    sess_vocab, mode_vocab = _vocab_from_run_dir(run_dir)
    dataset = EMGDataset(
        Path(cfg.data.dataset_root), partition="test",
        session_id_to_idx=sess_vocab, speaking_mode_id_to_idx=mode_vocab,
        only_include_voiced=True, filter_by_length=False,
        train_emg_length=cfg.train.chunk_size, strict=cfg.data.strict)
    n = len(dataset)
    if args.max_utterances:
        n = min(n, args.max_utterances)

    feature_key = cfg.model.speech_feature_type
    per_utt = []
    for idx in range(n):
        sample = dataset[idx]
        feats = np.asarray(sample[feature_key], np.float32)
        sess = int(sample[C.DataType.SESSION_INDEX])
        mode = int(sample[C.DataType.SPEAKING_MODE_INDEX])
        with torch.no_grad():
            want = netg(torch.from_numpy(feats[None]),
                        torch.tensor([sess]),
                        torch.tensor([mode]))[0].numpy()
        got = np.asarray(synth.synthesize(feats, sess, mode), np.float32)
        t = min(len(want), len(got))
        diff = np.abs(got[:t] - want[:t])
        per_utt.append({"utt": idx, "frames": int(len(feats)),
                        "max_abs": float(diff.max()),
                        "mean_abs": float(diff.mean())})
        print(f"utt {idx:3d}: frames={len(feats):4d} "
              f"max|d|={diff.max():.2e} mean|d|={diff.mean():.2e}",
              flush=True)

    max_abs = max(u["max_abs"] for u in per_utt)
    mean_abs = float(np.mean([u["mean_abs"] for u in per_utt]))
    report = {
        "run_dir": str(run_dir),
        "tag": args.tag,
        "checkpoint_step": int(np.asarray(state.step)),
        "num_utterances": n,
        "max_abs_diff": max_abs,
        "mean_abs_diff": mean_abs,
        "gates": {"max_abs": MAX_ABS_GATE, "mean_abs": MEAN_ABS_GATE},
        "passed": bool(max_abs < MAX_ABS_GATE and mean_abs < MEAN_ABS_GATE),
        "per_utterance": per_utt,
    }
    args.out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: report[k] for k in
                      ("checkpoint_step", "num_utterances", "max_abs_diff",
                       "mean_abs_diff", "passed")}, indent=2))
    if not report["passed"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
