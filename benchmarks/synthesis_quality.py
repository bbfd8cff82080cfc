"""End-to-end synthesis quality: decode GENERATED EMG back to phonemes.

The product loop the reference exists for (SURVEY §1; ste_gan/train.py's
validation, ste_gan/eval/*): speech features -> synthetic EMG -> does the
synthetic EMG still carry the linguistic content? This script closes that
loop on full-length utterances through the production inference path:

1. ``scripts/generate_emg.py`` writes ``emg_synth/<partition>/{utt}.npy``
   for a trained run (bucketed batched inference, per-session embeddings);
2. here, the PRE-TRAINED frozen EMG encoder (the same checkpoint used for
   the GAN's perceptual losses) decodes each generated signal to
   (speech units, phoneme logits) at 50 Hz;
3. we report frame phoneme accuracy and speech-unit L1 vs the ground-truth
   tracks, over every frame of every utterance (no chunking — lengths are
   bucketed to the encoder's 16-sample hop).

Writes ``benchmarks/stability_r3/synthesis_quality.json``;
``tests/test_stability_report.py`` asserts the committed numbers.

Usage:
  python benchmarks/synthesis_quality.py --run_dir exp/ste-gan-25k/<run> \
      --emg_enc_ckpt exp/emg_encoder/<run>/best_val_loss_model
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import load_config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.train.checkpoint import load_pytree
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run_dir", type=Path, required=True,
                        help="Trained GAN run dir (for config + emg_synth).")
    parser.add_argument("--emg_enc_ckpt", type=Path, required=True)
    parser.add_argument("--partition", type=str, default="test")
    parser.add_argument("--bucket_frames", type=int, default=64,
                        help="Pad utterances to multiples of this many "
                             "50 Hz frames (bounds recompiles).")
    parser.add_argument("--out", type=Path,
                        default=Path(__file__).parent / "stability_r3"
                        / "synthesis_quality.json")
    args = parser.parse_args()

    enable_compilation_cache()
    cfg = load_config(config=str(args.run_dir / "config.yaml"))
    dataset = EMGDataset(Path(cfg.data.dataset_root), partition=args.partition)
    synth_dir = args.run_dir / "emg_synth" / args.partition
    if not synth_dir.is_dir():
        raise FileNotFoundError(
            f"{synth_dir} missing — run scripts/generate_emg.py first")

    model = EMGEncoderTransformer(**(cfg.emg_encoder.params or {}))
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 16 * args.bucket_frames, cfg.data.num_emg_channels)),
        train=False))(jax.random.PRNGKey(0))
    variables = load_pytree(args.emg_enc_ckpt, template)

    @jax.jit
    def decode(emg):
        return model.apply(variables, emg, train=False)

    hop = C.HOPSIZE  # 16 EMG samples per 50 Hz frame
    total_frames = correct = 0
    su_l1_sum = 0.0
    per_utt = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        utt_id = dataset.utt_ids[idx]
        fake_path = synth_dir / f"{utt_id}.npy"
        if not fake_path.exists():
            continue
        fake = np.load(fake_path)                                 # [T, C]
        target_su = np.asarray(sample[C.DataType.SPEECH_UNITS])   # [F, 256]
        target_ph = np.asarray(sample[C.DataType.PHONEMES])       # [F]
        frames = min(len(target_ph), fake.shape[0] // hop)
        pad_frames = -(-frames // args.bucket_frames) * args.bucket_frames
        emg = np.zeros((1, pad_frames * hop, fake.shape[1]), np.float32)
        emg[0, : frames * hop] = fake[: frames * hop]
        units, ph_logits = decode(emg)
        pred_ph = np.argmax(np.asarray(ph_logits[0, :frames]), axis=-1)
        acc_utt = float((pred_ph == target_ph[:frames]).mean())
        su_l1 = float(np.abs(np.asarray(units[0, :frames])
                             - target_su[:frames]).mean())
        correct += int((pred_ph == target_ph[:frames]).sum())
        total_frames += frames
        su_l1_sum += su_l1 * frames
        per_utt.append({"utt": utt_id, "frames": frames,
                        "phoneme_accuracy": round(acc_utt, 5),
                        "su_l1": round(su_l1, 5)})

    summary = {
        "partition": args.partition,
        "num_utterances": len(per_utt),
        "total_frames": total_frames,
        "phoneme_accuracy": correct / max(total_frames, 1),
        "chance_accuracy": 1.0 / C.NUM_PHONEMES,
        "su_l1": su_l1_sum / max(total_frames, 1),
        "per_utterance": per_utt,
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_utterance"}, indent=2))


if __name__ == "__main__":
    main()
