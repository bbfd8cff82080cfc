"""Batched speech->EMG synthesis over a dataset split (the serving CLI).

The reference has no inference entry point (synthesis happens inline in the
train loop; ste_gan/train.py:383-414). This script loads a training run
directory (config snapshot + checkpoint + session vocabulary), converts a
whole split with per-session embedding lookup, reports throughput + real-time
factor, and writes ``emg_synth/{utt_id}.npy`` artifacts.

Usage:
    python scripts/generate_emg.py --run_dir exp/ste-gan/<run> \
        --partition test [--tag best] [--out_dir <run>/emg_synth]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import load_config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.infer import EMGSynthesizer, convert_dataset
from ste_gan_tpu.train.gan import eval_generator_params, load_trained_state
from ste_gan_tpu.utils.jax_setup import enable_compilation_cache


def load_generator_params(run_dir: Path, tag: str):
    _, models, state = load_trained_state(run_dir, tag)
    return models, eval_generator_params(state)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run_dir", type=Path, required=True)
    parser.add_argument("--partition", type=str, default="test")
    parser.add_argument("--tag", type=str, default="best",
                        help="checkpoint tag: best | latest | checkpoint-XXXXXXXX")
    parser.add_argument("--out_dir", type=Path, default=None)
    parser.add_argument("--bucket", type=int, default=64)
    args = parser.parse_args()

    enable_compilation_cache()
    run_dir = Path(args.run_dir)
    cfg = load_config(config=run_dir / "config.yaml")

    # Session vocabulary saved next to the checkpoints at train time.
    session_map = json.loads((run_dir / "session_idx_to_id.json").read_text())
    session_id_to_idx = {v: int(k) for k, v in session_map.items()}
    mode_map = json.loads((run_dir / "speaking_mode_idx_to_id.json").read_text())
    mode_id_to_idx = {v: int(k) for k, v in mode_map.items()}

    dataset = EMGDataset(Path(cfg.data.dataset_root), args.partition,
                         session_id_to_idx=session_id_to_idx,
                         speaking_mode_id_to_idx=mode_id_to_idx,
                         filter_by_length=False)

    models, gen_params = load_generator_params(run_dir, args.tag)
    synth = EMGSynthesizer(models.generator, gen_params, bucket=args.bucket)

    # First pass compiles each bucket length (slow through a remote tunnel);
    # the timed second pass measures steady-state serving throughput.
    start = time.perf_counter()
    results = convert_dataset(synth, dataset,
                              feature_key=cfg.model.speech_feature_type,
                              bucket=args.bucket)
    cold = time.perf_counter() - start
    start = time.perf_counter()
    results = convert_dataset(synth, dataset,
                              feature_key=cfg.model.speech_feature_type,
                              bucket=args.bucket)
    elapsed = time.perf_counter() - start

    total_emg_samples = sum(len(r[C.DataType.FAKE_EMG]) for r in results)
    audio_seconds = total_emg_samples / C.EMG_SAMPLE_RATE
    print(f"converted {len(results)} utterances ({audio_seconds:.1f}s of EMG); "
          f"cold {cold:.2f}s (incl. compiles), warm {elapsed:.2f}s "
          f"-> RTF {elapsed / max(audio_seconds, 1e-9):.5f}")

    out_dir = args.out_dir or (run_dir / "emg_synth" / args.partition)
    out_dir.mkdir(parents=True, exist_ok=True)
    for res in results:
        np.save(out_dir / f"{res[C.DataType.UTT_ID]}.npy",
                res[C.DataType.FAKE_EMG])
    print(f"wrote {len(results)} files to {out_dir}")


if __name__ == "__main__":
    main()
