"""Standalone offline evaluation CLI for trained models.

The reference has no offline evaluation entry point: its only metric
surfaces are the validation block inside the GAN training loop
(/root/reference/ste_gan/train.py:292-368) and the encoder ``test()``
whose DTW phoneme confusion matrix is computed but never written anywhere
(/root/reference/ste_gan/emg_encoder/train.py:37-63). This module
productizes both as a first-class CLI over trained run directories:

    # reference-protocol metrics of a trained GAN on any partition,
    # plus the full-utterance synthesis->decode round trip:
    python -m ste_gan_tpu.evaluate gan --run_dir exp/ste-gan/<run> \
        --emg_enc_ckpt <enc_run>/best_val_loss_model \
        [--partition test] [--tag best] [--full] [--out report.json]

    # the decode direction: encoder loss / phoneme accuracy / labeled
    # confusion matrix on real EMG:
    python -m ste_gan_tpu.evaluate encoder \
        --ckpt <enc_run>/best_val_loss_model --data_root data/synthetic \
        [--partition valid] [--include_silent] [--out report.json]

``gan`` reports the exact reference validation metric set (waveform MSE,
multi-TD error, speech-unit error, phoneme loss, phoneme accuracy with
and without silence) over first-chunk batches — the validation collate —
of the chosen partition. With ``--full`` it additionally synthesizes every
utterance end-to-end through the production bucketed inference path
(`infer.EMGSynthesizer`), decodes the GENERATED EMG with the same frozen
encoder, and reports frame phoneme accuracy / speech-unit L1 / the
phoneme confusion matrix over every full-length frame — the round trip
the model exists for.

All reports are JSON (one file + a pretty stdout summary); confusion
matrices are labeled with ``PHONEME_INVENTORY`` and come with their
top off-diagonal confusions pre-extracted.
"""
from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from types import SimpleNamespace
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ste_gan_tpu import constants as C
from ste_gan_tpu import emg_encoder_constants as EC
from ste_gan_tpu.utils.metrics import (mean_error, phoneme_accuracy,
                                       phoneme_accuracy_no_silence)


# ---------------------------------------------------------------------------
# Shared helpers
# ---------------------------------------------------------------------------


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def top_confusions(confusion: np.ndarray, k: int = 10) -> list:
    """Largest off-diagonal entries of a [pred, target] confusion matrix,
    labeled with the phoneme inventory."""
    conf = np.asarray(confusion).copy()
    np.fill_diagonal(conf, 0)
    flat = conf.ravel()
    order = np.argsort(flat)[::-1][:k]
    out = []
    for idx in order:
        if flat[idx] == 0:
            break
        pred, target = np.unravel_index(idx, conf.shape)
        out.append({
            "predicted": C.PHONEME_INVENTORY[int(pred)],
            "target": C.PHONEME_INVENTORY[int(target)],
            "count": int(flat[idx]),
        })
    return out


def _vocab_from_run_dir(run_dir: Path):
    """The session/speaking-mode vocabularies a training run exported
    (required to reproduce embedding indices; reference saves the same
    JSONs next to its checkpoints, ste_gan/data/emg_dataset.py:202-218)."""
    sess = json.loads((run_dir / "session_idx_to_id.json").read_text())
    mode = json.loads((run_dir / "speaking_mode_idx_to_id.json").read_text())
    return ({v: int(k) for k, v in sess.items()},
            {v: int(k) for k, v in mode.items()})


# ---------------------------------------------------------------------------
# GAN evaluation
# ---------------------------------------------------------------------------


def evaluate_gan_chunked(cfg, models, gen_params, encoder_variables,
                         dataset) -> Dict[str, float]:
    """The reference validation protocol on one partition: first-chunk
    batches through `train.gan.make_eval_step` (waveform/multi-TD/SU/
    phoneme errors + phone counters; ste_gan/train.py:292-368)."""
    from ste_gan_tpu.data.loader import DataLoader
    from ste_gan_tpu.train.gan import make_eval_step
    from ste_gan_tpu.train.train_gan import _drop_none

    loader = DataLoader(dataset, cfg.train.batch_size, "valid",
                        shuffle=False, emg_train_length=cfg.train.chunk_size,
                        hopsize=C.HOPSIZE)
    eval_step = jax.jit(make_eval_step(cfg, models))
    errors: Dict[str, list] = {k: [] for k in (
        "val/waveform", "val/envelope_l1", "val/multi_td",
            "val/speech_unit", "val/phoneme")}
    counters = {k: 0 for k in (
        "num_phones", "num_correct", "num_silence", "num_correct_no_silence")}
    num_batches = 0
    for batch in loader:
        metrics = eval_step(gen_params, _drop_none(batch), encoder_variables)
        for key in errors:
            errors[key].append(float(metrics[key]))
        for key in counters:
            counters[key] += int(metrics[f"count/{key}"])
        num_batches += 1
    out = {key: mean_error(vals) for key, vals in errors.items()}
    out["val/phoneme_accuracy_avg"] = phoneme_accuracy(
        counters["num_phones"], counters["num_correct"])
    out["val/phoneme_accuracy_avg_no_sil"] = phoneme_accuracy_no_silence(
        counters["num_phones"], counters["num_correct_no_silence"],
        counters["num_silence"])
    out["num_batches"] = num_batches
    return out


def evaluate_gan_full(cfg, models, gen_params, encoder_variables, dataset,
                      bucket_frames: int = 64) -> Dict:
    """Full-utterance round trip: synthesize each utterance (production
    bucketed inference), decode the GENERATED EMG with the frozen encoder,
    score against the ground-truth unit/phoneme tracks over every frame."""
    from ste_gan_tpu.infer import EMGSynthesizer

    synth = EMGSynthesizer.from_config(cfg, gen_params,
                                       bucket=bucket_frames)
    hop = C.HOPSIZE

    @jax.jit
    def decode(emg):
        return models.encoder_apply(encoder_variables, emg)

    confusion = np.zeros((C.NUM_PHONEMES, C.NUM_PHONEMES), np.int64)
    total_frames = correct = 0
    su_l1_sum = 0.0
    per_utt = []
    feature_key = cfg.model.speech_feature_type
    for idx in range(len(dataset)):
        sample = dataset[idx]
        feats = np.asarray(sample[feature_key])
        fake = synth.synthesize(feats,
                                int(sample[C.DataType.SESSION_INDEX]),
                                int(sample[C.DataType.SPEAKING_MODE_INDEX]))
        target_su = np.asarray(sample[C.DataType.SPEECH_UNITS])
        target_ph = np.asarray(sample[C.DataType.PHONEMES])
        frames = min(len(target_ph), fake.shape[0] // hop)
        pad_frames = _round_up(frames, bucket_frames)
        emg = np.zeros((1, pad_frames * hop, fake.shape[1]), np.float32)
        emg[0, : frames * hop] = fake[: frames * hop]
        units, ph_logits = decode(emg)
        pred_ph = np.argmax(np.asarray(ph_logits[0, :frames]), axis=-1)
        hits = pred_ph == target_ph[:frames]
        np.add.at(confusion, (pred_ph, target_ph[:frames]), 1)
        su_l1 = float(np.abs(np.asarray(units[0, :frames])
                             - target_su[:frames]).mean())
        correct += int(hits.sum())
        total_frames += frames
        su_l1_sum += su_l1 * frames
        per_utt.append({"utt": dataset.utt_ids[idx], "frames": frames,
                        "phoneme_accuracy": round(float(hits.mean()), 5),
                        "su_l1": round(su_l1, 5)})
    return {
        "num_utterances": len(per_utt),
        "total_frames": total_frames,
        "phoneme_accuracy": correct / max(total_frames, 1),
        "chance_accuracy": 1.0 / C.NUM_PHONEMES,
        "su_l1": su_l1_sum / max(total_frames, 1),
        "top_confusions": top_confusions(confusion),
        "confusion_labels": list(C.PHONEME_INVENTORY),
        "confusion": confusion.tolist(),
        "per_utterance": per_utt,
    }


def evaluate_gan(run_dir: Path, emg_enc_ckpt: Path, partition: str = "valid",
                 tag: str = "best", full: bool = False,
                 realism: bool = False, bucket_frames: int = 64) -> Dict:
    """Load a trained GAN run and evaluate it on one partition."""
    from ste_gan_tpu.data.dataset import EMGDataset
    from ste_gan_tpu.train.checkpoint import load_pytree
    from ste_gan_tpu.train.gan import (eval_generator_params,
                                       load_trained_state)

    run_dir = Path(run_dir)
    cfg, models, state = load_trained_state(run_dir, tag)
    sess_vocab, mode_vocab = _vocab_from_run_dir(run_dir)

    template = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels)),
        train=False))(jax.random.PRNGKey(0))
    encoder_variables = load_pytree(Path(emg_enc_ckpt), template)

    def make_dataset(filter_by_length: bool) -> EMGDataset:
        return EMGDataset(
            Path(cfg.data.dataset_root), partition=partition,
            session_id_to_idx=sess_vocab, speaking_mode_id_to_idx=mode_vocab,
            only_include_voiced=True, filter_by_length=filter_by_length,
            train_emg_length=cfg.train.chunk_size, strict=cfg.data.strict)

    gen_params = eval_generator_params(state)  # EMA weights when present
    report: Dict = {
        "mode": "gan", "run_dir": str(run_dir), "tag": tag,
        "partition": partition, "emg_enc_ckpt": str(emg_enc_ckpt),
        "chunked": evaluate_gan_chunked(
            cfg, models, gen_params, encoder_variables,
            make_dataset(filter_by_length=True)),
    }
    if full:
        report["full_utterance"] = evaluate_gan_full(
            cfg, models, gen_params, encoder_variables,
            make_dataset(filter_by_length=False), bucket_frames)
    if realism:
        # Distribution-level metrics over quantities no training loss
        # optimises directly (realism.py; VERDICT r3 #1).
        from ste_gan_tpu.realism import realism_report
        report["realism"] = realism_report(
            cfg, models, gen_params, encoder_variables,
            make_dataset(filter_by_length=False), bucket_frames)
    return report


# ---------------------------------------------------------------------------
# Encoder evaluation (the decode direction)
# ---------------------------------------------------------------------------


def evaluate_encoder(ckpt: Path, data_root: Path,
                     emg_enc_cfg: Optional[str] = None,
                     partition: str = "valid",
                     include_silent: bool = False,
                     batch_size: int = EC.BATCH_SIZE) -> Dict:
    """Encoder loss + phoneme accuracy + labeled confusion matrix on real
    EMG of one partition. ``include_silent`` adds silent utterances, scored
    through the host-side DTW-aligned path exactly like training eval
    (reference test(); ste_gan/emg_encoder/train.py:37-63)."""
    from ste_gan_tpu.config import load_config
    from ste_gan_tpu.models.emg_encoder import init_emg_encoder
    from ste_gan_tpu.train.checkpoint import load_pytree
    from ste_gan_tpu.train.encoder import (evaluate, init_mixed_datasets,
                                           init_voiced_datasets,
                                           make_encoder_eval_step)
    from ste_gan_tpu.train.encoder_data import windows_needed

    cfg = load_config(emg_enc_cfg=emg_enc_cfg)
    init = init_mixed_datasets if include_silent else init_voiced_datasets
    trainset, devset, testset = init(Path(data_root))
    dataset = {"train": trainset, "valid": devset, "test": testset}[partition]
    if len(dataset) == 0:
        raise ValueError(f"partition {partition!r} at {data_root} is empty")

    model = init_emg_encoder(cfg)
    num_channels = dataset.num_emg_channels
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, EC.SEQ_LEN * 8, num_channels)), train=False)
    )(jax.random.PRNGKey(0))
    variables = load_pytree(Path(ckpt), template)
    state = SimpleNamespace(params=variables["params"],
                            batch_stats=variables["batch_stats"])

    # Window budget: enough to fold the largest possible eval batch (the
    # trainer additionally floors this at its training budget for compile
    # reuse; a standalone eval needs only what the data requires).
    lengths = sorted(dataset.emg_lengths, reverse=True)[:batch_size]
    n_win = max(1, windows_needed(lengths, EC.SEQ_LEN))
    max_samples = max(64, 2 * n_win, batch_size)
    eval_step = jax.jit(make_encoder_eval_step(model, max_samples))

    loss, acc, confusion = evaluate(model, eval_step, state, dataset,
                                    n_win, max_samples,
                                    batch_size=batch_size)
    return {
        "mode": "encoder", "ckpt": str(ckpt), "partition": partition,
        "include_silent": include_silent,
        "num_utterances": len(dataset),
        "loss": float(loss),
        "phoneme_accuracy": float(acc),
        "chance_accuracy": 1.0 / C.NUM_PHONEMES,
        "top_confusions": top_confusions(confusion),
        "confusion_labels": list(C.PHONEME_INVENTORY),
        "confusion": np.asarray(confusion).tolist(),
    }


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _print_summary(report: Dict) -> None:
    slim = {k: v for k, v in report.items() if k != "confusion"}
    if "full_utterance" in slim:
        slim["full_utterance"] = {
            k: v for k, v in slim["full_utterance"].items()
            if k not in ("per_utterance", "confusion")}
    print(json.dumps(slim, indent=2))


def main(argv=None) -> Dict:
    parser = argparse.ArgumentParser(
        prog="python -m ste_gan_tpu.evaluate", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="command", required=True)

    g = sub.add_parser("gan", help="evaluate a trained GAN run")
    g.add_argument("--run_dir", type=Path, required=True)
    g.add_argument("--emg_enc_ckpt", type=Path, required=True,
                   help="the frozen perceptual encoder checkpoint "
                        "(same one used for GAN training)")
    g.add_argument("--partition", default="valid",
                   choices=("train", "valid", "test"))
    g.add_argument("--tag", default="best",
                   help="checkpoint tag: best | latest | checkpoint-XXXXXXXX")
    g.add_argument("--full", action="store_true",
                   help="also run the full-utterance synthesis->decode "
                        "round trip (per-utterance metrics + confusion)")
    g.add_argument("--realism", action="store_true",
                   help="also compute distribution-level realism metrics "
                        "(Fréchet encoder distance, pooled TD-feature "
                        "Wasserstein, log-spectral distance) between real "
                        "and generated EMG — quantities no training loss "
                        "optimises directly (realism.py)")
    g.add_argument("--bucket_frames", type=int, default=64)
    g.add_argument("--out", type=Path, default=None,
                   help="write the JSON report here "
                        "(default <run_dir>/eval_<partition>.json)")

    e = sub.add_parser("encoder", help="evaluate an EMG-encoder checkpoint")
    e.add_argument("--ckpt", type=Path, required=True)
    e.add_argument("--data_root", type=Path, required=True)
    e.add_argument("--emg_enc_cfg", default=None,
                   help="encoder architecture YAML (default: the built-in "
                        "conv_transformer defaults)")
    e.add_argument("--partition", default="valid",
                   choices=("train", "valid", "test"))
    e.add_argument("--include_silent", action="store_true")
    e.add_argument("--batch_size", type=int, default=EC.BATCH_SIZE)
    e.add_argument("--out", type=Path, default=None)

    args = parser.parse_args(argv)
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    if args.command == "gan":
        report = evaluate_gan(args.run_dir, args.emg_enc_ckpt,
                              partition=args.partition, tag=args.tag,
                              full=args.full, realism=args.realism,
                              bucket_frames=args.bucket_frames)
        out = args.out or (args.run_dir / f"eval_{args.partition}.json")
    else:
        report = evaluate_encoder(args.ckpt, args.data_root,
                                  emg_enc_cfg=args.emg_enc_cfg,
                                  partition=args.partition,
                                  include_silent=args.include_silent,
                                  batch_size=args.batch_size)
        out = args.out or (args.ckpt.parent
                           / f"eval_{args.partition}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    logging.info("report written to %s", out)
    _print_summary(report)
    return report


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
