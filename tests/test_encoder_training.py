"""Encoder pre-training: folding parity, loss parity vs the reference's
per-sample loop, DTW silent loss parity, and a mini training run."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.train.encoder import (
    ReduceLROnPlateau, silent_sample_loss, train_encoder_model,
    voiced_batch_loss, warmup_lr)
from ste_gan_tpu.train.encoder_data import SizeAwareSampler, fold_encoder_batch

from ref_loader import import_reference


def _items(rng, lengths, silent_flags=None):
    silent_flags = silent_flags or [False] * len(lengths)
    items = []
    for frames, silent in zip(lengths, silent_flags):
        items.append({
            C.DataType.REAL_EMG: rng.normal(size=(frames * 16, 8)).astype(np.float32),
            C.DataType.SPEECH_UNITS: rng.normal(size=(frames, 256)).astype(np.float32),
            C.DataType.PHONEMES: rng.integers(0, 48, frames).astype(np.int32),
            C.DataType.SPEAKING_MODE_ID: (C.SpeakingMode.SILENT if silent
                                          else C.SpeakingMode.NORMAL),
        })
    return items


class TestFolding:
    def test_matches_reference_combine_fixed_length(self, rng):
        ref_utils = import_reference("ste_gan.emg_encoder.utils")
        items = _items(rng, [130, 210, 90])
        batch = fold_encoder_batch(items, seq_len=50, n_win=20, max_samples=8)
        # window = 50*8 = 400 EMG samples
        want = ref_utils.combine_fixed_length(
            [torch.tensor(i[C.DataType.REAL_EMG]) for i in items], 400).numpy()
        got = batch.emg_windows[: want.shape[0]]
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # Windows beyond the fold are zero padding.
        assert np.all(batch.emg_windows[want.shape[0]:] == 0)

    def test_sample_ids(self, rng):
        items = _items(rng, [100, 50])
        batch = fold_encoder_batch(items, seq_len=50, n_win=15, max_samples=4)
        ids = batch.frame_sample_id
        assert np.all(ids[:100] == 0) and np.all(ids[100:150] == 1)
        assert np.all(ids[150:] == -1)
        assert int(batch.num_samples) == 2

    def test_size_aware_sampler_budget(self):
        lengths = [3000, 2000, 5000, 1000, 4000, 2500]
        for batch in SizeAwareSampler(lengths, max_len=8000, seed=1):
            assert sum(lengths[i] for i in batch) <= 8000
            assert batch


class TestVoicedLossParity:
    def test_matches_reference_per_sample_loop(self, rng):
        ref_train = import_reference("ste_gan.emg_encoder.train")
        lengths = [60, 90, 45]
        items = _items(rng, lengths)
        n_win, frames_per_win = 8, 100
        batch = fold_encoder_batch(items, seq_len=200, n_win=n_win, max_samples=8)

        total_frames = n_win * frames_per_win
        su_pred = rng.normal(size=(total_frames, 256)).astype(np.float32)
        ph_pred = rng.normal(size=(total_frames, 48)).astype(np.float32)

        # Reference: predictions as [n, frames, d] torch tensors + list batch.
        ref_batch = {
            "speech_unit_lengths": lengths,
            C.DataType.SPEECH_UNITS: [
                torch.tensor(i[C.DataType.SPEECH_UNITS]) for i in items],
            C.DataType.PHONEMES: [
                torch.tensor(np.asarray(i[C.DataType.PHONEMES], np.int64))
                for i in items],
            "silent": [False, False, False],
        }
        want, want_acc = ref_train.speech_unit_loss_combined(
            torch.tensor(su_pred).reshape(n_win, frames_per_win, 256),
            torch.tensor(ph_pred).reshape(n_win, frames_per_win, 48),
            ref_batch, phoneme_eval=True,
            phoneme_confusion=np.zeros((48, 48)))

        got, counters, confusion = voiced_batch_loss(
            jnp.asarray(su_pred), jnp.asarray(ph_pred),
            jax.tree.map(jnp.asarray, batch.as_dict()), max_samples=8)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
        got_acc = int(counters["num_correct"]) / int(counters["num_frames"])
        np.testing.assert_allclose(got_acc, want_acc, rtol=1e-6)
        assert int(np.asarray(confusion).sum()) == sum(lengths)


class TestSilentLossParity:
    def test_matches_reference_dtw_path(self, rng):
        ref_train = import_reference("ste_gan.emg_encoder.train")
        frames = 40
        items = _items(rng, [frames], [True])
        su_pred = rng.normal(size=(frames, 256)).astype(np.float32)
        ph_pred = rng.normal(size=(frames, 48)).astype(np.float32)

        ref_batch = {
            "speech_unit_lengths": [frames],
            C.DataType.SPEECH_UNITS: [
                torch.tensor(items[0][C.DataType.SPEECH_UNITS])],
            C.DataType.PHONEMES: [
                torch.tensor(np.asarray(items[0][C.DataType.PHONEMES], np.int64))],
            "silent": [True],
        }
        want, _ = ref_train.speech_unit_loss_combined(
            torch.tensor(su_pred).reshape(1, frames, 256),
            torch.tensor(ph_pred).reshape(1, frames, 48), ref_batch)

        got, _ = silent_sample_loss(
            jnp.asarray(su_pred), jnp.asarray(ph_pred),
            jnp.asarray(items[0][C.DataType.SPEECH_UNITS]),
            jnp.asarray(items[0][C.DataType.PHONEMES]))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-3)


class TestSchedulers:
    def test_warmup(self):
        assert warmup_lr(0, target=1.0, warmup=10) == pytest.approx(0.1)
        assert warmup_lr(9, target=1.0, warmup=10) == pytest.approx(1.0)
        assert warmup_lr(100, target=1.0, warmup=10) == pytest.approx(1.0)

    def test_plateau(self):
        sched = ReduceLROnPlateau(factor=0.5, patience=2)
        for val in [1.0, 0.9, 0.9, 0.9, 0.9]:
            sched.step(val)
        assert sched.multiplier == pytest.approx(0.5)


class TestMiniTraining:
    def test_loss_decreases_and_checkpoints(self, tmp_path):
        corpus = tmp_path / "corpus"
        generate_synthetic_corpus(corpus, num_train=8, num_valid=2, num_test=2,
                                  num_sessions=2, min_frames=110,
                                  max_frames=140, seed=1)
        cfg = Config()
        cfg.data.dataset_root = str(corpus)
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 1, "dropout": 0.0,
        }
        train_ds = EMGDataset(corpus, "train", return_mfccs=False,
                              return_emg_feats=False, filter_by_length=False)
        dev_ds = EMGDataset(corpus, "valid", return_mfccs=False,
                            return_emg_feats=False, filter_by_length=False,
                            session_id_to_idx=train_ds.session_id_to_idx,
                            speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx)
        run_dir = tmp_path / "enc_run"
        train_encoder_model(cfg, train_ds, dev_ds, run_dir, debug=False,
                            max_len=8000, num_epochs=10, warmup_steps=10)
        assert (run_dir / "best_val_loss_model").is_dir()
        assert (run_dir / "last_model").is_dir()
        # Loss decreased over training (from metrics.jsonl). The first ~30
        # steps sit deep inside the reference 500-step LR warmup
        # (emg_encoder/constants.py:20), so compare epoch-scale means, not
        # two single noisy steps.
        import json
        vals = [json.loads(line) for line in
                (run_dir / "metrics.jsonl").read_text().splitlines()]
        train_losses = [v["value"] for v in vals if v["tag"] == "train/loss"]
        assert len(train_losses) >= 10
        assert (np.mean(train_losses[-3:]) < np.mean(train_losses[:3])), \
            train_losses
