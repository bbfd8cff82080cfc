"""EncoderDeviceCorpus (train/encoder_data.py): the on-device fold must
reproduce fold_encoder_batch field-for-field from {rows, num_samples}
descriptors, for voiced-only and mixed voiced+silent batches."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu import emg_encoder_constants as EC
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.train.encoder_data import (
    EncoderDeviceCorpus, fold_encoder_batch, windows_needed)

SEQ_LEN = 25  # small windows (200 EMG samples) so tiny utterances pack


@pytest.fixture(scope="module")
def mixed_ds(tmp_path_factory) -> EMGDataset:
    root = tmp_path_factory.mktemp("mixed")
    generate_synthetic_corpus(root, num_train=10, num_valid=2, num_test=2,
                              num_sessions=2, min_frames=30, max_frames=60,
                              seed=3, silent_fraction=0.4)
    return EMGDataset(root, partition="train", only_include_voiced=False,
                      return_mfccs=False, return_emg_feats=False,
                      filter_by_length=False)


def _compare(host, dev, keys):
    for key in keys:
        np.testing.assert_array_equal(
            np.asarray(dev[key]), np.asarray(getattr(host, key)),
            err_msg=key)


def test_fold_matches_host_voiced(mixed_ds):
    voiced = [i for i, m in enumerate(mixed_ds.speaking_mode_ids)
              if m == C.SpeakingMode.NORMAL][:4]
    items = [mixed_ds[i] for i in voiced]
    n_win = windows_needed([len(it[C.DataType.REAL_EMG]) for it in items],
                           SEQ_LEN) + 1
    max_samples = 8

    host = fold_encoder_batch(items, seq_len=SEQ_LEN, n_win=n_win,
                              max_samples=max_samples)
    dc = EncoderDeviceCorpus(mixed_ds, float_dtype=jnp.float32)
    rows = np.zeros(max_samples, np.int32)
    rows[:len(voiced)] = voiced
    dev = jax.jit(lambda rr, nn: dc.fold(
        rr, nn, seq_len=SEQ_LEN, n_win=n_win, max_samples=max_samples))(
        jnp.asarray(rows), jnp.asarray(len(voiced)))

    _compare(host, dev, ("emg_windows", "su_targets", "ph_targets",
                         "frame_sample_id", "silent"))
    assert int(dev["num_samples"]) == len(items)


def test_fold_matches_host_mixed_silent(mixed_ds):
    """Mixed batch with silent samples: DTW slot fields must match too."""
    order = list(range(6))  # batch order mixes voiced and silent
    items = [mixed_ds[i] for i in order]
    n_win = windows_needed([len(it[C.DataType.REAL_EMG]) for it in items],
                           SEQ_LEN) + 1
    max_samples = 8
    silent_idx = [i for i, m in enumerate(mixed_ds.speaking_mode_ids)
                  if m != C.SpeakingMode.NORMAL]
    assert any(i in silent_idx for i in order), "fixture must include silent"
    max_silent = 4
    t_frames = max(len(mixed_ds[i][C.DataType.SPEECH_UNITS])
                   for i in silent_idx)
    p_frames = max(mixed_ds.emg_lengths[i] // EC.EMG_SIGNAL_TO_SPEECH_UNITS
                   for i in silent_idx)

    host = fold_encoder_batch(items, seq_len=SEQ_LEN, n_win=n_win,
                              max_samples=max_samples, max_silent=max_silent,
                              silent_target_frames=t_frames,
                              silent_pred_frames=p_frames)
    dc = EncoderDeviceCorpus(mixed_ds, float_dtype=jnp.float32)
    rows = np.zeros(max_samples, np.int32)
    rows[:len(order)] = order
    dev = jax.jit(lambda rr, nn: dc.fold(
        rr, nn, seq_len=SEQ_LEN, n_win=n_win, max_samples=max_samples,
        max_silent=max_silent, silent_target_frames=t_frames))(
        jnp.asarray(rows), jnp.asarray(len(order)))

    _compare(host, dev, (
        "emg_windows", "su_targets", "ph_targets", "frame_sample_id",
        "silent", "silent_su_targets", "silent_ph_targets",
        "silent_target_len", "silent_pred_start", "silent_pred_len"))


def test_fold_f16_is_cast_of_host(mixed_ds):
    voiced = [i for i, m in enumerate(mixed_ds.speaking_mode_ids)
              if m == C.SpeakingMode.NORMAL][:3]
    items = [mixed_ds[i] for i in voiced]
    n_win = windows_needed([len(it[C.DataType.REAL_EMG]) for it in items],
                           SEQ_LEN) + 1
    host = fold_encoder_batch(items, seq_len=SEQ_LEN, n_win=n_win,
                              max_samples=4)
    dc = EncoderDeviceCorpus(mixed_ds, float_dtype=jnp.float16)
    rows = np.zeros(4, np.int32)
    rows[:3] = voiced
    dev = dc.fold(jnp.asarray(rows), jnp.asarray(3), seq_len=SEQ_LEN,
                  n_win=n_win, max_samples=4)
    np.testing.assert_array_equal(
        np.asarray(dev["emg_windows"]), host.emg_windows.astype(np.float16))
    np.testing.assert_array_equal(
        np.asarray(dev["su_targets"]), host.su_targets.astype(np.float16))


def test_trainer_device_matches_host(tmp_path):
    """E2E: train_encoder_model with device_resident_data=True reproduces
    the host-pipeline loss trajectory (f32 both sides) on a MIXED corpus —
    the on-device fold drives the full step including the silent DTW path."""
    import json
    from ste_gan_tpu.config import Config
    from ste_gan_tpu.train.encoder import train_encoder_model

    corpus = tmp_path / "corpus"
    generate_synthetic_corpus(corpus, num_train=8, num_valid=2, num_test=2,
                              num_sessions=2, min_frames=110, max_frames=140,
                              seed=5, silent_fraction=0.3)
    cfg = Config()
    cfg.data.dataset_root = str(corpus)
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
    }

    def run(tag, resident):
        train_ds = EMGDataset(corpus, "train", return_mfccs=False,
                              return_emg_feats=False, filter_by_length=False,
                              only_include_voiced=False)
        dev_ds = EMGDataset(
            corpus, "valid", return_mfccs=False, return_emg_feats=False,
            filter_by_length=False, only_include_voiced=False,
            session_id_to_idx=train_ds.session_id_to_idx,
            speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx)
        assert any(m != C.SpeakingMode.NORMAL
                   for m in train_ds.speaking_mode_ids)
        run_dir = tmp_path / tag
        train_encoder_model(cfg, train_ds, dev_ds, run_dir, debug=False,
                            max_len=8000, num_epochs=2, warmup_steps=10,
                            device_resident_data=resident,
                            transfer_dtype="float32")
        vals = [json.loads(line) for line in
                (run_dir / "metrics.jsonl").read_text().splitlines()]
        return [v["value"] for v in vals if v["tag"] == "train/loss"]

    host_losses = run("host", False)
    dev_losses = run("device", True)
    assert len(host_losses) >= 2
    np.testing.assert_allclose(dev_losses, host_losses, rtol=1e-5, atol=1e-6)
