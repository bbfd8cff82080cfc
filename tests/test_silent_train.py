"""Mixed voiced+silent encoder TRAINING: the jit-side DTW silent loss
(silent_batch_loss) matches the reference's training-path silent branch
(ste_gan/emg_encoder/train.py:120-146) in value AND gradient, and a mini
mixed training run on the synthetic corpus works end to end."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.train.encoder import (
    init_mixed_datasets, silent_batch_loss, train_encoder_model,
    voiced_batch_loss)
from ste_gan_tpu.train.encoder_data import fold_encoder_batch

from ref_loader import import_reference


def _mixed_items(rng):
    """2 voiced + 2 silent samples; silent targets (from the 'parallel
    voiced recording') have different lengths than their prediction
    frames."""
    def item(pred_frames, target_frames, silent):
        return {
            C.DataType.REAL_EMG: rng.normal(
                size=(pred_frames * 16, 8)).astype(np.float32),
            C.DataType.SPEECH_UNITS: rng.normal(
                size=(target_frames, 256)).astype(np.float32),
            C.DataType.PHONEMES: rng.integers(0, 48, target_frames).astype(np.int32),
            C.DataType.SPEAKING_MODE_ID: (C.SpeakingMode.SILENT if silent
                                          else C.SpeakingMode.NORMAL),
        }

    return [item(50, 50, False), item(60, 45, True),
            item(30, 30, False), item(40, 55, True)]


def test_mixed_train_loss_and_grads_match_reference(rng):
    ref_train = import_reference("ste_gan.emg_encoder.train")
    items = _mixed_items(rng)
    pred_lengths = [len(i[C.DataType.REAL_EMG]) // 16 for i in items]

    n_win, frames_per_win = 2, 100  # seq_len 200 -> 1600 samples -> 100 frames
    batch = fold_encoder_batch(items, seq_len=200, n_win=n_win, max_samples=4,
                               max_silent=3, silent_target_frames=64,
                               silent_pred_frames=70)
    # Silent slot metadata: sample 1 at offset 50, sample 3 at offset 140.
    np.testing.assert_array_equal(batch.silent_pred_start[:2], [50, 140])
    np.testing.assert_array_equal(batch.silent_pred_len[:2], [60, 40])
    np.testing.assert_array_equal(batch.silent_target_len, [45, 55, 0])

    total = n_win * frames_per_win
    su_pred = rng.normal(size=(total, 256)).astype(np.float32)
    ph_pred = rng.normal(size=(total, 48)).astype(np.float32)

    # Reference: loss + gradients w.r.t. the raw predictions.
    su_t = torch.tensor(su_pred, requires_grad=True)
    ph_t = torch.tensor(ph_pred, requires_grad=True)
    ref_batch = {
        "speech_unit_lengths": pred_lengths,
        C.DataType.SPEECH_UNITS: [
            torch.tensor(i[C.DataType.SPEECH_UNITS]) for i in items],
        C.DataType.PHONEMES: [
            torch.tensor(np.asarray(i[C.DataType.PHONEMES], np.int64))
            for i in items],
        "silent": [False, True, False, True],
    }
    want, _ = ref_train.speech_unit_loss_combined(
        su_t.reshape(n_win, frames_per_win, 256),
        ph_t.reshape(n_win, frames_per_win, 48), ref_batch)
    want.backward()

    # Ours: one jit-compiled function, exactly as used in the train step.
    jbatch = jax.tree.map(jnp.asarray, batch.as_dict())

    @jax.jit
    def loss_fn(su, ph):
        voiced, _, _ = voiced_batch_loss(su, ph, jbatch, max_samples=4)
        silent_sum, _ = silent_batch_loss(su, ph, jbatch,
                                          silent_pred_frames=70)
        return voiced + silent_sum / jnp.float32(len(items))

    got, (g_su, g_ph) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(su_pred), jnp.asarray(ph_pred))

    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_su), su_t.grad.numpy(),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ph), ph_t.grad.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_silent_counters_match_reference(rng):
    """Aligned phoneme counters of the jit silent path equal the reference's
    phoneme_eval silent branch."""
    ref_train = import_reference("ste_gan.emg_encoder.train")
    items = _mixed_items(rng)
    pred_lengths = [len(i[C.DataType.REAL_EMG]) // 16 for i in items]
    n_win, frames_per_win = 2, 100
    batch = fold_encoder_batch(items, seq_len=200, n_win=n_win, max_samples=4,
                               max_silent=2, silent_target_frames=64,
                               silent_pred_frames=70)
    total = n_win * frames_per_win
    su_pred = rng.normal(size=(total, 256)).astype(np.float32)
    ph_pred = rng.normal(size=(total, 48)).astype(np.float32)

    confusion = np.zeros((48, 48))
    ref_batch = {
        "speech_unit_lengths": pred_lengths,
        C.DataType.SPEECH_UNITS: [
            torch.tensor(i[C.DataType.SPEECH_UNITS]) for i in items],
        C.DataType.PHONEMES: [
            torch.tensor(np.asarray(i[C.DataType.PHONEMES], np.int64))
            for i in items],
        "silent": [False, True, False, True],
    }
    _, want_acc = ref_train.speech_unit_loss_combined(
        torch.tensor(su_pred).reshape(n_win, frames_per_win, 256),
        torch.tensor(ph_pred).reshape(n_win, frames_per_win, 48),
        ref_batch, phoneme_eval=True, phoneme_confusion=confusion)

    jbatch = jax.tree.map(jnp.asarray, batch.as_dict())
    _, v_counters, _ = voiced_batch_loss(
        jnp.asarray(su_pred), jnp.asarray(ph_pred), jbatch, max_samples=4)
    _, s_counters = silent_batch_loss(
        jnp.asarray(su_pred), jnp.asarray(ph_pred), jbatch,
        silent_pred_frames=70)
    got_acc = ((int(v_counters["num_correct"]) + int(s_counters["num_correct_silent"]))
               / (int(v_counters["num_frames"]) + int(s_counters["num_frames_silent"])))
    np.testing.assert_allclose(got_acc, want_acc, rtol=1e-6)


def test_fold_rejects_overflow(rng):
    items = _mixed_items(rng)
    with pytest.raises(ValueError, match="max_silent"):
        fold_encoder_batch(items, seq_len=200, n_win=2, max_samples=4,
                           max_silent=1, silent_target_frames=64,
                           silent_pred_frames=70)
    with pytest.raises(ValueError, match="target frames"):
        fold_encoder_batch(items, seq_len=200, n_win=2, max_samples=4,
                           max_silent=2, silent_target_frames=50,
                           silent_pred_frames=70)


def test_mixed_training_run(tmp_path):
    """Mini mixed training run on a synthetic corpus with silent utterances
    (the reference's broken mixed initializer means it cannot do this;
    ste_gan/emg_encoder/utils.py:149-180)."""
    root = tmp_path / "corpus"
    generate_synthetic_corpus(root, num_train=10, num_valid=3, num_test=2,
                              num_sessions=2, min_frames=30, max_frames=50,
                              seed=5, silent_fraction=0.4)
    trainset, devset, _ = init_mixed_datasets(root)
    assert any(m != C.SpeakingMode.NORMAL for m in trainset.speaking_mode_ids), \
        "fixture must contain silent utterances"
    assert any(m != C.SpeakingMode.NORMAL for m in devset.speaking_mode_ids)

    cfg = Config()
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
    }
    out = tmp_path / "run"
    # max_len small enough that the size-aware sampler yields multiple
    # batches (the last incomplete batch is dropped, reference semantics).
    state = train_encoder_model(cfg, trainset, devset, out,
                                max_len=3200, num_epochs=2)
    assert int(state.step) > 0, "no train batches were produced"
    assert (out / "best_val_loss_model").is_dir()
    assert (out / "last_model").is_dir()
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(state.params))
