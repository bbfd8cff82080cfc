"""Mixed voiced+silent encoder evaluation vs the reference's
speech_unit_loss_combined (silent samples have parallel-voiced targets of a
DIFFERENT length than their EMG-derived prediction frames)."""
import numpy as np
import pytest
import torch

from ste_gan_tpu import constants as C
from ste_gan_tpu.train.encoder import silent_losses_host
from ste_gan_tpu.train.encoder_data import fold_encoder_batch

from ref_loader import import_reference


def _mixed_items(rng):
    """One voiced sample (targets == pred frames) + one silent sample
    (60 prediction frames from EMG, 45 target frames from the parallel
    voiced recording)."""
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

    return [item(50, 50, False), item(60, 45, True)]


def test_mixed_batch_matches_reference(rng):
    ref_train = import_reference("ste_gan.emg_encoder.train")
    items = _mixed_items(rng)
    pred_lengths = [len(i[C.DataType.REAL_EMG]) // 16 for i in items]
    total_pred = sum(pred_lengths)

    n_win, frames_per_win = 2, 100  # seq_len 200 -> 1600 samples -> 100 frames
    batch = fold_encoder_batch(items, seq_len=200, n_win=n_win, max_samples=4)
    # Voiced frames fill slots [0, 50); silent sample occupies [50, 110).
    assert list(batch.frame_sample_id[:50]) == [0] * 50
    assert list(batch.frame_sample_id[50:110]) == [1] * 60
    assert np.all(batch.frame_sample_id[110:] == -1)
    assert bool(batch.silent[1]) and not bool(batch.silent[0])

    total = n_win * frames_per_win
    su_pred = rng.normal(size=(total, 256)).astype(np.float32)
    ph_pred = rng.normal(size=(total, 48)).astype(np.float32)

    # Reference computes both branches in one per-sample loop.
    ref_batch = {
        "speech_unit_lengths": pred_lengths,
        C.DataType.SPEECH_UNITS: [
            torch.tensor(i[C.DataType.SPEECH_UNITS]) for i in items],
        C.DataType.PHONEMES: [
            torch.tensor(np.asarray(i[C.DataType.PHONEMES], np.int64))
            for i in items],
        "silent": [False, True],
    }
    want, want_acc = ref_train.speech_unit_loss_combined(
        torch.tensor(su_pred).reshape(n_win, frames_per_win, 256),
        torch.tensor(ph_pred).reshape(n_win, frames_per_win, 48),
        ref_batch, phoneme_eval=True, phoneme_confusion=np.zeros((48, 48)))

    # Ours: vectorised voiced part + host DTW silent part.
    import jax.numpy as jnp
    import jax
    from ste_gan_tpu.train.encoder import voiced_batch_loss

    voiced_loss, counters, _ = voiced_batch_loss(
        jnp.asarray(su_pred), jnp.asarray(ph_pred),
        jax.tree.map(jnp.asarray, batch.as_dict()), max_samples=4)
    silent_loss, silent_correct, silent_total = silent_losses_host(
        su_pred, ph_pred, items)
    got = float(voiced_loss) + silent_loss / len(items)
    np.testing.assert_allclose(got, float(want), rtol=1e-3)

    got_acc = ((int(counters["num_correct"]) + silent_correct)
               / (int(counters["num_frames"]) + silent_total))
    np.testing.assert_allclose(got_acc, want_acc, rtol=1e-6)
