"""ETL tests: EMG DSP parity vs the reference (scipy paths), TextGrid
parsing, and the JAX MFCC frontend."""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.etl import audio_dsp, emg_dsp

from ref_loader import import_reference

TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 0.30
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 0.30
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 0.30
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 0.30
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 0.10
            text = "HH"
        intervals [2]:
            xmin = 0.10
            xmax = 0.22
            text = "AY1"
        intervals [3]:
            xmin = 0.22
            xmax = 0.30
            text = ""
"""


class TestEMGDSP:
    def test_filter_chain_matches_reference(self, rng):
        ref = import_reference("ste_gan.utils.emg_utils")
        x = rng.normal(size=(1200, 3))
        before = rng.normal(size=(150, 3))
        after = rng.normal(size=(100, 3))
        want = ref.pre_process_emg_signal(x, before, after,
                                          emg_raw_target_sample_rate=800)
        got = emg_dsp.pre_process_emg_signal(x, before, after,
                                             emg_raw_target_sample_rate=800)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_double_average_matches_reference(self, rng):
        ref = import_reference("ste_gan.utils.emg_utils")
        x = rng.normal(size=500)
        np.testing.assert_allclose(emg_dsp.double_average(x),
                                   ref.double_average(x), rtol=1e-9)

    def test_hilbert_feats_match_reference(self, rng):
        ref = import_reference("ste_gan.utils.emg_utils")
        x = rng.normal(size=1600)
        want = ref.calculate_hilbert_transform_feats(x, max_num_frames=150)
        got = emg_dsp.calculate_hilbert_transform_feats(x, max_num_frames=150)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_td_feature_shapes_and_sanity(self, rng):
        emg = rng.normal(size=(1600, 8)).astype(np.float32)
        feats = emg_dsp.get_emg_features(emg, pad=True)
        # 100 Hz frames over 2 s of 800 Hz signal, 6 features per channel.
        assert feats.shape == (200, 8, 6)
        assert np.all(np.isfinite(feats))
        # ZCR is a rate in [0, 1]; RMS features non-negative.
        assert feats[..., 3].min() >= 0 and feats[..., 3].max() <= 1
        assert feats[..., 1].min() >= 0 and feats[..., 2].min() >= 0

    def test_emg_aligns_16x_with_100hz_features(self, rng):
        emg = rng.normal(size=(1600, 8)).astype(np.float32)
        feats = emg_dsp.get_emg_features(emg, pad=True)
        cut = emg[: 8 * feats.shape[0]]
        assert len(cut) == 8 * feats.shape[0]


class TestTextGrid:
    def test_read_phonemes(self, tmp_path):
        tg = tmp_path / "x.TextGrid"
        tg.write_text(TEXTGRID)
        phones = audio_dsp.read_phonemes(tg)
        from ste_gan_tpu.constants import PHONEME_INVENTORY
        hh, ay, sil = (PHONEME_INVENTORY.index(p) for p in ("hh", "ay", "sil"))
        assert list(phones[:5]) == [hh] * 5
        assert list(phones[5:11]) == [ay] * 6
        assert all(p == sil for p in phones[11:])
        # 50 Hz over 0.30 s -> 16 entries (int(0.30*50)+1).
        assert len(phones) == 16

    def test_max_len(self, tmp_path):
        tg = tmp_path / "x.TextGrid"
        tg.write_text(TEXTGRID)
        phones = audio_dsp.read_phonemes(tg, max_len=10)
        assert len(phones) == 10


class TestMFCC:
    def test_frame_rate_is_100hz(self, rng):
        audio = rng.normal(size=16_000).astype(np.float32) * 0.1
        audio = audio_dsp.cut_audio_to_soft_speech_match_unit_frame_rate(audio)
        mfccs = audio_dsp.MFCCsCalculator()(audio)
        # 1 s of 16 kHz audio -> 100 frames x 25 coefficients.
        assert mfccs.shape == (100, 25)
        assert np.all(np.isfinite(mfccs))

    def test_mfcc_matches_numpy_pipeline(self, rng):
        """Independent numpy implementation of the documented torchaudio
        pipeline as an oracle."""
        audio = (rng.normal(size=4800) * 0.1).astype(np.float32)
        got = np.asarray(audio_dsp.mfcc_jax(jnp.asarray(audio)))

        pad = (512 - 160) // 2
        x = np.pad(audio, (pad, pad), mode="reflect")
        n_frames = 1 + (len(x) - 512) // 160
        window = np.hanning(513)[:-1]
        frames = np.stack([x[i * 160:i * 160 + 512] * window
                           for i in range(n_frames)])
        power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        mel = power @ audio_dsp.mel_filterbank(257, 80, 16_000)
        db = 10 * np.log10(np.maximum(mel, 1e-10))
        db = np.maximum(db, db.max() - 80.0)
        want = db @ audio_dsp._dct_ortho(25, 80)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_dct_is_orthonormal(self):
        d = audio_dsp._dct_ortho(80, 80)
        np.testing.assert_allclose(d.T @ d, np.eye(80), atol=1e-5)

    def test_align_speech_units_and_mfccs(self, rng):
        units = rng.normal(size=(50, 256))
        mfccs = rng.normal(size=(103, 25))
        u, m = audio_dsp.align_speech_units_and_mfccs(units, mfccs)
        assert len(m) == 2 * len(u)

    def test_normalize_volume(self, rng):
        audio = rng.normal(size=8000) * 3.0
        out = audio_dsp.normalize_volume(audio)
        assert np.abs(out).max() <= 1.0
        rms = audio_dsp._frame_rms_centered(out).max()
        assert rms < 0.35


class TestAuxFilters:
    def test_bandpass_and_lowpass_match_reference(self, rng):
        ref = import_reference("ste_gan.utils.emg_utils")
        x = rng.normal(size=900)
        np.testing.assert_allclose(emg_dsp.bandpass_signal(x, 1000),
                                   ref.bandpass_signal(x, 1000), rtol=1e-8)
        np.testing.assert_allclose(emg_dsp.lowpass_after_bandpass(x, 1000),
                                   ref.lowpass_after_bandpass(x, 1000), rtol=1e-8)
        np.testing.assert_allclose(emg_dsp.average_by_points(x, 7),
                                   ref.average_by_points(x, 7), rtol=1e-9)
