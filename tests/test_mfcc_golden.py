"""MFCC frontend vs committed convention-derived golden vectors.

The fixtures in ``tests/fixtures/mfcc_golden.npz`` were produced by
``derive_mfcc_goldens.py`` straight from torchaudio's documented MFCC
conventions (direct DFT sums, explicit triangle filters, explicit DCT-II)
— independent of the repo's own jit pipeline — so a convention mismatch in
``etl/audio_dsp.py`` (pad mode, dB floor, DCT norm, mel scale) fails here
even though the self-authored oracle tests would pass (VERDICT r2 #4).
"""
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu.etl.audio_dsp import MFCCsCalculator, mel_filterbank

FIXTURE = Path(__file__).parent / "fixtures" / "mfcc_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def calc():
    return MFCCsCalculator()


@pytest.mark.parametrize("name", ["dc", "impulse", "sine_mel40", "noise"])
def test_matches_convention_derived_golden(golden, calc, name):
    got = calc(golden[f"in_{name}"])
    want = golden[f"out_{name}"]
    assert got.shape == want.shape
    # f32 pipeline vs f64 derivation; values are dB-scale (|x| up to ~600).
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-3)


def test_dc_frames_identical(golden, calc):
    """A constant signal is shift-invariant: every MFCC frame must be
    identical (also catches framing/padding off-by-ones)."""
    out = calc(golden["in_dc"])
    np.testing.assert_allclose(out, np.broadcast_to(out[:1], out.shape),
                               rtol=0, atol=1e-4)


def test_sine_energy_concentrates_on_filter_40(golden):
    """A sine at mel filter 40's peak frequency must put its mel energy
    into filters 39-41 (triangles overlap by construction)."""
    sine = golden["in_sine_mel40"]
    fb = mel_filterbank(257, 80, 16_000)
    window = np.hanning(513)[:-1]
    frame = sine[:512] * window
    power = np.abs(np.fft.rfft(frame)) ** 2
    mel = power @ fb
    top = np.argsort(mel)[::-1][:3]
    assert set(top) <= {39, 40, 41}, top
    assert mel[top].sum() / mel.sum() > 0.98


def test_top_db_floor_is_global(golden, calc):
    """AmplitudeToDB(top_db=80) clamps at global max - 80: an impulse
    signal's near-silent frames must bottom out exactly 80 dB below the
    loudest mel bin, which caps the dynamic range of the C0 row."""
    out = calc(golden["in_impulse"])
    want = golden["out_impulse"]
    np.testing.assert_allclose(out[:, 0], want[:, 0], rtol=2e-4, atol=5e-3)
    # C0 = sum(dB)/sqrt(80); floor at max-80 bounds it from below.
    db_max = want[:, 0].max() * np.sqrt(80) / 80  # mean dB of loudest frame
    assert out[:, 0].min() * np.sqrt(80) / 80 >= db_max - 80.0 - 1e-3
