"""Derive golden MFCC vectors from torchaudio's DOCUMENTED conventions.

Round-2 verdict: the JAX MFCC frontend (ste_gan_tpu/etl/audio_dsp.py) was
verified only against a repo-authored numpy oracle, so a shared misreading
of a torchaudio convention would pass silently. This script re-derives the
expected outputs of the reference's ``torchaudio.transforms.MFCC`` wrapper
(/root/reference/ste_gan/utils/audio_utils.py:112-147) INDEPENDENTLY, from
the documented definitions only, in deliberately different code shapes
(direct O(N^2) DFT sums, per-filter triangle loops, explicit DCT cosine
sums) for analytically tractable inputs, and freezes them into
``mfcc_golden.npz``.

Conventions implemented here, each from the torchaudio docs:
* torch.hann_window(512) (periodic):  w[n] = 0.5*(1 - cos(2*pi*n/N)).
* Spectrogram(center=False, onesided): frame t = x[t*hop : t*hop + n_fft],
  num_frames = 1 + (L - n_fft)//hop;  power=2.0 -> |X[k]|^2.
* The reference module reflect-pads by (win - hop)//2 = 176 before the
  transform (audio_utils.py:135-136).
* melscale_fbanks(n_freqs=257, f_min=0, f_max=sr/2, n_mels=80,
  mel_scale='htk', norm=None): triangles on the HTK mel scale
  m = 2595*log10(1 + f/700) with bin freqs linspace(0, sr//2, n_freqs).
* AmplitudeToDB('power', top_db=80): 10*log10(max(x, 1e-10)) clamped to
  >= global_max - 80 (ref_value=1 so db_multiplier=0).
* create_dct(25, 80, norm='ortho'): MFCC[k] = sum_n dB[n] *
  cos(pi/80*(n+0.5)*k) * sqrt(2/80), k=0 scaled by an extra 1/sqrt(2).

Inputs chosen so each stage is analytically checkable: DC (spectrum lives
in bins 0/1 only), a pure sine centred on mel filter 40's peak (mel energy
concentrated in neighbouring filters), a centred unit impulse (flat
spectrum per frame), and fixed-seed white noise (broadband coverage).

Run:  python tests/fixtures/derive_mfcc_goldens.py   (rewrites the .npz)
"""
from pathlib import Path

import numpy as np

SR = 16_000
N_FFT = 512
HOP = 160
N_MELS = 80
N_MFCC = 25
TOP_DB = 80.0
AMIN = 1e-10
REFLECT_PAD = (N_FFT - HOP) // 2  # 176


def hann_periodic(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def direct_power_spectrogram(x: np.ndarray) -> np.ndarray:
    """[n_frames, 257] one-sided power spectrum via the DFT definition."""
    w = hann_periodic(N_FFT)
    num_frames = 1 + (len(x) - N_FFT) // HOP
    n = np.arange(N_FFT)
    out = np.empty((num_frames, N_FFT // 2 + 1))
    for t in range(num_frames):
        frame = x[t * HOP: t * HOP + N_FFT] * w
        for k in range(N_FFT // 2 + 1):
            c = np.sum(frame * np.cos(2 * np.pi * k * n / N_FFT))
            s = -np.sum(frame * np.sin(2 * np.pi * k * n / N_FFT))
            out[t, k] = c * c + s * s
    return out


def mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)


def mel_htk_inv(m):
    return 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)


def triangle_filterbank() -> np.ndarray:
    """[257, 80] triangles, per-filter scalar loop (torchaudio
    melscale_fbanks docs, norm=None)."""
    bin_freqs = np.linspace(0, SR // 2, N_FFT // 2 + 1)
    mel_pts = np.linspace(mel_htk(0.0), mel_htk(SR / 2.0), N_MELS + 2)
    f_pts = mel_htk_inv(mel_pts)
    fb = np.zeros((len(bin_freqs), N_MELS))
    for m in range(N_MELS):
        f_lo, f_c, f_hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        for i, f in enumerate(bin_freqs):
            if f_lo < f <= f_c:
                fb[i, m] = (f - f_lo) / (f_c - f_lo)
            elif f_c < f < f_hi:
                fb[i, m] = (f_hi - f) / (f_hi - f_c)
            elif f == f_c:
                fb[i, m] = 1.0
    return fb


def amplitude_to_db(mel_power: np.ndarray) -> np.ndarray:
    db = 10.0 * np.log10(np.maximum(mel_power, AMIN))
    return np.maximum(db, db.max() - TOP_DB)


def dct_ortho_rows() -> np.ndarray:
    """[25, 80] explicit cosine sums (torchaudio create_dct, norm='ortho')."""
    mat = np.zeros((N_MFCC, N_MELS))
    for k in range(N_MFCC):
        scale = np.sqrt(1.0 / N_MELS) if k == 0 else np.sqrt(2.0 / N_MELS)
        for n in range(N_MELS):
            mat[k, n] = scale * np.cos(np.pi / N_MELS * (n + 0.5) * k)
    return mat


def expected_mfcc(audio: np.ndarray) -> np.ndarray:
    """Full reference-module pipeline -> [n_frames, 25] (time-major, the
    orientation from_audio_path returns; audio_utils.py:146)."""
    x = np.pad(audio.astype(np.float64), (REFLECT_PAD, REFLECT_PAD),
               mode="reflect")
    power = direct_power_spectrogram(x)
    mel = power @ triangle_filterbank()
    db = amplitude_to_db(mel)
    return db @ dct_ortho_rows().T


def filter_center_hz(m: int) -> float:
    """Peak frequency of mel filter ``m`` (0-based)."""
    mel_pts = np.linspace(mel_htk(0.0), mel_htk(SR / 2.0), N_MELS + 2)
    return float(mel_htk_inv(mel_pts[m + 1]))


def main() -> None:
    t = np.arange(4000)
    sine_hz = filter_center_hz(40)
    cases = {
        "dc": 0.5 * np.ones(4000),
        "impulse": np.eye(1, 4000, 2000).ravel(),
        "sine_mel40": 0.3 * np.sin(2 * np.pi * sine_hz * t / SR),
        "noise": np.random.default_rng(1234).normal(0.0, 0.1, 4000),
    }
    out = {}
    for name, audio in cases.items():
        out[f"in_{name}"] = audio.astype(np.float64)
        out[f"out_{name}"] = expected_mfcc(audio)
    out["sine_mel40_hz"] = np.float64(sine_hz)
    path = Path(__file__).parent / "mfcc_golden.npz"
    np.savez_compressed(path, **out)
    print(f"wrote {path} (sine at {sine_hz:.3f} Hz)")
    for name in cases:
        print(f"  {name}: out shape {out[f'out_{name}'].shape}, "
              f"range [{out[f'out_{name}'].min():.2f}, "
              f"{out[f'out_{name}'].max():.2f}]")


if __name__ == "__main__":
    main()
