"""Offline audio cleaning for the Gaddy & Klein corpus.

The TPU-native equivalent of the reference's cleaning script
(scripts/clean_audio.py): per session directory, estimate a noise profile
from the silence clip ``0_audio.flac``, denoise every ``*_audio.flac`` and
write ``*_audio_clean.flac``, with RMS volume normalisation.

Denoising backends, best available first (host-side; both optional in this
image):
1. noisereduce + speechbrain MetricGAN+ (the reference's stack), when
   importable;
2. a built-in scipy spectral-gating fallback (same noise-profile idea:
   per-band gate thresholds from the silence clip).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ste_gan_tpu.etl.audio_dsp import (
    find_audio_file, normalize_volume, read_audio_file, write_audio_file)


def spectral_gate_denoise(audio: np.ndarray, noise_clip: np.ndarray,
                          sample_rate: int = 16_000, n_fft: int = 512,
                          hop: int = 128, gain_floor: float = 0.1,
                          threshold_scale: float = 1.5) -> np.ndarray:
    """Simple STFT spectral gating: bands whose magnitude falls below
    ``threshold_scale`` x the noise profile are attenuated to ``gain_floor``."""
    import scipy.signal

    window = np.hanning(n_fft)
    _, _, noise_spec = scipy.signal.stft(noise_clip, fs=sample_rate,
                                         window=window, nperseg=n_fft,
                                         noverlap=n_fft - hop)
    noise_profile = np.abs(noise_spec).mean(axis=1, keepdims=True)

    _, _, spec = scipy.signal.stft(audio, fs=sample_rate, window=window,
                                   nperseg=n_fft, noverlap=n_fft - hop)
    magnitude = np.abs(spec)
    gate = magnitude > threshold_scale * noise_profile
    gain = np.where(gate, 1.0, gain_floor)
    # Smooth the gain over time to avoid musical noise.
    kernel = np.ones(5) / 5.0
    gain = np.apply_along_axis(
        lambda g: np.convolve(g, kernel, mode="same"), 1, gain)
    _, cleaned = scipy.signal.istft(spec * gain, fs=sample_rate, window=window,
                                    nperseg=n_fft, noverlap=n_fft - hop)
    return cleaned[: len(audio)]


def denoise(audio: np.ndarray, noise_clip: np.ndarray,
            sample_rate: int = 16_000) -> np.ndarray:
    try:
        import noisereduce

        try:
            # noisereduce >= 2.x signature.
            return noisereduce.reduce_noise(y=audio, y_noise=noise_clip,
                                            sr=sample_rate)
        except TypeError:
            # 1.x signature — the version the reference used
            # (reference scripts/clean_audio.py: audio_clip/noise_clip).
            return noisereduce.reduce_noise(audio_clip=audio,
                                            noise_clip=noise_clip)
    except (ImportError, AttributeError):
        return spectral_gate_denoise(audio, noise_clip, sample_rate)
    except TypeError as exc:
        # Both noisereduce signatures rejected the call — a genuine input
        # error, not a missing package; say so before falling back.
        print(f"noisereduce rejected the call ({exc}); using the built-in "
              "spectral-gate fallback", file=sys.stderr)
        return spectral_gate_denoise(audio, noise_clip, sample_rate)


#: Lazily-loaded MetricGAN+ enhancer, one instance per process — the
#: reference likewise loads it once before its file loop, not per file.
_ENHANCER = None


def maybe_enhance(audio: np.ndarray, sample_rate: int = 16_000) -> np.ndarray:
    """speechbrain MetricGAN+ enhancement when available (reference
    clean_audio.py:74-97); identity otherwise."""
    global _ENHANCER
    try:
        import torch
        from speechbrain.pretrained import SpectralMaskEnhancement

        if _ENHANCER is None:
            _ENHANCER = SpectralMaskEnhancement.from_hparams(
                source="speechbrain/metricgan-plus-voicebank",
                savedir="pretrained_models/metricgan-plus-voicebank")
        noisy = torch.from_numpy(audio[None]).float()
        enhanced = _ENHANCER.enhance_batch(noisy, lengths=torch.tensor([1.0]))
        return enhanced.squeeze(0).numpy()
    except (ImportError, AttributeError):
        return audio


def clean_directory(session_dir: Path, sample_rate: int = 16_000,
                    overwrite: bool = False) -> int:
    try:
        noise_path = find_audio_file(session_dir / "0_audio.flac")
    except FileNotFoundError:
        print(f"skipping {session_dir}: no 0_audio noise profile")
        return 0
    noise_clip, _ = read_audio_file(noise_path)

    count = 0
    audio_paths = sorted(list(session_dir.glob("*_audio.flac"))
                         + list(session_dir.glob("*_audio.wav")))
    for audio_path in audio_paths:
        if audio_path.stem.endswith("_clean"):
            continue
        out_path = audio_path.with_name(
            audio_path.stem + "_clean" + audio_path.suffix)
        if out_path.exists() and not overwrite:
            continue
        audio, sr = read_audio_file(audio_path)
        assert sr == sample_rate
        cleaned = denoise(audio, noise_clip, sample_rate)
        cleaned = maybe_enhance(cleaned, sample_rate)
        cleaned = normalize_volume(cleaned)
        write_audio_file(out_path, cleaned, sample_rate)
        count += 1
    return count


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--source_data_dir", type=Path,
                        default=Path("raw_data/emg_data/"))
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()

    total = 0
    for sub in ("silent_parallel_data", "voiced_parallel_data",
                "nonparallel_data"):
        base = Path(args.source_data_dir) / sub
        if not base.exists():
            continue
        for session_dir in sorted(base.iterdir()):
            if session_dir.is_dir():
                total += clean_directory(session_dir, overwrite=args.overwrite)
    print(f"cleaned {total} audio files")


if __name__ == "__main__":
    main()
