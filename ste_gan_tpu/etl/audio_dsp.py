"""Audio frontend for the offline ETL: loading/normalisation, TextGrid
phoneme alignment, and a jit-compiled JAX MFCC extractor.

Parity with the reference (ste_gan/utils/audio_utils.py): RMS-peak volume
normalisation to 0.2, phoneme id sequences at the 50 Hz speech-unit rate
from forced-alignment TextGrids, audio trimming to whole speech-unit frames,
and the 25-coefficient MFCC frontend (16 kHz, 512-sample window, 160-sample
hop -> 100 Hz, 80 mels, reflect pre-padding).

The MFCC pipeline replicates torchaudio's ``transforms.MFCC`` semantics
(power mel spectrogram with HTK mel scale and slaney-free filterbank, power
-> dB with top_db=80, orthonormal DCT-II) as one jit-compiled XLA program —
the TPU-native replacement for the torch module the reference wraps.
"""
from __future__ import annotations

import math
import re
import string
from functools import partial
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu.constants import PHONEME_INVENTORY


# ---------------------------------------------------------------------------
# Loading / normalisation
# ---------------------------------------------------------------------------


def _frame_rms_centered(audio: np.ndarray, frame_length: int = 2048,
                        hop_length: int = 512) -> np.ndarray:
    """librosa.feature.rms semantics (center=True zero padding)."""
    pad = frame_length // 2
    x = np.pad(audio, (pad, pad))
    num_frames = 1 + (len(x) - frame_length) // hop_length
    idx = (np.arange(frame_length)[:, None]
           + hop_length * np.arange(num_frames)[None, :])
    return np.sqrt(np.mean(np.square(x[idx]), axis=0))


def normalize_volume(audio: np.ndarray, target_rms: float = 0.2) -> np.ndarray:
    """Scale so the max frame RMS hits ``target_rms``
    (reference audio_utils.py:25-33)."""
    max_rms = _frame_rms_centered(audio).max() + 0.01
    audio = audio * (target_rms / max_rms)
    max_val = np.abs(audio).max()
    if max_val > 1.0:
        audio = audio / max_val
    return audio


def read_audio_file(path: Path):
    """(audio float64, sample_rate). soundfile when available (flac + wav);
    scipy wav fallback otherwise."""
    try:
        import soundfile as sf

        # hasattr guards against stub modules installed by oracle loaders.
        audio, sr = sf.read(str(path))
        return np.asarray(audio, np.float64), int(sr)
    except (ImportError, AttributeError):
        import scipy.io.wavfile as wavfile

        sr, audio = wavfile.read(str(path))
        audio = np.asarray(audio)
        if audio.dtype.kind == "i":
            audio = audio.astype(np.float64) / np.iinfo(audio.dtype).max
        return audio.astype(np.float64), int(sr)


def write_audio_file(path: Path, audio: np.ndarray, sample_rate: int) -> Path:
    """Write mono audio. Without soundfile, flac targets are written as wav
    next to the requested name (the ETL readers try both extensions)."""
    path = Path(path)
    try:
        import soundfile as sf

        sf.write(str(path), np.asarray(audio), samplerate=sample_rate)
        return path
    except (ImportError, AttributeError):
        import scipy.io.wavfile as wavfile

        path = path.with_suffix(".wav")
        wavfile.write(str(path), sample_rate,
                      np.asarray(audio, np.float32))
        return path


def find_audio_file(path: Path) -> Path:
    """Resolve an audio artifact that may be .flac (soundfile present at
    write time) or .wav (fallback)."""
    path = Path(path)
    if path.exists():
        return path
    alt = path.with_suffix(".wav" if path.suffix == ".flac" else ".flac")
    if alt.exists():
        return alt
    raise FileNotFoundError(f"no audio file at {path} (or {alt.name})")


def load_audio(audio_file_path: Path, sampling_rate: int = 16_000,
               normalize: bool = True) -> np.ndarray:
    """Load mono audio (flac via soundfile; wav fallback via scipy)."""
    audio, sr = read_audio_file(find_audio_file(audio_file_path))
    if sr != sampling_rate:
        import scipy.signal

        audio = scipy.signal.resample_poly(audio, sampling_rate, sr)
    if audio.ndim > 1:
        audio = audio[:, 0]
    if normalize:
        audio = normalize_volume(audio)
    return audio


def cut_audio_to_soft_speech_match_unit_frame_rate(
        audio: np.ndarray, sample_rate: int = 16_000,
        speech_unit_frequency: int = 50) -> np.ndarray:
    """Trim to a whole number of speech-unit frames
    (reference audio_utils.py:91-108)."""
    downsample_rate = sample_rate // speech_unit_frequency
    num_units = len(audio) // downsample_rate
    return audio[: num_units * downsample_rate]


# ---------------------------------------------------------------------------
# TextGrid phoneme alignment (minimal parser; the textgrids pkg is absent)
# ---------------------------------------------------------------------------


_INTERVAL_RE = re.compile(
    r'intervals\s*\[\d+\]:\s*xmin\s*=\s*([\d.eE+-]+)\s*'
    r'xmax\s*=\s*([\d.eE+-]+)\s*text\s*=\s*"([^"]*)"', re.S)
_ITEM_RE = re.compile(r'item\s*\[\d+\]:(.*?)(?=item\s*\[\d+\]:|\Z)', re.S)
_NAME_RE = re.compile(r'name\s*=\s*"([^"]*)"')


def parse_textgrid_tier(path: Path, tier: str = "phones") -> List[Tuple[float, float, str]]:
    """Parse (xmin, xmax, text) intervals of one tier from a long-format
    TextGrid file."""
    text = Path(path).read_text(errors="replace")
    for item in _ITEM_RE.findall(text):
        name = _NAME_RE.search(item)
        if name and name.group(1) == tier:
            return [(float(a), float(b), t)
                    for a, b, t in _INTERVAL_RE.findall(item)]
    raise ValueError(f"tier '{tier}' not found in {path}")


def read_phonemes(textgrid_fname: Path, max_len: Optional[int] = None,
                  coeff: float = 50.0) -> np.ndarray:
    """Forced-alignment TextGrid -> 50 Hz phoneme-id sequence
    (reference audio_utils.py:64-87)."""
    intervals = parse_textgrid_tier(textgrid_fname, "phones")
    phone_ids = np.full(int(intervals[-1][1] * coeff) + 1, -1, dtype=np.int64)
    phone_ids[-1] = PHONEME_INVENTORY.index("sil")
    for xmin, xmax, phone in intervals:
        phone = phone.lower()
        if phone in ("", "sp", "spn"):
            phone = "sil"
        if phone and phone[-1] in string.digits:
            phone = phone[:-1]
        ph_id = PHONEME_INVENTORY.index(phone)
        phone_ids[int(xmin * coeff): int(xmax * coeff)] = ph_id
    assert (phone_ids >= 0).all(), "missing aligned phones"
    if max_len is not None:
        phone_ids = phone_ids[:max_len]
        assert phone_ids.shape[0] == max_len
    return phone_ids


# ---------------------------------------------------------------------------
# MFCC (pure JAX, jit-compiled)
# ---------------------------------------------------------------------------


def hz_to_mel_htk(freq):
    return 2595.0 * np.log10(1.0 + freq / 700.0)


def mel_to_hz_htk(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: Optional[float] = None) -> np.ndarray:
    """torchaudio.functional.melscale_fbanks(htk, norm=None) semantics:
    triangular filters on the HTK mel scale; returns [n_freqs, n_mels]."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def _dct_ortho(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_mels, n_mfcc] (torchaudio create_dct)."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)
    basis = np.cos(math.pi / n_mels * (n[:, None] + 0.5) * k[None, :])
    basis *= math.sqrt(2.0 / n_mels)
    basis[:, 0] *= 1.0 / math.sqrt(2.0)
    return basis.astype(np.float32)


@partial(jax.jit, static_argnames=("n_mfcc", "win_length", "hop_length",
                                   "sample_rate", "n_mels", "top_db"))
def mfcc_jax(audio: jnp.ndarray, n_mfcc: int = 25, win_length: int = 512,
             hop_length: int = 160, sample_rate: int = 16_000,
             n_mels: int = 80, top_db: float = 80.0) -> jnp.ndarray:
    """[T_audio] -> [n_frames, n_mfcc] at 100 Hz.

    Pipeline (torchaudio MFCC semantics, incl. the reference's reflect
    pre-padding of (win-hop)/2; ste_gan/utils/audio_utils.py:135-138):
    reflect pad -> framed Hann STFT (center=False) -> power spectrum ->
    HTK mel filterbank -> power-to-dB with per-signal top_db floor ->
    orthonormal DCT-II -> first n_mfcc coefficients.
    """
    padding = (win_length - hop_length) // 2
    audio = jnp.pad(audio.astype(jnp.float32), (padding, padding), mode="reflect")

    num_frames = 1 + (audio.shape[0] - win_length) // hop_length
    idx = (jnp.arange(win_length)[None, :]
           + hop_length * jnp.arange(num_frames)[:, None])
    frames = audio[idx]  # [n_frames, win]
    window = jnp.asarray(np.hanning(win_length + 1)[:-1], jnp.float32)
    spec = jnp.fft.rfft(frames * window, n=win_length, axis=-1)
    power = jnp.square(jnp.abs(spec))  # [n_frames, n_freqs]

    fbank = jnp.asarray(mel_filterbank(win_length // 2 + 1, n_mels, sample_rate))
    mel = power @ fbank  # [n_frames, n_mels]

    # AmplitudeToDB('power', top_db): 10*log10(max(x, amin)), clamped to
    # (max - top_db) over the whole signal.
    amin = 1e-10
    db = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    db = jnp.maximum(db, db.max() - top_db)

    dct = jnp.asarray(_dct_ortho(n_mfcc, n_mels))
    return db @ dct  # [n_frames, n_mfcc]


class MFCCsCalculator:
    """Drop-in analogue of the reference MFCCsCalculator
    (ste_gan/utils/audio_utils.py:112-147), jit-compiled."""

    def __init__(self, n_mfcc: int = 25, win_length: int = 512,
                 hop_length: int = 160, sample_rate: int = 16_000):
        self.n_mfcc = n_mfcc
        self.win_length = win_length
        self.hop_length = hop_length
        self.sample_rate = sample_rate

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        out = mfcc_jax(jnp.asarray(audio, jnp.float32), n_mfcc=self.n_mfcc,
                       win_length=self.win_length, hop_length=self.hop_length,
                       sample_rate=self.sample_rate)
        return np.asarray(out)

    def from_audio_path(self, audio_path: Path) -> np.ndarray:
        audio = load_audio(audio_path)
        audio = cut_audio_to_soft_speech_match_unit_frame_rate(audio)
        return self(audio)


def align_speech_units_and_mfccs(speech_units: np.ndarray, mfccs: np.ndarray
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Trim so MFCC frames are exactly 2x the speech-unit frames
    (reference audio_utils.py:56-61)."""
    if len(mfccs) % 2 == 1:
        mfccs = mfccs[:-1]
    speech_units = speech_units[: len(mfccs) // 2]
    mfccs = mfccs[: 2 * len(speech_units)]
    return speech_units, mfccs
