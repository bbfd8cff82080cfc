"""EMG signal processing for the offline ETL (host-side, scipy/numpy).

Parity with the reference's preprocessing chain
(ste_gan/utils/emg_utils.py): notch filtering of 60 Hz mains + 7 harmonics
and 3rd-order Butterworth drift removal at the source rate (1 kHz), linear
resampling to 800 Hz, framewise time-domain features (mean/RMS of the
low-pass part, RMS/mean of the rectified high-frequency residual, zero
crossing rate) plus a Hilbert-envelope feature at 100 Hz.

These run once per corpus on the host; the train-time differentiable TD
features live in :mod:`ste_gan_tpu.losses.td_loss` as pure jnp.
"""
from __future__ import annotations

import numpy as np
import scipy.signal


def subsample(signal: np.ndarray, new_freq: float, old_freq: float) -> np.ndarray:
    """Linear-interpolation resampling (reference emg_utils.py:25-29)."""
    times = np.arange(len(signal)) / old_freq
    sample_times = np.arange(0, times[-1], 1 / new_freq)
    return np.interp(sample_times, times, signal)


def apply_to_all(function, signal_array: np.ndarray, *args, **kwargs) -> np.ndarray:
    return np.stack([function(signal_array[:, i], *args, **kwargs)
                     for i in range(signal_array.shape[1])], axis=1)


def notch(signal: np.ndarray, freq: float, sample_frequency: float) -> np.ndarray:
    b, a = scipy.signal.iirnotch(freq, 30, sample_frequency)
    return scipy.signal.filtfilt(b, a, signal)


def notch_harmonics(signal: np.ndarray, freq: float, sample_frequency: float) -> np.ndarray:
    """Notch out a frequency and its first 7 harmonics
    (reference emg_utils.py:61-64)."""
    for harmonic in range(1, 8):
        signal = notch(signal, freq * harmonic, sample_frequency)
    return signal


def remove_drift(signal: np.ndarray, fs: float) -> np.ndarray:
    b, a = scipy.signal.butter(3, 2, "highpass", fs=fs)
    return scipy.signal.filtfilt(b, a, signal)


def bandpass_signal(signal: np.ndarray, fs: float) -> np.ndarray:
    """2-400 Hz band-pass (reference emg_utils.py:47-49)."""
    b, a = scipy.signal.butter(2, (2, 400), "bandpass", fs=fs)
    return scipy.signal.filtfilt(b, a, signal)


def lowpass_after_bandpass(signal: np.ndarray, fs: float) -> np.ndarray:
    """10 Hz low-pass (reference emg_utils.py:52-54)."""
    b, a = scipy.signal.butter(2, 10, "lowpass", fs=fs)
    return scipy.signal.filtfilt(b, a, signal)


def average_by_points(signal: np.ndarray, points: int) -> np.ndarray:
    """Centered moving average (reference emg_utils.py:38-41)."""
    f = np.ones(points) / float(points)
    return np.convolve(signal, f, mode="same")


def double_average(x: np.ndarray) -> np.ndarray:
    assert x.ndim == 1
    f = np.ones(9) / 9.0
    return np.convolve(np.convolve(x, f, mode="same"), f, mode="same")


def pre_process_emg_signal(
    raw_emg: np.ndarray,
    raw_emg_before: np.ndarray,
    raw_emg_after: np.ndarray,
    emg_raw_target_sample_rate: int = 800,
    emg_source_sample_rate: int = 1000,
) -> np.ndarray:
    """Filter with neighbouring-utterance context, then resample
    (reference emg_utils.py:142-172): the previous/next utterances are
    concatenated before filtering so filter edge effects fall outside the
    utterance, then stripped before resampling to the target rate."""
    x = np.concatenate([raw_emg_before, raw_emg, raw_emg_after], 0)
    x = apply_to_all(notch_harmonics, x, 60, emg_source_sample_rate)
    x = apply_to_all(remove_drift, x, emg_source_sample_rate)
    x = x[raw_emg_before.shape[0]: x.shape[0] - raw_emg_after.shape[0], :]
    return apply_to_all(subsample, x, emg_raw_target_sample_rate,
                        emg_source_sample_rate)


# ---------------------------------------------------------------------------
# Framewise features
# ---------------------------------------------------------------------------


def _frame(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """[T] -> [frame_length, num_frames] sliding windows (librosa.util.frame
    semantics: no padding, trailing remainder dropped)."""
    num_frames = 1 + (len(x) - frame_length) // hop_length
    idx = (np.arange(frame_length)[:, None]
           + hop_length * np.arange(num_frames)[None, :])
    return x[idx]


def _frame_rms(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    frames = _frame(x, frame_length, hop_length)
    return np.sqrt(np.mean(np.square(frames), axis=0))


def _frame_zcr(x: np.ndarray, frame_length: int, hop_length: int,
               threshold: float = 1e-10) -> np.ndarray:
    """Zero-crossing rate per frame (librosa semantics: values within
    +-threshold snap to zero; crossings counted via signbit changes with the
    first sample of each frame compared against its predecessor-in-frame)."""
    frames = _frame(x, frame_length, hop_length).copy()
    frames[np.abs(frames) <= threshold] = 0
    sign = ~np.signbit(frames)
    crossings = np.zeros_like(frames, dtype=bool)
    crossings[1:] = sign[1:] != sign[:-1]
    return crossings.mean(axis=0)


def calculate_hilbert_envelope(x: np.ndarray) -> np.ndarray:
    return np.abs(scipy.signal.hilbert(x))


def calculate_hilbert_transform_feats(
    x: np.ndarray,
    input_emg_sample_rate: int = 800,
    target_feat_sample_rate: int = 100,
    lowpass_filter_hz: int = 20,
    max_num_frames: int = -1,
) -> np.ndarray:
    """Hilbert envelope -> 20 Hz low-pass -> downsample to 100 Hz
    (reference emg_utils.py:114-139; Sharma et al. features)."""
    assert x.ndim == 1
    envelope = calculate_hilbert_envelope(x)
    b, a = scipy.signal.butter(4, lowpass_filter_hz, fs=input_emg_sample_rate,
                               btype="low")
    envelope = scipy.signal.filtfilt(b, a, envelope)
    factor = input_emg_sample_rate / target_feat_sample_rate
    num_expected = int(len(envelope) / factor)
    envelope = scipy.signal.resample(envelope, num_expected)
    if max_num_frames >= 0:
        envelope = envelope[:max_num_frames]
    return envelope


def get_emg_features(
    emg_data_input: np.ndarray,
    frame_length_samples: int = 26,
    hop_length_samples: int = 8,
    add_hilbert: bool = True,
    emg_sr: int = 800,
    pad: bool = False,
    subtract_mean: bool = True,
) -> np.ndarray:
    """Per-channel framewise TD features at ~100 Hz
    (reference emg_utils.py:176-230): [num_frames, num_channels, 5 or 6]
    stacking mean(low), rms(low), rms(rect high), zcr(high), mean(rect high)
    [, hilbert envelope]."""
    if pad:
        padding = (frame_length_samples - hop_length_samples) // 2
        emg_data = np.pad(emg_data_input, ((padding, padding), (0, 0)), "reflect")
    else:
        emg_data = emg_data_input
    xs = emg_data - emg_data.mean(axis=0, keepdims=True) if subtract_mean else emg_data

    channels = []
    for i in range(emg_data.shape[1]):
        x = xs[:, i]
        w = double_average(x)
        p = x - w
        r = np.abs(p)

        w_h = _frame(w, frame_length_samples, hop_length_samples).mean(axis=0)
        p_w = _frame_rms(w, frame_length_samples, hop_length_samples)
        p_r = _frame_rms(r, frame_length_samples, hop_length_samples)
        z_p = _frame_zcr(p, frame_length_samples, hop_length_samples)
        r_h = _frame(r, frame_length_samples, hop_length_samples).mean(axis=0)

        feats = [w_h, p_w, p_r, z_p, r_h]
        if add_hilbert:
            feats.append(calculate_hilbert_transform_feats(
                emg_data_input[:, i], max_num_frames=w_h.shape[0],
                input_emg_sample_rate=emg_sr))
        channels.append(np.stack(feats, axis=1))

    return np.stack(channels, axis=1).astype(np.float32)


def cut_emg_to_hubert_units(emg: np.ndarray, num_units: int,
                            emg_sr: int = 800, hubert_sr: int = 50) -> np.ndarray:
    expected = num_units * (emg_sr // hubert_sr)
    assert expected <= len(emg)
    return emg[:expected]
