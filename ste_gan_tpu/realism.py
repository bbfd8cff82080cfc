"""Distribution-level realism metrics for generated EMG.

The training objectives are all *paired*: every loss the GAN trainer
optimises (multi-TD, speech-unit, phoneme, feature-matching — reference
ste_gan/train.py:189-264) compares a generated chunk against its own
ground-truth counterpart. None of them measures whether the *population*
of generated signals is distributed like real EMG — which is exactly what
the adversarial pathway exists to enforce. This module provides that
missing measurement, deliberately built from quantities NO training loss
touches directly:

* **FED — Fréchet Encoder Distance.** Gaussian Fréchet distance between
  frozen-EMG-encoder embedding distributions of real vs generated EMG.
  Embeddings are the encoder's pre-head transformer activations
  (EMGEncoderTransformer.embed): the SU/phoneme losses only ever see the
  ``w_out``/``w_aux`` linear projections of this space, never the space
  itself — the FID analogue for EMG, computed on held-out utterances.
* **TD-feature Wasserstein.** 1-D Wasserstein-1 distances between the
  pooled (unpaired) distributions of the four framed time-domain features
  per channel. The TD loss minimises the paired L1 on training chunks;
  this asks whether the feature *distributions* match on held-out data.
* **LSD — log-spectral distance.** Mean absolute dB difference between
  the average per-channel Welch power spectra of real vs generated EMG.
  No training term constrains the spectrum (the waveform loss defaults
  off, and TD features only see sub-band amplitudes), so spectral texture
  is where adversarial training should show up if it matters.

Driven by ``python -m ste_gan_tpu.evaluate gan --realism`` and by the
adversarial-ablation study (benchmarks/adversarial_ablation.py) that
answers VERDICT r3 #1: are the discriminators load-bearing?
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ste_gan_tpu import constants as C
from ste_gan_tpu.losses.td_loss import time_domain_features

#: Feature names of the TD stack, in time_domain_features' channel order.
TD_FEATURE_NAMES = ("low_mean", "low_power", "high_power", "high_rect_mean")


def _round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


# ---------------------------------------------------------------------------
# Fréchet distance over frozen-encoder embeddings
# ---------------------------------------------------------------------------


def gaussian_stats(frames: np.ndarray):
    """Mean vector and covariance of [N, D] frames."""
    frames = np.asarray(frames, np.float64)
    mu = frames.mean(axis=0)
    cov = np.cov(frames, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1: np.ndarray, cov1: np.ndarray,
                     mu2: np.ndarray, cov2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (the FID formula):
    ``|mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrtm(C1 C2))``, with the standard
    epsilon regularisation when the product is near-singular."""
    from scipy import linalg

    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(cov1 @ cov2)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def frechet_from_frames(real_frames: np.ndarray,
                        fake_frames: np.ndarray) -> float:
    mu_r, cov_r = gaussian_stats(real_frames)
    mu_f, cov_f = gaussian_stats(fake_frames)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)


# ---------------------------------------------------------------------------
# Pooled TD-feature Wasserstein distances
# ---------------------------------------------------------------------------


def pooled_td_features(emg_list: Sequence[np.ndarray], window: int = 80,
                       stride: int = 16) -> np.ndarray:
    """Concatenate framed TD features of every utterance: [F_total, C, 4].

    Uses the same feature definitions as the training TD loss
    (losses/td_loss.py::time_domain_features) at the coarsest window
    config, but pooled across frames and utterances — a distribution,
    not a paired target."""
    feats = []
    fn = jax.jit(lambda x: time_domain_features(x, window, stride),
                 static_argnums=())
    for emg in emg_list:
        f = fn(jnp.asarray(emg, jnp.float32)[None])  # [1, F, C, 4]
        feats.append(np.asarray(f[0]))
    return np.concatenate(feats, axis=0)


def wasserstein1(a: np.ndarray, b: np.ndarray,
                 num_quantiles: int = 256) -> float:
    """1-D Wasserstein-1 distance via quantile functions."""
    q = (np.arange(num_quantiles) + 0.5) / num_quantiles
    return float(np.mean(np.abs(np.quantile(np.asarray(a, np.float64), q)
                                - np.quantile(np.asarray(b, np.float64), q))))


def td_wasserstein_report(real_feats: np.ndarray,
                          fake_feats: np.ndarray) -> Dict:
    """Per-feature (averaged over channels) and overall W1 distances
    between pooled TD-feature distributions [F, C, 4]."""
    num_channels = real_feats.shape[1]
    per_feature = {}
    for k, name in enumerate(TD_FEATURE_NAMES):
        dists = [wasserstein1(real_feats[:, c, k], fake_feats[:, c, k])
                 for c in range(num_channels)]
        per_feature[name] = float(np.mean(dists))
    per_feature["mean"] = float(np.mean(list(per_feature.values())))
    return per_feature


# ---------------------------------------------------------------------------
# Log-spectral distance
# ---------------------------------------------------------------------------


def average_psd(emg_list: Sequence[np.ndarray], fs: int = C.EMG_SAMPLE_RATE,
                nperseg: int = 256) -> np.ndarray:
    """Length-weighted average Welch PSD per channel: [nperseg//2+1, C]."""
    from scipy import signal

    total = None
    weight = 0.0
    for emg in emg_list:
        emg = np.asarray(emg, np.float64)
        if len(emg) < nperseg:
            continue
        _, psd = signal.welch(emg, fs=fs, nperseg=nperseg, axis=0)
        w = float(len(emg))
        total = psd * w if total is None else total + psd * w
        weight += w
    if total is None:
        raise ValueError(f"no utterance reached nperseg={nperseg} samples")
    return total / weight


def log_spectral_distance(real_psd: np.ndarray, fake_psd: np.ndarray,
                          floor: float = 1e-12) -> Dict:
    """Mean |dB| difference between average PSDs, per channel + overall."""
    r = 10.0 * np.log10(np.maximum(np.asarray(real_psd), floor))
    f = 10.0 * np.log10(np.maximum(np.asarray(fake_psd), floor))
    per_channel = np.mean(np.abs(r - f), axis=0)
    return {"per_channel_db": [round(float(v), 4) for v in per_channel],
            "mean_db": float(np.mean(per_channel))}


# ---------------------------------------------------------------------------
# Per-utterance statistics + paired utterance bootstrap (VERDICT r4 #1:
# the load-bearing FED/LSD deltas need error bars, not point estimates).
# ---------------------------------------------------------------------------


def embedding_moment_stats(embed_fn: Callable, emg_list: Sequence[np.ndarray],
                           bucket_frames: int = 64,
                           hop: int = C.HOPSIZE) -> List[tuple]:
    """Per-utterance sufficient statistics of the frozen-encoder frame
    embeddings: ``[(n_i, sum_i [D], scatter_i [D, D]), ...]``. Any subset's
    Gaussian (mu, cov) — hence its Fréchet distance — aggregates from
    these in O(D^2) per utterance, which is what makes an utterance-level
    bootstrap of FED tractable (re-embedding per resample would not be)."""
    stats = []
    for emg in emg_list:
        emg = np.asarray(emg, np.float32)
        frames = len(emg) // hop
        if frames == 0:
            continue
        pad_frames = _round_up(frames, bucket_frames)
        padded = np.zeros((1, pad_frames * hop, emg.shape[1]), np.float32)
        padded[0, : frames * hop] = emg[: frames * hop]
        emb = np.asarray(embed_fn(jnp.asarray(padded))[0, :frames], np.float64)
        stats.append((emb.shape[0], emb.sum(axis=0), emb.T @ emb))
    return stats


def _gaussian_from_moments(stats: Sequence[tuple],
                           idx: Optional[np.ndarray] = None):
    """(mu, cov) of the pooled frames of the selected utterances (all when
    ``idx`` is None). Unbiased covariance, matching ``np.cov``."""
    chosen = stats if idx is None else [stats[i] for i in idx]
    n = sum(s[0] for s in chosen)
    total = np.sum([s[1] for s in chosen], axis=0)
    scatter = np.sum([s[2] for s in chosen], axis=0)
    mu = total / n
    cov = (scatter - n * np.outer(mu, mu)) / (n - 1)
    return mu, cov


def fed_from_moments(stats_real: Sequence[tuple], stats_fake: Sequence[tuple],
                     idx: Optional[np.ndarray] = None) -> float:
    mu_r, cov_r = _gaussian_from_moments(stats_real, idx)
    mu_f, cov_f = _gaussian_from_moments(stats_fake, idx)
    return frechet_distance(mu_r, cov_r, mu_f, cov_f)


def per_utterance_psds(emg_list: Sequence[np.ndarray],
                       fs: int = C.EMG_SAMPLE_RATE, nperseg: int = 256):
    """Per-utterance Welch PSDs + length weights: ([U, F, C], [U]). The
    weighted average over any utterance subset equals ``average_psd`` of
    that subset."""
    from scipy import signal

    psds, weights = [], []
    for emg in emg_list:
        emg = np.asarray(emg, np.float64)
        if len(emg) < nperseg:
            continue
        _, psd = signal.welch(emg, fs=fs, nperseg=nperseg, axis=0)
        psds.append(psd)
        weights.append(float(len(emg)))
    return np.stack(psds), np.asarray(weights)


def lsd_from_psds(real_psds, fake_psds, weights,
                  idx: Optional[np.ndarray] = None) -> float:
    """Overall LSD (mean |dB|) between length-weighted average PSDs of the
    selected utterances."""
    if idx is None:
        idx = np.arange(len(weights))
    w = weights[idx][:, None, None]
    real = (real_psds[idx] * w).sum(axis=0) / w.sum()
    fake = (fake_psds[idx] * w).sum(axis=0) / w.sum()
    return log_spectral_distance(real, fake)["mean_db"]


def bootstrap_paired_realism_delta(
    real_moments: Sequence[tuple],
    fake_a_moments: Sequence[tuple],
    fake_b_moments: Sequence[tuple],
    real_psds: np.ndarray,
    fake_a_psds: np.ndarray,
    fake_b_psds: np.ndarray,
    psd_weights: np.ndarray,
    n_boot: int = 200,
    seed: int = 0,
) -> Dict:
    """Paired utterance-level bootstrap of the FED and LSD deltas between
    two systems A and B scored on the SAME held-out utterances.

    Each resample draws utterance indices with replacement and applies
    them to real, A, and B simultaneously (pairing removes the shared
    utterance-sampling variance from the delta), then recomputes
    ``FED_A - FED_B`` and ``LSD_A - LSD_B`` from the per-utterance
    sufficient statistics. Returns point estimates, percentile CIs, and
    the fraction of resamples favouring A (delta < 0)."""
    num = len(real_moments)
    assert len(fake_a_moments) == num and len(fake_b_moments) == num
    assert len(psd_weights) == num, "PSD stats must align with moments"
    rng = np.random.default_rng(seed)
    fed_deltas = np.empty(n_boot)
    lsd_deltas = np.empty(n_boot)
    for i in range(n_boot):
        idx = rng.integers(0, num, size=num)
        fed_deltas[i] = (fed_from_moments(real_moments, fake_a_moments, idx)
                         - fed_from_moments(real_moments, fake_b_moments, idx))
        lsd_deltas[i] = (lsd_from_psds(real_psds, fake_a_psds, psd_weights, idx)
                         - lsd_from_psds(real_psds, fake_b_psds, psd_weights,
                                         idx))

    def summary(point, deltas):
        lo, hi = np.percentile(deltas, [2.5, 97.5])
        return {"delta": round(float(point), 4),
                "boot_mean": round(float(deltas.mean()), 4),
                "ci95": [round(float(lo), 4), round(float(hi), 4)],
                "frac_a_better": round(float((deltas < 0).mean()), 4)}

    return {
        "n_utterances": num,
        "n_boot": n_boot,
        "fed": summary(fed_from_moments(real_moments, fake_a_moments)
                       - fed_from_moments(real_moments, fake_b_moments),
                       fed_deltas),
        "lsd_db": summary(
            lsd_from_psds(real_psds, fake_a_psds, psd_weights)
            - lsd_from_psds(real_psds, fake_b_psds, psd_weights),
            lsd_deltas),
    }


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def encoder_frame_embeddings(embed_fn: Callable, emg_list: Sequence[np.ndarray],
                             bucket_frames: int = 64,
                             hop: int = C.HOPSIZE) -> np.ndarray:
    """Valid 50 Hz frame embeddings of every utterance, concatenated:
    [N_frames, model_size]. ``embed_fn([1, T, C]) -> [1, T/hop, D]``;
    utterances are zero-padded to bucket multiples (a tiny jit cache) and
    only the valid frames are kept."""
    out = []
    for emg in emg_list:
        emg = np.asarray(emg, np.float32)
        frames = len(emg) // hop
        if frames == 0:
            continue
        pad_frames = _round_up(frames, bucket_frames)
        padded = np.zeros((1, pad_frames * hop, emg.shape[1]), np.float32)
        padded[0, : frames * hop] = emg[: frames * hop]
        emb = embed_fn(jnp.asarray(padded))
        out.append(np.asarray(emb[0, :frames]))
    return np.concatenate(out, axis=0)


def realism_from_signals(real_list: Sequence[np.ndarray],
                         fake_list: Sequence[np.ndarray],
                         embed_fn: Optional[Callable] = None,
                         bucket_frames: int = 64) -> Dict:
    """All three metric families between two sets of EMG signals.

    ``embed_fn`` (optional) computes frozen-encoder embeddings; without it
    the FED entry is omitted (TD/LSD remain — they need no model)."""
    report: Dict = {
        "num_real": len(real_list), "num_generated": len(fake_list),
        "td_wasserstein": td_wasserstein_report(
            pooled_td_features(real_list), pooled_td_features(fake_list)),
        "log_spectral_distance": log_spectral_distance(
            average_psd(real_list), average_psd(fake_list)),
    }
    if embed_fn is not None:
        report["fed"] = frechet_from_frames(
            encoder_frame_embeddings(embed_fn, real_list, bucket_frames),
            encoder_frame_embeddings(embed_fn, fake_list, bucket_frames))
    return report


def synthesize_real_fake_pairs(cfg, gen_params, dataset,
                               bucket_frames: int = 64,
                               max_utterances: Optional[int] = None,
                               ) -> tuple:
    """Run every utterance of ``dataset`` through the production inference
    path; return aligned ``(real_list, fake_list)`` trimmed to equal
    per-utterance lengths (iteration order = dataset order, so two
    systems' lists pair up utterance-by-utterance)."""
    from ste_gan_tpu.infer import EMGSynthesizer

    synth = EMGSynthesizer.from_config(cfg, gen_params, bucket=bucket_frames)
    feature_key = cfg.model.speech_feature_type
    real_list: List[np.ndarray] = []
    fake_list: List[np.ndarray] = []
    n = len(dataset) if max_utterances is None else min(len(dataset),
                                                        max_utterances)
    for idx in range(n):
        sample = dataset[idx]
        feats = np.asarray(sample[feature_key])
        fake = synth.synthesize(feats,
                                int(sample[C.DataType.SESSION_INDEX]),
                                int(sample[C.DataType.SPEAKING_MODE_INDEX]))
        real = np.asarray(sample[C.DataType.REAL_EMG], np.float32)
        # Compare equal-length signals (the generated track is exactly
        # upsample*frames long; real can be a few samples longer).
        t = min(len(real), len(fake))
        real_list.append(real[:t])
        fake_list.append(np.asarray(fake[:t], np.float32))
    return real_list, fake_list


def realism_report(cfg, models, gen_params, encoder_variables, dataset,
                   bucket_frames: int = 64,
                   max_utterances: Optional[int] = None) -> Dict:
    """Synthesize every utterance of ``dataset`` through the production
    inference path and score generated vs real EMG with the full metric
    family (evaluate.py ``gan --realism``)."""
    real_list, fake_list = synthesize_real_fake_pairs(
        cfg, gen_params, dataset, bucket_frames=bucket_frames,
        max_utterances=max_utterances)
    embed_fn = jax.jit(lambda emg: models.encoder.apply(
        encoder_variables, emg, method="embed"))
    report = realism_from_signals(real_list, fake_list, embed_fn=embed_fn,
                                  bucket_frames=bucket_frames)
    report["num_utterances"] = len(real_list)
    return report
