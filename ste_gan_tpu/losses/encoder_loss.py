"""Perceptual losses through the (frozen) EMG encoder, plus phoneme-count
metrics.

Parity with the reference (ste_gan/losses/emg_encoder_loss.py): the
speech-unit loss is the mean pairwise euclidean distance between predicted
and target unit sequences over all (batch, time) positions (with PyTorch
``pairwise_distance``'s eps=1e-6 added to the difference), and the phoneme
loss is mean cross-entropy over all frames.

TPU-native design: instead of host-synced ``.item()`` counters (reference
EMGEncoderLossOutput properties, :27-53), :func:`phoneme_count_metrics`
returns integer *arrays* that stay on device and are summed with the rest of
the step's collectives.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ste_gan_tpu import constants as C

PAIRWISE_EPS = 1e-6


def speech_unit_distance(target: jnp.ndarray, pred: jnp.ndarray,
                         norm: float = 2.0) -> jnp.ndarray:
    """Mean p-norm distance between unit vectors over all (b, t)."""
    diff = target.astype(jnp.float32) - pred.astype(jnp.float32) + PAIRWISE_EPS
    if norm == 2.0:
        dists = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1))
    else:
        dists = jnp.sum(jnp.abs(diff) ** norm, axis=-1) ** (1.0 / norm)
    return jnp.mean(dists)


def phoneme_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over all frames; logits [B, T, P], targets [B, T] int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def phoneme_count_metrics(logits: jnp.ndarray, targets: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Device-resident counters for phoneme accuracy (incl./excl. silence)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets)
    silence = (targets == C.SILENCE_PHONEME_INDEX)
    return {
        "num_phones": jnp.asarray(targets.size, jnp.int32),
        "num_correct": jnp.sum(correct).astype(jnp.int32),
        "num_silence": jnp.sum(silence).astype(jnp.int32),
        "num_correct_no_silence": jnp.sum(correct & ~silence).astype(jnp.int32),
    }


def emg_encoder_loss(
    encoder_apply,
    emg_signal: jnp.ndarray,
    target_speech_units: jnp.ndarray,
    target_phonemes: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Runs the frozen encoder on (generated) EMG and returns
    (speech_unit_loss, phoneme_loss, metrics)
    (reference: ste_gan/losses/emg_encoder_loss.py:69-84).

    ``encoder_apply`` is a closure ``emg -> (su_pred, phoneme_logits)`` that
    already captures the frozen parameters.
    """
    su_pred, phoneme_logits = encoder_apply(emg_signal)
    su_loss = speech_unit_distance(target_speech_units, su_pred)
    ph_loss = phoneme_cross_entropy(phoneme_logits, target_phonemes)
    metrics = phoneme_count_metrics(phoneme_logits, target_phonemes)
    return su_loss, ph_loss, metrics
