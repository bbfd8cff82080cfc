"""Adversarial (LS-GAN) and feature-matching losses over discriminator
feature-map pytrees.

Parity with the reference train loop (ste_gan/train.py:189-264): MSE-to-0 on
fake logits + MSE-to-1 on real logits summed over all sub-discriminators for
the discriminator; MSE-to-1 on fake logits for the generator; L1 between all
non-logit feature maps of fake vs (gradient-stopped) real, summed, for
feature matching. Each loss is a pure function over the list-of-lists fmap
structure produced by :class:`DiscriminatorEnsemble`.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

Fmaps = List[List[jnp.ndarray]]


def _mse_to(x: jnp.ndarray, target: float) -> jnp.ndarray:
    return jnp.mean(jnp.square(x.astype(jnp.float32) - target))


def discriminator_loss(fmaps_fake: Fmaps, fmaps_real: Fmaps) -> jnp.ndarray:
    """Sum over sub-discriminators of MSE(fake->0) + MSE(real->1)
    (reference: ste_gan/train.py:192-196)."""
    loss = 0.0
    for fmap in fmaps_fake:
        loss = loss + _mse_to(fmap[-1], 0.0)
    for fmap in fmaps_real:
        loss = loss + _mse_to(fmap[-1], 1.0)
    return loss


def generator_adversarial_loss(fmaps_fake: Fmaps) -> jnp.ndarray:
    """Sum over sub-discriminators of MSE(fake->1)
    (reference: ste_gan/train.py:209-211)."""
    loss = 0.0
    for fmap in fmaps_fake:
        loss = loss + _mse_to(fmap[-1], 1.0)
    return loss


def feature_matching_loss(fmaps_fake: Fmaps, fmaps_real: Fmaps) -> jnp.ndarray:
    """Sum of mean-L1 over every non-logit feature map, real side detached
    (reference: ste_gan/train.py:257-264)."""
    loss = 0.0
    for fake_list, real_list in zip(fmaps_fake, fmaps_real):
        for fake, real in zip(fake_list[:-1], real_list[:-1]):
            loss = loss + jnp.mean(jnp.abs(
                fake.astype(jnp.float32)
                - jax.lax.stop_gradient(real.astype(jnp.float32))))
    return loss
