"""TPU-native STE-GAN: speech features -> 800 Hz surface EMG, built on
JAX / XLA / Pallas / pjit.

A from-scratch, TPU-first framework with the capabilities of the PyTorch
reference (scheck-k/ste-gan): GanTTS-style upsampling generator with session
embeddings, multi-period + multi-scale discriminator ensemble, multi-window
time-domain / feature-matching / speech-unit / phoneme losses, and the
conv-transformer EMG encoder (standalone pre-training + frozen perceptual
loss network). The full adversarial update compiles to a single pjit-ed,
data-parallel step over a TPU mesh.
"""
from ste_gan_tpu.constants import *  # noqa: F401,F403  (re-export, as reference ste_gan/__init__.py:2)
from ste_gan_tpu import constants  # noqa: F401

__version__ = "0.1.0"
