"""Windowed (framed) reductions over the time axis.

The reference materialises sliding windows with ``Tensor.unfold`` and then
reduces them (reference: ste_gan/losses/time_domain_loss.py:35-49). On TPU
that intermediate is pure HBM traffic; a framed mean/sum is exactly a
depthwise convolution with a constant kernel, which XLA fuses with the
surrounding elementwise ops. ``frame_reduce`` implements framed ``mean`` and
``sum`` that way, bit-matching the unfold semantics (frame count
``(T - window) // stride + 1``, trailing remainder dropped).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_reduce(x: jnp.ndarray, window: int, stride: int, mode: str = "mean") -> jnp.ndarray:
    """Framed reduction over time.

    Computed as strided differences of an exclusive cumulative sum —
    O(T log T) work with full lane utilisation, instead of a depthwise
    conv whose 8-channel feature dim would waste 120 of the 128 TPU lanes.
    The VJP (reverse cumsum + gather-scatter) is equally cheap.

    Args:
        x: [B, T, C] signal.
        window: frame length in samples.
        stride: hop between frames.
        mode: "mean" or "sum".

    Returns:
        [B, num_frames, C] with num_frames = (T - window) // stride + 1
        (trailing remainder dropped, exactly like torch unfold).
    """
    if mode not in ("mean", "sum"):
        raise ValueError(f"unsupported mode: {mode}")
    b, t, c = x.shape
    num_frames = (t - window) // stride + 1
    x = x.astype(jnp.float32)
    csum = jnp.concatenate(
        [jnp.zeros((b, 1, c), x.dtype), jnp.cumsum(x, axis=1)], axis=1)
    starts = jnp.arange(num_frames) * stride
    out = csum[:, starts + window, :] - csum[:, starts, :]
    if mode == "mean":
        out = out / window
    return out
