"""Windowed (framed) reductions over the time axis.

The reference materialises sliding windows with ``Tensor.unfold`` and then
reduces them (reference: ste_gan/losses/time_domain_loss.py:35-49). On TPU
that intermediate is pure HBM traffic; a framed mean/sum is exactly a
strided depthwise convolution with a constant kernel, whose forward AND
autodiff transpose XLA schedules well. (A cumsum-difference formulation has
a faster forward but a pathological gradient composition in the fused train
step — measured on v5e — so the conv form is kept for the differentiated
path.) Semantics bit-match unfold: frame count ``(T - window) // stride +
1``, trailing remainder dropped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_reduce(x: jnp.ndarray, window: int, stride: int, mode: str = "mean") -> jnp.ndarray:
    """Framed reduction over time.

    Args:
        x: [B, T, C] signal.
        window: frame length in samples.
        stride: hop between frames.
        mode: "mean" or "sum".

    Returns:
        [B, num_frames, C] with num_frames = (T - window) // stride + 1.
    """
    if mode not in ("mean", "sum"):
        raise ValueError(f"unsupported mode: {mode}")
    b, t, c = x.shape
    num_frames = (t - window) // stride + 1
    # Drop the trailing remainder exactly like unfold does, so the conv's
    # VALID geometry matches.
    needed = (num_frames - 1) * stride + window
    x = x[:, :needed].astype(jnp.float32)
    fill = 1.0 / window if mode == "mean" else 1.0
    kernel = jnp.broadcast_to(
        jnp.full((window, 1, 1), fill, dtype=x.dtype), (window, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=((0, 0),),
        dimension_numbers=dn, feature_group_count=c,
    )
    return out


def frame_reduce_cumsum(x: jnp.ndarray, window: int, stride: int,
                        mode: str = "mean") -> jnp.ndarray:
    """Cumsum-difference variant: fastest forward (a few fully-vectorised
    passes), intended for gradient-stopped inputs (e.g. the real-EMG side of
    the TD loss)."""
    if mode not in ("mean", "sum"):
        raise ValueError(f"unsupported mode: {mode}")
    b, t, c = x.shape
    num_frames = (t - window) // stride + 1
    xf = x.astype(jnp.float32)
    csum = jnp.concatenate(
        [jnp.zeros((b, 1, c), xf.dtype), jnp.cumsum(xf, axis=1)], axis=1)
    starts = jnp.arange(num_frames) * stride
    out = csum[:, starts + window, :] - csum[:, starts, :]
    if mode == "mean":
        out = out / window
    return out
