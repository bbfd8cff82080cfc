"""Multi-window time-domain (TD) feature loss.

Parity with the reference (ste_gan/losses/time_domain_loss.py): a signal is
split into a low-frequency part (double 9-point moving average) and a
rectified high-frequency residual; per window config, four framed features
are stacked — frame mean and frame power (sum of squares) of the low part,
frame power and frame mean of the rectified high part — and the loss is the
L1 distance between generated and (gradient-stopped) real features, summed
over three window configurations: (20, 8), (51, 13), (80, 16) samples.

TPU-native design: one pure-jnp jit-able function; moving averages and framed
reductions are depthwise convolutions (no unfold materialisation), so XLA
fuses the whole loss into the surrounding step.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ste_gan_tpu.ops.conv import moving_average, reflect_pad_time
from ste_gan_tpu.ops.framing import frame_reduce

#: (win_size_samples, win_shift_samples): 25 ms/10 ms, 64 ms/16 ms,
#: 100 ms/25 ms at 800 Hz (reference: ste_gan/losses/time_domain_loss.py:87-94).
DEFAULT_TD_WINDOWS: Tuple[Tuple[int, int], ...] = ((20, 8), (51, 13), (80, 16))

AVG_FILTER_WINDOW = 9


def time_domain_features(x: jnp.ndarray, window: int, stride: int,
                         avg_window: int = AVG_FILTER_WINDOW) -> jnp.ndarray:
    """[B, T, C] -> [B, F, C, 4] framed TD features."""
    x = x.astype(jnp.float32)
    low = moving_average(moving_average(x, avg_window), avg_window)
    high_rect = jnp.abs(x - low)

    pad = window // 2
    low_p = reflect_pad_time(low, (pad, pad))
    rect_p = reflect_pad_time(high_rect, (pad, pad))

    feats = jnp.stack([
        frame_reduce(low_p, window, stride, "mean"),
        frame_reduce(jnp.square(low_p), window, stride, "sum"),
        frame_reduce(jnp.square(rect_p), window, stride, "sum"),
        frame_reduce(rect_p, window, stride, "mean"),
    ], axis=-1)
    return feats


def time_domain_loss(x_real: jnp.ndarray, x_generated: jnp.ndarray,
                     window: int, stride: int) -> jnp.ndarray:
    """Mean L1 between generated and detached real TD features."""
    feats_real = jax.lax.stop_gradient(
        time_domain_features(x_real, window, stride))
    feats_gen = time_domain_features(x_generated, window, stride)
    return jnp.mean(jnp.abs(feats_gen - feats_real))


def multi_time_domain_loss(
    x_real: jnp.ndarray, x_generated: jnp.ndarray,
    windows: Sequence[Tuple[int, int]] = DEFAULT_TD_WINDOWS,
) -> jnp.ndarray:
    """Sum of TD losses over the window configurations."""
    return sum(time_domain_loss(x_real, x_generated, w, s) for w, s in windows)
