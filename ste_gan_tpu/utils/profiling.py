"""Profiling and throughput instrumentation.

The reference's only perf observability is wall-clock ms/batch logging
(reference: ste_gan/train.py:275-286). Here:

* :class:`StepTimer` tracks steps/sec and EMG channel-samples/sec/chip (the
  BASELINE headline metric) over a sliding window;
* :func:`trace` wraps a block in a ``jax.profiler`` trace whose output loads
  in TensorBoard / Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional


class StepTimer:
    def __init__(self, channel_samples_per_step: int, num_devices: int = 1):
        self.channel_samples_per_step = channel_samples_per_step
        self.num_devices = max(1, num_devices)
        self._last_time: Optional[float] = None
        self._last_step: int = 0

    def update(self, step: int) -> Dict[str, float]:
        """Call at logging boundaries; returns throughput scalars for the
        window since the previous call."""
        now = time.perf_counter()
        out: Dict[str, float] = {}
        if self._last_time is not None and step > self._last_step:
            dt = now - self._last_time
            steps = step - self._last_step
            out["perf/steps_per_sec"] = steps / dt
            out["perf/ms_per_step"] = 1e3 * dt / steps
            out["perf/emg_channel_samples_per_sec_per_chip"] = (
                steps * self.channel_samples_per_step / dt / self.num_devices)
        self._last_time = now
        self._last_step = step
        return out


@contextlib.contextmanager
def trace(log_dir: Path, enabled: bool = True):
    """jax.profiler trace context (viewable in TensorBoard's profile tab)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
