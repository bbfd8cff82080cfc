"""Process-level JAX configuration helpers."""
from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> None:
    """Enable the persistent compilation cache (big win for the large fused
    train step, especially through the remote-TPU tunnel)."""
    import jax

    cache_dir = Path(cache_dir or Path(__file__).resolve().parents[2] / ".cache/jax")
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_platform(platform: str) -> None:
    """Pin the JAX backend (e.g. ``"cpu"``). Must be called before the
    first backend touch. Needed because this image's TPU plugin ignores
    the ``JAX_PLATFORMS`` environment variable — host-side tools (tests,
    offline exports) call this to stay off a busy TPU."""
    import jax

    jax.config.update("jax_platforms", platform)
