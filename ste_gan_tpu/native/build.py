"""On-demand build of the native host kernels (C++ via g++, bound with
ctypes — no Python headers needed).

Rebuilds automatically when the source is newer than the shared library.
"""
from __future__ import annotations

import logging
import subprocess
import threading
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent
_LOCK = threading.Lock()


def build_library(name: str, sources=None, extra_flags=()) -> Path:
    """Compile ``sources`` into ``lib{name}.so`` inside the package dir and
    return its path. Thread-safe; no-op when up to date."""
    sources = [Path(s) for s in (sources or [_NATIVE_DIR / f"{name}.cpp"])]
    lib_path = _NATIVE_DIR / f"lib{name}.so"
    with _LOCK:
        if lib_path.exists() and all(
                src.stat().st_mtime <= lib_path.stat().st_mtime for src in sources):
            return lib_path
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", *extra_flags,
               *[str(s) for s in sources], "-o", str(lib_path)]
        logging.info("Building native library: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return lib_path
