"""Import the PyTorch reference (read-only, /root/reference) for use as a
*test oracle only*.

The reference depends on a few packages absent from this image (omegaconf,
librosa, soundfile, numba, textgrids). For the modules we use as oracles
(models, layers, losses) those imports are either unused or trivially
stubbable, so we register minimal stubs before importing. Nothing from the
reference is ever imported by the framework itself.
"""
from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules.setdefault(name, mod)
    return mod


def _install_stubs() -> None:
    if "omegaconf" not in sys.modules:
        class DictConfig(dict):
            def __getattr__(self, item):
                try:
                    value = self[item]
                except KeyError as exc:
                    raise AttributeError(item) from exc
                return DictConfig(value) if isinstance(value, dict) else value

        _stub("omegaconf", DictConfig=DictConfig, OmegaConf=types.SimpleNamespace())

    if "numba" not in sys.modules:
        def jit(fn=None, **kwargs):
            if fn is None:
                return lambda f: f
            return fn

        _stub("numba", jit=jit)

    for missing in ("librosa", "soundfile", "noisereduce"):
        if missing not in sys.modules:
            _stub(missing)
    if "textgrids" not in sys.modules:
        _stub("textgrids", TextGrid=object)
    if "librosa" in sys.modules and not hasattr(sys.modules["librosa"], "util"):
        sys.modules["librosa"].util = types.SimpleNamespace()
        sys.modules["librosa"].feature = types.SimpleNamespace()


def import_reference(module: str):
    """Import e.g. 'ste_gan.models.generator' from /root/reference."""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(module)
