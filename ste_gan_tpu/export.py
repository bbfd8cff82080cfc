"""Deployment artifacts: serialized shape-polymorphic StableHLO exports.

The reference has no deployment story — synthesis happens inline in the
train loop via ``netG.generate`` (reference ste_gan/train.py:383-414,
ste_gan/models/generator.py:48-75), so shipping a trained model means
shipping the whole Python framework. This module is the TPU-native
beyond-reference answer: :func:`export_generator` serializes the trained
generator into a single self-contained `jax.export` artifact —
shape-polymorphic StableHLO with the trained weights baked in as
constants — that any XLA runtime can load and execute **without this
package, without Flax, and without the checkpoint machinery**:

    exported = load_exported(path)
    emg = exported.call(speech_features, session_ids)   # any (B, T)

One artifact covers every batch size and utterance length (symbolic
``b``/``t`` dimensions; XLA compiles per concrete shape at first call, so
production callers should still bucket lengths — see
:mod:`ste_gan_tpu.infer`), and a multi-platform export runs on TPU and
CPU from the same bytes. Round-trip numerical equality and
cross-batch/length polymorphism are asserted in ``tests/test_export.py``;
the CLI is ``scripts/export_generator.py``.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ste_gan_tpu import constants as C


def speech_feature_dim(cfg) -> int:
    """Generator input feature width from the run config (256 soft speech
    units at 50 Hz, or 25 MFCCs at 100 Hz — reference generator.py:176-181).
    """
    if cfg.model.speech_feature_type == C.DataType.MFCCS:
        return C.NUM_MFCCS
    return C.SPEECH_UNITS_FEAT_SIZE


def export_generator(generator, gen_params, feature_dim: int,
                     platforms: Optional[Sequence[str]] = None):
    """Export ``generator.apply`` with ``gen_params`` baked in.

    Args:
      generator: the Flax :class:`~ste_gan_tpu.models.generator.
        EMGGeneratorGanTTS` module (its static config is captured in the
        traced program).
      gen_params: trained parameter pytree (becomes StableHLO constants —
        the artifact is self-contained).
      feature_dim: speech-feature width (see :func:`speech_feature_dim`).
      platforms: lowering platforms, e.g. ``("tpu", "cpu")``. ``None``
        exports for the default (current) backend only.

    Returns:
      ``jax.export.Exported`` — call via ``.call(feats, session_ids)`` with
      ``feats`` float32 ``[B, T, feature_dim]`` and ``session_ids`` int32
      ``[B]``; returns ``[B, upsample_factor * T, num_emg_channels]`` EMG.
    """

    def synth(speech_features, session_ids):
        return generator.apply({"params": gen_params}, speech_features,
                               session_ids)

    b, t = jax.export.symbolic_shape("b, t")
    args = (
        jax.ShapeDtypeStruct((b, t, feature_dim), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(synth), **kwargs)(*args)


def save_exported(exported, path: Path) -> int:
    """Serialize to ``path``; returns the artifact size in bytes."""
    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return len(data)


def load_exported(path: Path):
    """Deserialize an artifact saved by :func:`save_exported`.

    The result's ``.call`` runs under the current JAX backend (which must
    be one of the export's platforms)."""
    return jax.export.deserialize(Path(path).read_bytes())
