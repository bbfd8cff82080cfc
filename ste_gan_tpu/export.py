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
    Delegates to ``Config.speech_input_dim`` (raises on unknown types)."""
    return cfg.speech_input_dim


def export_generator(generator, gen_params, feature_dim: int,
                     platforms: Optional[Sequence[str]] = None,
                     serving: bool = False):
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
      serving: when True, export the micro-batching serving signature
        ``(feats [B,T,D], session_ids [B], speaking_mode_ids [B],
        num_valid_frames [B])`` with per-row valid-length masking — rows
        padded beyond ``num_valid_frames[b]`` cannot contaminate valid
        output (the exactness contract of
        :meth:`ste_gan_tpu.infer.EMGSynthesizer.synthesize_padded`).
        When False (default), the minimal ``(feats, session_ids)``
        signature.

    Returns:
      ``jax.export.Exported`` — call via ``.call(...)``; returns
      ``[B, upsample_factor * T, num_emg_channels]`` EMG.
    """

    def synth(speech_features, session_ids):
        return generator.apply({"params": gen_params}, speech_features,
                               session_ids)

    def synth_serving(speech_features, session_ids, speaking_mode_ids,
                      num_valid_frames):
        return generator.apply({"params": gen_params}, speech_features,
                               session_ids, speaking_mode_ids,
                               num_valid_frames=num_valid_frames)

    b, t = jax.export.symbolic_shape("b, t")
    args = [
        jax.ShapeDtypeStruct((b, t, feature_dim), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    ]
    fn = synth
    if serving:
        args += [jax.ShapeDtypeStruct((b,), jnp.int32),
                 jax.ShapeDtypeStruct((b,), jnp.int32)]
        fn = synth_serving
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(fn), **kwargs)(*args)


def export_emg_encoder(encoder, variables, num_emg_channels: int,
                       platforms: Optional[Sequence[str]] = None):
    """Export the EMG encoder (EMG → soft speech units + phoneme logits —
    the silent-speech *decoding* direction; reference
    ste_gan/models/emg_encoder.py:36-88) as a shape-polymorphic artifact.

    Signature: ``emg [B, 16*t, C] float32 → (units [B, t, 256],
    phoneme_logits [B, t, 48])`` with symbolic batch and length. The EMG
    length must be a multiple of 16 (the model's downsample factor) and at
    least ``16*(D+1)`` samples where ``D`` is the encoder's
    ``relative_positional_distance`` (default 100 → 1,616 samples =
    2.02 s): the relative-position attention switches to its
    windowed-masking form above ``D`` frames (transformer.py
    ``max_distance``), and the export pins that regime via the symbolic
    constraint ``t >= D+1`` — full utterances always run there; pad
    shorter inputs up to the minimum."""

    def decode(emg):
        return encoder.apply(variables, emg, train=False)

    min_frames = int(encoder.relative_positional_distance) + 1
    scope = jax.export.SymbolicScope([f"t >= {min_frames}"])
    b, t16 = jax.export.symbolic_shape("b, 16*t", scope=scope)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(decode), **kwargs)(
        jax.ShapeDtypeStruct((b, t16, num_emg_channels), jnp.float32))


def save_exported(exported, path: Path, meta: Optional[dict] = None) -> int:
    """Serialize to ``path``; returns the artifact size in bytes.

    ``meta`` (generator geometry: upsample/channels/feature_dim/serving)
    is written next to the artifact as ``<path>.meta.json`` — deployments
    need it to size buffers without the framework."""
    import json

    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    if meta is not None:
        Path(str(path) + ".meta.json").write_text(json.dumps(meta, indent=1))
    return len(data)


def generator_meta(generator, feature_dim: int, serving: bool) -> dict:
    """Geometry sidecar for :func:`save_exported`."""
    return {
        "feature_dim": feature_dim,
        "upsample": generator.upsample_factor,
        "num_emg_channels": generator.num_emg_channels,
        "serving": bool(serving),
    }


def load_exported(path: Path):
    """Deserialize an artifact saved by :func:`save_exported`.

    The result's ``.call`` runs under the current JAX backend (which must
    be one of the export's platforms)."""
    return jax.export.deserialize(Path(path).read_bytes())


class ExportedSynthesizer:
    """Drop-in synthesizer backed by a *serving* export — the micro-batching
    server (:mod:`ste_gan_tpu.serve`) runs from the artifact + its vocab
    JSONs alone: no checkpoint machinery, no Flax module, no config.

    Implements the subset of :class:`ste_gan_tpu.infer.EMGSynthesizer` the
    :class:`~ste_gan_tpu.serve.MicroBatcher` contract needs
    (``synthesize_padded``, ``upsample``, ``generator.speech_input_dim``,
    ``generator.num_emg_channels``). Receptive-field streaming needs the
    in-framework generator — serve's streaming endpoint reports 501 in
    artifact mode."""

    def __init__(self, path: Path):
        import json
        from types import SimpleNamespace

        path = Path(path)
        meta_path = Path(str(path) + ".meta.json")
        if not meta_path.exists():
            raise FileNotFoundError(
                f"{meta_path} missing — re-export with "
                "scripts/export_generator.py (it writes the geometry "
                "sidecar)")
        meta = json.loads(meta_path.read_text())
        if not meta.get("serving"):
            raise ValueError(
                f"{path} is a minimal (feats, session) export; serving "
                "needs the per-row valid-mask signature — re-export with "
                "--serving")
        self._exported = load_exported(path)
        self.upsample = int(meta["upsample"])
        self.generator = SimpleNamespace(
            speech_input_dim=int(meta["feature_dim"]),
            num_emg_channels=int(meta["num_emg_channels"]))

    def synthesize_padded(self, feats, session_idx, mode_idx, num_valid):
        """Same contract as ``EMGSynthesizer.synthesize_padded``."""
        return self._exported.call(feats, session_idx, mode_idx, num_valid)

    def synthesize_streaming(self, *args, **kwargs):
        raise NotImplementedError(
            "streaming synthesis needs the in-framework generator "
            "(receptive-field windowing); serve from --run_dir for the "
            "streaming endpoint")
