"""Weight-only int8 quantization for deployment artifacts.

The reference has no deployment story at all (SURVEY §1: inference is
``netG.generate`` inline, ste_gan/train.py:383-414); this module is
production machinery on top of :mod:`ste_gan_tpu.export`: it shrinks the
shipped StableHLO artifact ~4x by storing the generator's weights as
per-channel symmetric int8 constants and tracing the dequantisation into
the exported program.

Design notes (TPU-first):

* **Weight-norm folding is free.** ``WNConv`` computes
  ``w = v * g / ||v||`` each call (ops/conv.py::WNConv). Any effective
  kernel ``w`` is exactly representable in that parameterisation by
  ``v' = w, g' = ||w||`` — so quantisation operates on the *effective*
  kernel and dequantisation hands back a standard parameter tree; no
  module changes, no special inference path.
* **Per-output-channel symmetric scales.** Conv kernels are ``[k, in, out]``
  (channel-last WIO); scales are per trailing output channel
  (``scale = max|w| / 127``), embeddings per row. Biases and ``g`` stay
  f32 (0.8% of the parameter bytes).
* **Runtime cost is zero after compile.** The exported program stores int8
  constants; XLA constant-folds ``q * scale`` at compile time, so the
  serving-time HLO is identical to the f32 export's. The artifact on disk
  (and over the wire to a deployment target) is what shrinks — measured in
  ``benchmarks/quant_probe.py``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

#: Leaf names quantised per trailing axis (WNConv direction tensors) and
#: per leading axis (embedding tables). Everything else passes through f32.
_CONV_LEAF = "v"
_GAIN_LEAF = "g"
_EMBED_LEAF = "embedding"

#: Generic weight leaves (encoder/transformer trees): name -> channel axis.
#: Conv/dense kernels and attention projections quantise per trailing
#: output axis; SNConv "kernel"s in discriminators share the name and the
#: same layout, so the rule is universal. BatchNorm scale/bias, LayerNorm,
#: and biases pass through f32 (not listed).
_GENERIC_LEAVES = {
    "kernel": -1,
    "w_q": -1, "w_k": -1, "w_v": -1, "w_o": -1,
    "embeddings": -1,   # learned relative-positional tables [h, pos, d]
}


def quantize_tensor(w, channel_axis: int):
    """Symmetric per-channel int8 quantisation.

    Returns ``(q int8, scale f32)`` with ``scale`` shaped to broadcast
    against ``w`` along ``channel_axis``; ``dequant = q * scale``.
    """
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(a for a in range(w.ndim) if a != channel_axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_tensor(q, scale):
    return q.astype(jnp.float32) * scale


def quantize_params(params, generic: bool = False):
    """Parameter tree -> quantised tree (same dict nesting).

    WNConv dicts ``{v, g, bias?}`` are always folded: the effective kernel
    ``w = v * g / ||v||`` is quantised per output channel and stored as
    ``{v_q, v_scale, bias?}`` — ``g`` disappears. Embedding tables
    (``embedding``) quantise per row. With ``generic=True``, plain weight
    leaves (conv/dense ``kernel``, attention ``w_q/w_k/w_v/w_o``, rel-pos
    ``embeddings``) quantise per trailing axis and are stored as
    ``{name}__q`` / ``{name}__scale`` — used for the EMG-encoder tree,
    whose convs are unnormalised. The result round-trips through
    :func:`dequantize_params`.
    """
    from ste_gan_tpu.ops.conv import _norm_per_out_channel

    def walk(node):
        if not isinstance(node, dict):
            return node
        if _CONV_LEAF in node and _GAIN_LEAF in node:
            v = jnp.asarray(node[_CONV_LEAF], jnp.float32)
            g = jnp.asarray(node[_GAIN_LEAF], jnp.float32)
            w = v * (g / _norm_per_out_channel(v))
            q, scale = quantize_tensor(w, channel_axis=w.ndim - 1)
            out = {"v_q": q, "v_scale": scale}
            for k in node:
                if k not in (_CONV_LEAF, _GAIN_LEAF):
                    out[k] = node[k]
            return out
        if _EMBED_LEAF in node and len(node) == 1:
            q, scale = quantize_tensor(node[_EMBED_LEAF], channel_axis=0)
            return {"embedding_q": q, "embedding_scale": scale}
        out = {}
        for k, child in node.items():
            axis = _GENERIC_LEAVES.get(k)
            if (generic and axis is not None and hasattr(child, "ndim")
                    and child.ndim >= 2):
                q, scale = quantize_tensor(
                    child, channel_axis=child.ndim + axis)
                out[f"{k}__q"], out[f"{k}__scale"] = q, scale
            else:
                out[k] = walk(child)
        return out

    return walk(params)


def dequantize_params(qparams):
    """Quantised tree -> standard parameter tree consumable by the
    unmodified modules (``v = dequant, g = ||v||`` reproduces the
    dequantised WNConv kernel exactly; see module docstring)."""
    from ste_gan_tpu.ops.conv import _norm_per_out_channel

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "v_q" in node:
            v = dequantize_tensor(node["v_q"], node["v_scale"])
            out = {"v": v, "g": _norm_per_out_channel(v)}
            for k in node:
                if k not in ("v_q", "v_scale"):
                    out[k] = node[k]
            return out
        if "embedding_q" in node:
            return {"embedding": dequantize_tensor(node["embedding_q"],
                                                   node["embedding_scale"])}
        out = {}
        for k, child in node.items():
            if k.endswith("__q"):
                out[k[:-3]] = dequantize_tensor(child,
                                                node[k[:-3] + "__scale"])
            elif k.endswith("__scale"):
                continue
            else:
                out[k] = walk(child)
        return out

    return walk(qparams)


# The original generator-specific names remain the public API for the
# generator path (scripts/export_generator.py, tests).
def quantize_generator_params(params):
    return quantize_params(params, generic=False)


def dequantize_generator_params(qparams):
    return dequantize_params(qparams)


def quantized_param_bytes(qparams) -> int:
    """Total parameter bytes of a (possibly quantised) tree."""
    return int(sum(np.asarray(leaf).nbytes
                   for leaf in jax.tree.leaves(qparams)))


def export_generator_quantized(generator, gen_params, feature_dim: int,
                               platforms: Optional[Sequence[str]] = None,
                               serving: bool = False):
    """Like :func:`ste_gan_tpu.export.export_generator`, but the traced
    program closes over int8 weights + f32 scales and dequantises inside
    the trace — the serialized StableHLO stores the weights as int8
    constants (~4x smaller artifact; identical device program after XLA
    constant-folding)."""
    qparams = quantize_generator_params(gen_params)

    def synth(speech_features, session_ids):
        params = dequantize_generator_params(qparams)
        return generator.apply({"params": params}, speech_features,
                               session_ids)

    def synth_serving(speech_features, session_ids, speaking_mode_ids,
                      num_valid_frames):
        params = dequantize_generator_params(qparams)
        return generator.apply({"params": params}, speech_features,
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


def export_emg_encoder_quantized(encoder, variables, num_emg_channels: int,
                                 platforms: Optional[Sequence[str]] = None):
    """int8 variant of :func:`ste_gan_tpu.export.export_emg_encoder` (the
    EMG -> units + phonemes *decoding* artifact): conv kernels, attention
    projections, and rel-pos tables stored as per-channel int8 constants
    (generic rule set); BatchNorm statistics/affines stay f32. Same
    symbolic signature and ``t >= D+1`` windowed-regime constraint."""
    qparams = quantize_params(variables["params"], generic=True)
    rest = {k: v for k, v in variables.items() if k != "params"}

    def decode(emg):
        vs = dict(rest, params=dequantize_params(qparams))
        return encoder.apply(vs, emg, train=False)

    min_frames = int(encoder.relative_positional_distance) + 1
    scope = jax.export.SymbolicScope([f"t >= {min_frames}"])
    b, t16 = jax.export.symbolic_shape("b, 16*t", scope=scope)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(jax.jit(decode), **kwargs)(
        jax.ShapeDtypeStruct((b, t16, num_emg_channels), jnp.float32))
