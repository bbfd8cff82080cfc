"""Export our Flax parameter trees as reference-layout torch state_dicts.

The inverse of :mod:`ste_gan_tpu.interop.torch_import`: checkpoints trained
by this framework convert into ``state_dict`` files the PyTorch reference
loads with ``strict=True`` — train on TPU, hand the model back to the torch
ecosystem (the reference's eval/plot tooling, or resuming under
``ste_gan/train.py``). Key layouts follow the reference modules exactly:

* generator — ``gblocks.N`` Sequential indices shift with the optional
  ``nn.Upsample`` (reference ste_gan/layers/conv.py:29-84: ``conv1`` convs
  sit at 1/3 without upsampling and 2/4 with, ``res1``'s conv at 0/1,
  ``conv2``'s at 1/3; ``last_conv``'s conv at 1 —
  ste_gan/models/generator.py:133-137);
* discriminators — ``multi_pooled_disc.i.layers.j`` / ``.output``
  (ste_gan/models/discriminator.py); weight-norm convs emit
  ``weight_v``/``weight_g`` (g reshaped to torch's [out, 1, ...]),
  spectral-norm convs emit ``weight_orig``/``weight_u``/``weight_v`` with
  ``v = normalize(Wᵀu)`` (torch's power-iteration invariant);
* encoder — ``conv_blocks.i`` ResBlocks incl. BatchNorm running stats and
  the ``num_batches_tracked`` counters strict loading requires, transformer
  ``w_q/w_k/w_v/w_o`` raw parameter tensors, relative-position embeddings
  with torch's trailing singleton dim.

Round-trip fidelity (our params → state_dict → actual reference module →
outputs match ours) is asserted in ``tests/test_torch_export.py``; the CLI
is ``scripts/export_torch_checkpoint.py``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ste_gan_tpu.interop.torch_import import PRIME_PERIODS
from ste_gan_tpu.models.generator import gblock_spec


def _t_conv(w) -> np.ndarray:
    """flax [*k, in, out] -> torch [out, in, *k]."""
    w = np.asarray(w, np.float32)
    return np.moveaxis(w, (-1, -2), (0, 1)).copy()


def _wn(sd: Dict, prefix: str, p: Dict) -> None:
    v = _t_conv(p["v"])
    sd[f"{prefix}.weight_v"] = v
    sd[f"{prefix}.weight_g"] = np.asarray(p["g"], np.float32).reshape(
        (-1,) + (1,) * (v.ndim - 1))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _sn(sd: Dict, prefix: str, p: Dict, s: Dict) -> None:
    w = _t_conv(p["kernel"])
    sd[f"{prefix}.weight_orig"] = w
    u = np.asarray(s["u"], np.float32)
    v = w.reshape(w.shape[0], -1).T @ u
    v /= (np.linalg.norm(v) + 1e-12)  # torch spectral_norm eps
    sd[f"{prefix}.weight_u"] = u
    sd[f"{prefix}.weight_v"] = v.astype(np.float32)
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _plain_conv(sd: Dict, prefix: str, p: Dict) -> None:
    sd[f"{prefix}.weight"] = _t_conv(p["kernel"])
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _linear(sd: Dict, prefix: str, p: Dict) -> None:
    sd[f"{prefix}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"], np.float32).T)
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)


def _batch_norm(sd: Dict, prefix: str, p: Dict, stats: Dict) -> None:
    sd[f"{prefix}.weight"] = np.asarray(p["scale"], np.float32)
    sd[f"{prefix}.bias"] = np.asarray(p["bias"], np.float32)
    sd[f"{prefix}.running_mean"] = np.asarray(stats["mean"], np.float32)
    sd[f"{prefix}.running_var"] = np.asarray(stats["var"], np.float32)
    # Not tracked on our side (we use the stats directly); strict torch
    # loading still requires the buffer.
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def generator_params_to_state_dict(params: Dict,
                                   speech_feature_type: str
                                   ) -> Dict[str, np.ndarray]:
    """Our EMGGeneratorGanTTS params -> reference netG state_dict."""
    sd: Dict[str, np.ndarray] = {}
    if "session_embeddings" in params:
        sd["session_embeddings.weight"] = np.asarray(
            params["session_embeddings"]["embedding"], np.float32)
    if "speaking_mode_embeddings" in params:
        sd["speaking_mode_embeddings.weight"] = np.asarray(
            params["speaking_mode_embeddings"]["embedding"], np.float32)

    _wn(sd, "gblocks.0", params["input_conv"])
    # The Sequential indices below depend on which blocks upsample — taken
    # from the model's own spec so exporter and forward cannot drift.
    for i, (_, up) in enumerate(gblock_spec(speech_feature_type)):
        p = params[f"gblock_{i}"]
        prefix = f"gblocks.{i + 1}"
        off = 1 if up > 1 else 0  # the optional nn.Upsample shifts indices
        _wn(sd, f"{prefix}.conv1.{1 + off}", p["conv1_a"])
        _wn(sd, f"{prefix}.conv1.{3 + off}", p["conv1_b"])
        _wn(sd, f"{prefix}.res1.{off}", p["res1"])
        _wn(sd, f"{prefix}.conv2.1", p["conv2_a"])
        _wn(sd, f"{prefix}.conv2.3", p["conv2_b"])
    _wn(sd, "last_conv.1", params["out_conv"])
    return sd


# ---------------------------------------------------------------------------
# Discriminator ensemble
# ---------------------------------------------------------------------------


def discriminator_params_to_state_dict(params: Dict, spectral: Dict
                                       ) -> Dict[str, np.ndarray]:
    """Our ensemble (params, spectral) trees -> reference netD state_dict."""
    sd: Dict[str, np.ndarray] = {}

    def emit(sub_params: Dict, sub_spectral: Dict, prefix: str) -> None:
        for name, p in sub_params.items():
            conv_prefix = (f"{prefix}.output" if name == "output"
                           else f"{prefix}.layers.{name.split('_')[1]}")
            if name in sub_spectral:
                _sn(sd, conv_prefix, p, sub_spectral[name])
            else:
                _wn(sd, conv_prefix, p)

    for name, sub in params.items():
        kind, idx = name.rsplit("_", 1)
        if kind == "period":
            i = PRIME_PERIODS.index(int(idx))
            emit(sub, spectral.get(name, {}), f"multi_pooled_disc.{i}")
        elif kind == "scale":
            emit(sub, spectral.get(name, {}), f"multi_scale_disc.{int(idx)}")
        else:
            raise ValueError(f"unexpected discriminator entry: {name}")
    return sd


# ---------------------------------------------------------------------------
# EMG encoder
# ---------------------------------------------------------------------------


def encoder_variables_to_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Our encoder {"params", "batch_stats"} -> reference state_dict."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for name, p in params.items():
        if name.startswith("res_block_"):
            i = int(name.split("_")[-1])
            prefix = f"conv_blocks.{i}"
            s = stats.get(name, {})
            _plain_conv(sd, f"{prefix}.conv1", p["conv1"])
            _plain_conv(sd, f"{prefix}.conv2", p["conv2"])
            _batch_norm(sd, f"{prefix}.bn1", p["bn1"], s["bn1"])
            _batch_norm(sd, f"{prefix}.bn2", p["bn2"], s["bn2"])
            if "residual" in p:
                _plain_conv(sd, f"{prefix}.residual_path", p["residual"])
                _batch_norm(sd, f"{prefix}.res_norm", p["res_norm"],
                            s["res_norm"])
        elif name.startswith("transformer_"):
            i = int(name.split("_")[-1])
            prefix = f"transformer.layers.{i}"
            attn = p["self_attn"]
            for w in ("w_q", "w_k", "w_v", "w_o"):
                sd[f"{prefix}.self_attn.{w}"] = np.asarray(attn[w], np.float32)
            if "relative_positional" in attn:
                sd[f"{prefix}.self_attn.relative_positional.embeddings"] = (
                    np.asarray(attn["relative_positional"]["embeddings"],
                               np.float32)[..., None])
            _linear(sd, f"{prefix}.linear1", p["linear1"])
            _linear(sd, f"{prefix}.linear2", p["linear2"])
            sd[f"{prefix}.norm1.weight"] = np.asarray(
                p["norm1"]["scale"], np.float32)
            sd[f"{prefix}.norm1.bias"] = np.asarray(
                p["norm1"]["bias"], np.float32)
            sd[f"{prefix}.norm2.weight"] = np.asarray(
                p["norm2"]["scale"], np.float32)
            sd[f"{prefix}.norm2.bias"] = np.asarray(
                p["norm2"]["bias"], np.float32)
        elif name in ("w_raw_in", "w_out", "w_aux"):
            _linear(sd, name, p)
        else:
            raise ValueError(f"unexpected encoder entry: {name}")
    return sd


def to_torch_tensors(sd: Dict[str, np.ndarray]) -> Dict:
    """numpy state_dict -> torch tensors (CPU), for torch.save."""
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}
