"""Import reference PyTorch checkpoints into this framework.

The reference trains and ships plain ``state_dict`` files
(``netG-{step:08d}.pt`` / ``best_netG.pt`` / ``netD-…`` /
``best_val_loss_model.pt``; saved at ste_gan/train.py:425-436 and
ste_gan/emg_encoder/train.py:242-250, loaded via
ste_gan/utils/common.py:23-73 with torch.compile's ``_orig_mod.`` prefix
stripped). These converters map those state dicts — by key, without
importing any reference code — onto our flax parameter trees, so a
reference-trained model can be served or fine-tuned here.

Layout conventions: torch conv weights are [out, in, *k]; ours are
[*k, in, out]. torch Linear weights are [out, in]; ours [in, out].
Weight-norm keeps (g, v); spectral-norm keeps the raw kernel plus the
power-iteration vector ``u`` (``v`` is recomputed from ``u`` on the first
forward, matching torch's update order).
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from ste_gan_tpu.models.discriminator import PRIME_PERIODS

_ORIG_MOD_PREFIX = "_orig_mod."


def fix_state_dict(state_dict: Dict) -> Dict:
    """Strip torch.compile's ``_orig_mod.`` prefix
    (reference fix_state_dict; ste_gan/utils/common.py:13-21)."""
    return {key[len(_ORIG_MOD_PREFIX):] if key.startswith(_ORIG_MOD_PREFIX)
            else key: value for key, value in state_dict.items()}


def load_torch_state_dict(path: Path) -> Dict[str, np.ndarray]:
    """Load a ``.pt`` file into a {key: float32-or-int numpy} dict."""
    import torch

    obj = torch.load(Path(path), map_location="cpu", weights_only=True)
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    sd = fix_state_dict(obj)
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()
            if hasattr(v, "detach")}


# ---------------------------------------------------------------------------
# Low-level tensor conversions
# ---------------------------------------------------------------------------


def _conv_weight(w: np.ndarray) -> np.ndarray:
    """torch [out, in, *k] -> flax [*k, in, out]."""
    return np.moveaxis(w, (0, 1), (-1, -2)).copy()


def _linear(sd: Dict, prefix: str) -> Dict:
    p = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _plain_conv(sd: Dict, prefix: str) -> Dict:
    p = {"kernel": _conv_weight(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _wn_conv(sd: Dict, prefix: str) -> Dict:
    p = {
        "v": _conv_weight(sd[f"{prefix}.weight_v"]),
        "g": sd[f"{prefix}.weight_g"].reshape(-1),
    }
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _sn_conv(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """Spectral-norm conv -> (params, spectral power-iteration state).

    ``v`` is zero-initialised: our forward recomputes v from u before use,
    exactly like torch's pre-forward power-iteration update order."""
    params = {"kernel": _conv_weight(sd[f"{prefix}.weight_orig"])}
    if f"{prefix}.bias" in sd:
        params["bias"] = sd[f"{prefix}.bias"]
    u = sd[f"{prefix}.weight_u"]
    rest = params["kernel"].size // params["kernel"].shape[-1]
    spectral = {"u": u, "v": np.zeros((rest,), np.float32)}
    return params, spectral


def _batch_norm(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def _is_spectral(sd: Dict, prefix: str) -> bool:
    return f"{prefix}.weight_orig" in sd


def _sorted_indices(sd: Dict, prefix: str) -> list:
    """Child module indices under ``prefix`` that own conv weights, sorted."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.weight")
    return sorted({int(m.group(1)) for key in sd
                   if (m := pat.match(key)) is not None})


# ---------------------------------------------------------------------------
# Generator (reference EMGGeneratorGanTTS; ste_gan/models/generator.py)
# ---------------------------------------------------------------------------


def convert_generator_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """netG state_dict -> our EMGGeneratorGanTTS params tree."""
    params = {}
    if "session_embeddings.weight" in sd:
        params["session_embeddings"] = {
            "embedding": sd["session_embeddings.weight"]}
    if "speaking_mode_embeddings.weight" in sd:
        params["speaking_mode_embeddings"] = {
            "embedding": sd["speaking_mode_embeddings.weight"]}

    # gblocks.0 is the input WNConv1d; gblocks.1..N are GBlocks whose
    # Sequential indices shift with the optional Upsample — resolve convs
    # positionally inside each sub-module instead of hardcoding indices.
    gblock_ids = sorted({int(m.group(1)) for key in sd
                         if (m := re.match(r"gblocks\.(\d+)\.", key))})
    params["input_conv"] = _wn_conv(sd, "gblocks.0")
    for gb in gblock_ids:
        if gb == 0:
            continue
        prefix = f"gblocks.{gb}"
        conv1 = _sorted_indices(sd, f"{prefix}.conv1")
        res1 = _sorted_indices(sd, f"{prefix}.res1")
        conv2 = _sorted_indices(sd, f"{prefix}.conv2")
        assert len(conv1) == 2 and len(res1) == 1 and len(conv2) == 2, (
            f"unexpected GBlock structure at {prefix}: "
            f"{len(conv1)}/{len(res1)}/{len(conv2)} convs")
        params[f"gblock_{gb - 1}"] = {
            "conv1_a": _wn_conv(sd, f"{prefix}.conv1.{conv1[0]}"),
            "conv1_b": _wn_conv(sd, f"{prefix}.conv1.{conv1[1]}"),
            "res1": _wn_conv(sd, f"{prefix}.res1.{res1[0]}"),
            "conv2_a": _wn_conv(sd, f"{prefix}.conv2.{conv2[0]}"),
            "conv2_b": _wn_conv(sd, f"{prefix}.conv2.{conv2[1]}"),
        }
    out = _sorted_indices(sd, "last_conv")
    assert len(out) == 1, f"unexpected last_conv structure: {out}"
    params["out_conv"] = _wn_conv(sd, f"last_conv.{out[0]}")
    return params


# ---------------------------------------------------------------------------
# Discriminator ensemble (reference Discriminator(Small))
# ---------------------------------------------------------------------------


def convert_discriminator_state_dict(
        sd: Dict[str, np.ndarray],
        periods=PRIME_PERIODS) -> Tuple[Dict, Dict]:
    """netD state_dict -> (params, spectral) trees for our ensemble.

    Period discriminators are keyed by their prime period (the reference
    constructs them in the order of ``periods``;
    ste_gan/models/discriminator.py:128,164-175)."""
    params, spectral = {}, {}

    def convert_sub(prefix: str, name: str) -> None:
        p, s = {}, {}
        for j in sorted({int(m.group(1)) for key in sd
                         if (m := re.match(
                             re.escape(prefix) + r"\.layers\.(\d+)\.", key))}):
            lp = f"{prefix}.layers.{j}"
            if _is_spectral(sd, lp):
                p[f"layer_{j}"], s[f"layer_{j}"] = _sn_conv(sd, lp)
            else:
                p[f"layer_{j}"] = _wn_conv(sd, lp)
        op = f"{prefix}.output"
        if _is_spectral(sd, op):
            p["output"], s["output"] = _sn_conv(sd, op)
        else:
            p["output"] = _wn_conv(sd, op)
        params[name] = p
        if s:
            spectral[name] = s

    pooled = sorted({int(m.group(1)) for key in sd
                     if (m := re.match(r"multi_pooled_disc\.(\d+)\.", key))})
    assert len(pooled) == len(periods), (
        f"{len(pooled)} period discriminators vs periods {periods}")
    for i in pooled:
        convert_sub(f"multi_pooled_disc.{i}", f"period_{periods[i]}")
    scales = sorted({int(m.group(1)) for key in sd
                     if (m := re.match(r"multi_scale_disc\.(\d+)\.", key))})
    for i in scales:
        convert_sub(f"multi_scale_disc.{i}", f"scale_{i}")
    return params, spectral


# ---------------------------------------------------------------------------
# EMG encoder (reference EMGEncoderTransformer)
# ---------------------------------------------------------------------------


def convert_encoder_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Encoder state_dict -> {"params", "batch_stats"} variables tree
    (directly usable as ``--emg_enc_ckpt`` after Orbax export)."""
    params, stats = {}, {}
    blocks = sorted({int(m.group(1)) for key in sd
                     if (m := re.match(r"conv_blocks\.(\d+)\.", key))})
    for i in blocks:
        prefix = f"conv_blocks.{i}"
        p = {"conv1": _plain_conv(sd, f"{prefix}.conv1"),
             "conv2": _plain_conv(sd, f"{prefix}.conv2")}
        s = {}
        p["bn1"], s["bn1"] = _batch_norm(sd, f"{prefix}.bn1")
        p["bn2"], s["bn2"] = _batch_norm(sd, f"{prefix}.bn2")
        if f"{prefix}.residual_path.weight" in sd:
            p["residual"] = _plain_conv(sd, f"{prefix}.residual_path")
            p["res_norm"], s["res_norm"] = _batch_norm(sd, f"{prefix}.res_norm")
        params[f"res_block_{i}"] = p
        stats[f"res_block_{i}"] = s

    params["w_raw_in"] = _linear(sd, "w_raw_in")
    layers = sorted({int(m.group(1)) for key in sd
                     if (m := re.match(r"transformer\.layers\.(\d+)\.", key))})
    for i in layers:
        prefix = f"transformer.layers.{i}"
        attn = {name: sd[f"{prefix}.self_attn.{name}"]
                for name in ("w_q", "w_k", "w_v", "w_o")}
        rel_key = f"{prefix}.self_attn.relative_positional.embeddings"
        if rel_key in sd:
            attn["relative_positional"] = {
                "embeddings": sd[rel_key][..., 0]}  # [H, M, d, 1] -> [H, M, d]
        params[f"transformer_{i}"] = {
            "self_attn": attn,
            "linear1": _linear(sd, f"{prefix}.linear1"),
            "linear2": _linear(sd, f"{prefix}.linear2"),
            "norm1": {"scale": sd[f"{prefix}.norm1.weight"],
                      "bias": sd[f"{prefix}.norm1.bias"]},
            "norm2": {"scale": sd[f"{prefix}.norm2.weight"],
                      "bias": sd[f"{prefix}.norm2.bias"]},
        }
    params["w_out"] = _linear(sd, "w_out")
    params["w_aux"] = _linear(sd, "w_aux")
    return {"params": params, "batch_stats": stats}
