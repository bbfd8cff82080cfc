"""Torch -> flax parameter-tree converters, used only by parity tests.

Layout conventions: torch conv weights are [out, in, *k]; ours are
[*k, in, out] (WIO/HWIO). torch Linear weights are [out, in]; ours [in, out].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import torch


def _np(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().copy()


def conv_weight(w: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(np.moveaxis(_np(w), (0, 1), (-1, -2)))


def plain_conv(conv) -> dict:
    p = {"kernel": conv_weight(conv.weight)}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(_np(conv.bias))
    return p


def wn_conv(conv) -> dict:
    p = {
        "v": conv_weight(conv.weight_v),
        "g": jnp.asarray(_np(conv.weight_g).reshape(-1)),
    }
    if conv.bias is not None:
        p["bias"] = jnp.asarray(_np(conv.bias))
    return p


def sn_conv(conv) -> tuple:
    """Returns (params, spectral_state). The stored v is intentionally reset:
    parity tests run one training forward on both sides, which recomputes v
    from u before use."""
    params = {"kernel": conv_weight(conv.weight_orig)}
    if conv.bias is not None:
        params["bias"] = jnp.asarray(_np(conv.bias))
    u = jnp.asarray(_np(conv.weight_u))
    rest = params["kernel"].size // params["kernel"].shape[-1]
    spectral = {"u": u, "v": jnp.zeros((rest,), jnp.float32)}
    return params, spectral


def linear(lin) -> dict:
    p = {"kernel": jnp.asarray(_np(lin.weight).T)}
    if lin.bias is not None:
        p["bias"] = jnp.asarray(_np(lin.bias))
    return p


def embedding(emb) -> dict:
    return {"embedding": jnp.asarray(_np(emb.weight))}


def batch_norm(bn) -> tuple:
    params = {"scale": jnp.asarray(_np(bn.weight)),
              "bias": jnp.asarray(_np(bn.bias))}
    stats = {"mean": jnp.asarray(_np(bn.running_mean)),
             "var": jnp.asarray(_np(bn.running_var))}
    return params, stats


# ---------------------------------------------------------------------------
# Model-level converters
# ---------------------------------------------------------------------------


def convert_gblock(gb) -> dict:
    """Reference GBlock (ste_gan/layers/conv.py:29-84) -> our GBlock tree."""
    conv1 = [m for m in gb.conv1 if isinstance(m, torch.nn.Conv1d)]
    res1 = [m for m in gb.res1 if isinstance(m, torch.nn.Conv1d)]
    conv2 = [m for m in gb.conv2 if isinstance(m, torch.nn.Conv1d)]
    return {
        "conv1_a": wn_conv(conv1[0]),
        "conv1_b": wn_conv(conv1[1]),
        "res1": wn_conv(res1[0]),
        "conv2_a": wn_conv(conv2[0]),
        "conv2_b": wn_conv(conv2[1]),
    }


def convert_generator(netg) -> dict:
    """Reference EMGGeneratorGanTTS -> our params tree."""
    params = {}
    if netg.session_embeddings is not None:
        params["session_embeddings"] = embedding(netg.session_embeddings)
    if getattr(netg, "speaking_mode_embeddings", None) is not None:
        params["speaking_mode_embeddings"] = embedding(netg.speaking_mode_embeddings)
    modules = list(netg.gblocks)
    params["input_conv"] = wn_conv(modules[0])
    for i, gb in enumerate(modules[1:]):
        params[f"gblock_{i}"] = convert_gblock(gb)
    out_conv = [m for m in netg.last_conv if isinstance(m, torch.nn.Conv1d)][0]
    params["out_conv"] = wn_conv(out_conv)
    return params


def _is_spectral(conv) -> bool:
    return hasattr(conv, "weight_orig")


def _convert_fmap_disc(disc) -> tuple:
    params, spectral = {}, {}
    for j, layer in enumerate(disc.layers):
        if _is_spectral(layer):
            params[f"layer_{j}"], spectral[f"layer_{j}"] = sn_conv(layer)
        else:
            params[f"layer_{j}"] = wn_conv(layer)
    if _is_spectral(disc.output):
        params["output"], spectral["output"] = sn_conv(disc.output)
    else:
        params["output"] = wn_conv(disc.output)
    return params, spectral


def convert_discriminator(netd) -> tuple:
    """Reference Discriminator(Small) ensemble -> (params, spectral) trees."""
    params, spectral = {}, {}
    for disc in netd.multi_pooled_disc:
        period = disc.period
        p, s = _convert_fmap_disc(disc)
        params[f"period_{period}"] = p
        if s:
            spectral[f"period_{period}"] = s
    for i, disc in enumerate(netd.multi_scale_disc):
        p, s = _convert_fmap_disc(disc)
        params[f"scale_{i}"] = p
        if s:
            spectral[f"scale_{i}"] = s
    return params, spectral


def convert_res_block(rb) -> tuple:
    params, stats = {}, {}
    params["conv1"] = plain_conv(rb.conv1)
    params["bn1"], stats["bn1"] = batch_norm(rb.bn1)
    params["conv2"] = plain_conv(rb.conv2)
    params["bn2"], stats["bn2"] = batch_norm(rb.bn2)
    if rb.residual_path is not None:
        params["residual"] = plain_conv(rb.residual_path)
        params["res_norm"], stats["res_norm"] = batch_norm(rb.res_norm)
    return params, stats


def convert_mha(attn) -> dict:
    p = {
        "w_q": jnp.asarray(_np(attn.w_q)),
        "w_k": jnp.asarray(_np(attn.w_k)),
        "w_v": jnp.asarray(_np(attn.w_v)),
        "w_o": jnp.asarray(_np(attn.w_o)),
    }
    if attn.relative_positional is not None:
        emb = _np(attn.relative_positional.embeddings)  # [H, M, d, 1]
        p["relative_positional"] = {"embeddings": jnp.asarray(emb[..., 0])}
    return p


def convert_transformer_layer(layer) -> dict:
    def layer_norm(ln):
        return {"scale": jnp.asarray(_np(ln.weight)),
                "bias": jnp.asarray(_np(ln.bias))}

    return {
        "self_attn": convert_mha(layer.self_attn),
        "linear1": linear(layer.linear1),
        "linear2": linear(layer.linear2),
        "norm1": layer_norm(layer.norm1),
        "norm2": layer_norm(layer.norm2),
    }


def convert_emg_encoder(enc) -> dict:
    """Reference EMGEncoderTransformer -> {'params': ..., 'batch_stats': ...}."""
    params, stats = {}, {}
    for i, rb in enumerate(enc.conv_blocks):
        params[f"res_block_{i}"], stats[f"res_block_{i}"] = convert_res_block(rb)
    params["w_raw_in"] = linear(enc.w_raw_in)
    for i, layer in enumerate(enc.transformer.layers):
        params[f"transformer_{i}"] = convert_transformer_layer(layer)
    params["w_out"] = linear(enc.w_out)
    params["w_aux"] = linear(enc.w_aux)
    return {"params": params, "batch_stats": stats}
