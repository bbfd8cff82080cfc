"""Fused grouped 1-D convolution as a Pallas TPU kernel.

Why this exists: the scale discriminators run grouped convs (groups 4/16;
reference: ste_gan/models/discriminator.py:96-119 / the small variant
:47-67), and XLA's TPU lowering of ``feature_group_count`` convolutions
inserts layout-change copies around every such op — measured at ~4 ms of the
~57 ms fused GAN step (PARITY.md). The grouped channel counts are small
(16/32 per group), so any MXU mapping wastes lanes; XLA pays for that waste
*and* for HBM relayout round-trips.

Kernel design (TPU-first, not a translation of anything):

* Input stays in the framework-native channel-last layout ``[B, T, C]`` —
  no relayout enters or leaves the kernel.
* The time stride is folded into lanes **inside VMEM**: a ``[Tpad, C]``
  block reshapes to ``[Tpad/s, s*C]`` (free when C is a lane multiple), so
  every conv tap becomes a contiguous row-shifted lane-slice.
* Groups are processed in *slabs* of ``R = 128 // (Cout/G)`` groups. Per
  slab, an im2col patch matrix ``[Tt, K*R*cg]`` is built from lane slices
  and hits the MXU as ONE matmul against a block-diagonal weight
  ``[K*R*cg, 128]`` — full 128-lane output utilisation at ``R×`` the
  grouped-conv FLOPs (still ``G/R×`` fewer than a dense conv). Off-block
  zeros cost MXU cycles that lane padding would have wasted anyway.
* Backward is two more instances of the same structure (custom VJP):
  ``dx`` is the stride-dilated transposed conv run through the SAME forward
  kernel with flipped/transposed weights; ``dw`` accumulates
  ``patchesᵀ @ dy`` per slab across a sequential (batch, time-tile) grid.

Numerics: operands bf16 (or f32), MXU accumulation f32
(``preferred_element_type``), outputs cast to the requested dtype — the
same contract as ``jax.lax.conv_general_dilated`` under the trainer's
mixed-precision policy.

Falls back to interpret mode off-TPU so correctness tests run on the CPU
mesh.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# Per-slab patch buffer budget (bytes) — sets the output time-tile size.
_PATCH_BUDGET = 4 * 1024 * 1024


class _ConvGeom(NamedTuple):
    """Static conv geometry (hashable: usable as a nondiff custom-vjp arg)."""

    batch: int
    t_in: int
    c_in: int
    k: int
    c_out: int
    stride: int
    pad_l: int
    pad_r: int
    groups: int
    slab_r: int  # groups per slab (R)
    t_out: int
    t_tile: int
    interpret: bool
    out_dtype: str


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_slab_r(c_out: int, groups: int) -> int:
    """Largest R with R | groups and R*og <= 128 (full-lane output slabs)."""
    og = c_out // groups
    r = max(1, _LANES // og)
    while groups % r:
        r -= 1
    return r


def _pick_t_tile(t_out: int, k: int, slab_width: int, itemsize: int) -> int:
    """Output rows per tile such that the patch buffer stays in budget."""
    rows = max(8, _PATCH_BUDGET // max(1, k * slab_width * itemsize))
    rows = 1 << int(math.floor(math.log2(rows)))
    if t_out <= rows:
        return t_out
    # Prefer an exact divisor of t_out to avoid a ragged tail tile; if none
    # exists (odd t_out), fall back to one tile — correctness over budget.
    while rows > 8 and t_out % rows:
        rows //= 2
    return rows if t_out % rows == 0 else t_out


def blockdiag_weights(w: jnp.ndarray, groups: int, slab_r: int) -> jnp.ndarray:
    """[K, cg, Cout] grouped kernel -> [num_slabs, K*R*cg, R*og] block-diag.

    Contraction index order matches the kernel's patch layout: tap-major,
    then group-within-slab, then input channel. Pure jnp (differentiable) so
    ``dw`` flows back through it from the kernel's block-diag cotangent.
    """
    k, cg, c_out = w.shape
    og = c_out // groups
    num_slabs = groups // slab_r
    w6 = w.reshape(k, cg, num_slabs, slab_r, og)
    eye = jnp.eye(slab_r, dtype=w.dtype)
    wb = jnp.einsum("kcsro,rq->skrcqo", w6, eye)
    return wb.reshape(num_slabs, k * slab_r * cg, slab_r * og)


def _win_rows(g: _ConvGeom) -> int:
    """Unfolded input rows one output tile needs (a multiple of stride)."""
    return g.stride * (g.t_tile + (g.k - 1) // g.stride)


def _tile_window(x_ref, g: _ConvGeom) -> jnp.ndarray:
    """Read this tile's input window (ONE dynamic ref read) and fold the
    stride into lanes: [win, C] -> [win/s, s*C]. After this, every conv tap
    is a *static* row/lane slice of the folded value — Mosaic-friendly."""
    t_idx = pl.program_id(1)
    win = _win_rows(g)
    v = x_ref[0, pl.ds(t_idx * (g.t_tile * g.stride), win), :]
    if g.stride == 1:
        return v
    return v.reshape(win // g.stride, g.stride * g.c_in)


def _fill_patches(p_ref, vf: jnp.ndarray, g: _ConvGeom, slab: int) -> None:
    """Write the [t_tile, K*slab_width] im2col block for one slab into the
    VMEM scratch ``p_ref``: tap ``j`` = folded rows [j//s, j//s + t_tile) at
    lane offset ``(j % s) * C + slab_channel_base``. Stores (not a value
    concat) because Mosaic cannot concatenate vectors whose sublane/lane
    offsets disagree."""
    cg = g.c_in // g.groups
    slab_w = g.slab_r * cg
    base = slab * slab_w
    for j in range(g.k):
        r0 = j // g.stride
        c0 = (j % g.stride) * g.c_in + base
        p_ref[:, j * slab_w:(j + 1) * slab_w] = jax.lax.slice(
            vf, (r0, c0), (r0 + g.t_tile, c0 + slab_w))


def _fwd_kernel(x_ref, wb_ref, out_ref, p_ref, *, g: _ConvGeom):
    vf = _tile_window(x_ref, g)
    num_slabs = g.groups // g.slab_r
    lanes = g.slab_r * (g.c_out // g.groups)
    for s in range(num_slabs):
        _fill_patches(p_ref, vf, g, s)
        acc = jnp.dot(p_ref[...], wb_ref[s],
                      preferred_element_type=jnp.float32)
        out_ref[0, :, s * lanes:(s + 1) * lanes] = acc.astype(out_ref.dtype)


def _dw_kernel(x_ref, dy_ref, dwb_ref, p_ref, *, g: _ConvGeom):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    @pl.when(jnp.logical_and(b_idx == 0, t_idx == 0))
    def _():
        dwb_ref[...] = jnp.zeros(dwb_ref.shape, dwb_ref.dtype)

    vf = _tile_window(x_ref, g)
    num_slabs = g.groups // g.slab_r
    lanes = g.slab_r * (g.c_out // g.groups)
    for s in range(num_slabs):
        _fill_patches(p_ref, vf, g, s)
        dy_slab = dy_ref[0, :, s * lanes:(s + 1) * lanes]
        dwb_ref[s] += jax.lax.dot_general(
            p_ref[...], dy_slab, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _pad_time(x: jnp.ndarray, g: _ConvGeom) -> jnp.ndarray:
    """Zero-pad time so the last tile's input window stays in bounds."""
    t_pad_need = (g.t_out // g.t_tile - 1) * g.t_tile * g.stride + _win_rows(g)
    t_pad = _round_up(max(t_pad_need, g.t_in + g.pad_l + g.pad_r), g.stride)
    return jnp.pad(x, ((0, 0), (g.pad_l, t_pad - g.t_in - g.pad_l), (0, 0)))


def _patch_scratch(g: _ConvGeom, dtype):
    slab_w = g.slab_r * (g.c_in // g.groups)
    return pltpu.VMEM((g.t_tile, g.k * slab_w), dtype)


def _run_fwd(x: jnp.ndarray, wb: jnp.ndarray, g: _ConvGeom) -> jnp.ndarray:
    xp = _pad_time(x, g)
    n_t = g.t_out // g.t_tile
    out = pl.pallas_call(
        partial(_fwd_kernel, g=g),
        grid=(g.batch, n_t),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], g.c_in), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wb.shape, lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g.t_tile, g.c_out), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (g.batch, g.t_out, g.c_out), jnp.dtype(g.out_dtype)),
        scratch_shapes=[_patch_scratch(g, xp.dtype)],
        interpret=g.interpret,
    )(xp, wb)
    return out


def _run_dw(x: jnp.ndarray, dy: jnp.ndarray, g: _ConvGeom) -> jnp.ndarray:
    xp = _pad_time(x, g)
    cg = g.c_in // g.groups
    num_slabs = g.groups // g.slab_r
    lanes = g.slab_r * (g.c_out // g.groups)
    n_t = g.t_out // g.t_tile
    dwb = pl.pallas_call(
        partial(_dw_kernel, g=g),
        grid=(g.batch, n_t),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], g.c_in), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g.t_tile, g.c_out), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_slabs, g.k * g.slab_r * cg, lanes), lambda b, t: (0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_slabs, g.k * g.slab_r * cg, lanes), jnp.float32),
        scratch_shapes=[_patch_scratch(g, xp.dtype)],
        interpret=g.interpret,
    )(xp, dy.astype(x.dtype))
    return dwb


def _make_geom(x_shape, w_shape, stride, pad_l, pad_r, groups,
               interpret, out_dtype, t_tile=None) -> _ConvGeom:
    b, t_in, c_in = x_shape
    k, cg, c_out = w_shape
    if cg * groups != c_in:
        raise ValueError(f"kernel in-channels {cg}*{groups} != input {c_in}")
    t_out = (t_in + pad_l + pad_r - k) // stride + 1
    slab_r = _pick_slab_r(c_out, groups)
    if t_tile is None:
        itemsize = jnp.dtype(out_dtype).itemsize
        t_tile = _pick_t_tile(t_out, k, slab_r * cg, itemsize)
    if t_out % t_tile:
        raise ValueError(f"t_out {t_out} not divisible by t_tile {t_tile}")
    return _ConvGeom(b, t_in, c_in, k, c_out, stride, pad_l, pad_r, groups,
                     slab_r, t_out, t_tile, interpret, str(out_dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_core(x, w, g: _ConvGeom):
    return _run_fwd(x, blockdiag_weights(w.astype(x.dtype), g.groups,
                                         g.slab_r), g)


def _conv_core_fwd(x, w, g: _ConvGeom):
    return _conv_core(x, w, g), (x, w)


def _conv_core_bwd(g: _ConvGeom, res, dy):
    x, w = res
    cg = g.c_in // g.groups
    og = g.c_out // g.groups
    num_slabs = g.groups // g.slab_r
    r = g.slab_r

    # --- dw: per-slab patchesᵀ @ dy, then extract the diagonal blocks
    # (the off-diagonal cross-group products are discarded — they are the
    # lane padding any TPU mapping of tiny groups pays anyway). ---
    dwb = _run_dw(x, dy, g)  # [S, K*R*cg, R*og] f32
    dwb6 = dwb.reshape(num_slabs, g.k, r, cg, r, og)
    diag = jnp.arange(r)
    # Advanced indexing pulls the two R axes to the front: [R, S, K, cg, og].
    dw = dwb6[:, :, diag, :, diag, :]
    dw = jnp.transpose(dw, (2, 3, 1, 0, 4))  # [K, cg, S, R, og]
    dw = dw.reshape(g.k, cg, g.c_out)

    # --- dx: transposed conv == the SAME kernel on stride-dilated dy with
    # tap-flipped, in/out-transposed weights (group structure preserved). ---
    w4 = w.reshape(g.k, cg, g.groups, og)
    w_t = jnp.transpose(w4[::-1], (0, 3, 2, 1))  # [K, og, G, cg]
    w_t = w_t.reshape(g.k, og, g.groups * cg)
    # Barrier: XLA's TPU fusion emitter crashes (fusion_emitter.cc
    # window-bounds check) when it fuses this reverse into the dilation
    # scatter below; keep them in separate fusions.
    w_t = jax.lax.optimization_barrier(w_t)

    if g.stride > 1:
        dy_dil = jnp.zeros(
            (g.batch, (g.t_out - 1) * g.stride + 1, g.c_out), dy.dtype)
        dy_dil = dy_dil.at[:, ::g.stride].set(dy)
    else:
        dy_dil = dy
    pad_l = g.k - 1 - g.pad_l
    pad_r = g.t_in + g.k - 1 - pad_l - dy_dil.shape[1]
    assert pad_l >= 0 and pad_r >= 0, (pad_l, pad_r)
    gx = _make_geom(dy_dil.shape, w_t.shape, 1, pad_l, pad_r, g.groups,
                    g.interpret, x.dtype)
    assert gx.t_out == g.t_in, (gx.t_out, g.t_in)
    dx = _conv_core(dy_dil, w_t, gx).astype(x.dtype)
    return dx, dw.astype(w.dtype)


_conv_core.defvjp(_conv_core_fwd, _conv_core_bwd)


def grouped_conv1d(x: jnp.ndarray, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None, *,
                   stride: int = 1,
                   padding: Tuple[int, int] = (0, 0),
                   groups: int = 1,
                   interpret: Optional[bool] = None,
                   t_tile: Optional[int] = None) -> jnp.ndarray:
    """Grouped conv1d over channel-last [B, T, Cin] with kernel
    [K, Cin/groups, Cout] — a drop-in for ``jax.lax.conv_general_dilated``
    with ``feature_group_count=groups`` (NWC/WIO), backed by the Pallas
    kernel above with a custom VJP.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pad_l, pad_r = padding
    g = _make_geom(x.shape, w.shape, stride, pad_l, pad_r, groups,
                   interpret, x.dtype, t_tile)
    y = _conv_core(x, w, g)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def lax_grouped_conv1d(x, w, bias=None, *, stride=1, padding=(0, 0),
                       groups=1):
    """XLA reference implementation (same signature) for tests/benchmarks."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NWC", "WIO", "NWC"))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=(padding,),
        dimension_numbers=dn, feature_group_count=groups)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
