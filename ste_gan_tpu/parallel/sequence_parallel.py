"""Sequence-parallel (time-sharded) generator inference.

The reference never needs long sequences (it chunks/folds everything; see
SURVEY.md §5), so this is a TPU-native *extension*: for very long utterances
the 50 Hz feature axis is sharded across the mesh, each device exchanges
receptive-field halos with its neighbours over ICI (``jax.lax.ppermute``
inside ``shard_map``), runs the full generator on its local window, and
keeps its interior — bit-exact with single-device synthesis because:

* halos cover the generator's receptive field
  (:data:`~ste_gan_tpu.infer.GENERATOR_RECEPTIVE_FIELD_FRAMES`), and
* out-of-range halo frames (the ring wrap-around at the sequence edges) are
  zeroed, which is exactly equivalent to the conv stack's boundary
  zero-padding (same argument as the bucketed-inference masking; the
  right/tail side reuses the generator's ``num_valid_frames`` masking).

Parameters stay replicated; only activations shard — the right layout for a
model this size (~24M params) with an unbounded time axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ste_gan_tpu.infer import GENERATOR_RECEPTIVE_FIELD_FRAMES
from ste_gan_tpu.parallel.mesh import DATA_AXIS


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def synthesize_time_sharded(
    generator,
    params,
    feats: np.ndarray,
    session_idx: int,
    mode_idx: int = 0,
    mesh: Mesh = None,
    context: int = GENERATOR_RECEPTIVE_FIELD_FRAMES,
) -> np.ndarray:
    """[T, D] features -> [upsample*T, C] EMG, with T sharded over the mesh.

    Exact (matches single-device synthesis); requires T >= 1.
    """
    assert mesh is not None, "pass a 1-D mesh (parallel.mesh.create_mesh)"
    axis = DATA_AXIS
    n = mesh.size
    up = generator.upsample_factor
    t = feats.shape[0]
    local_t = _round_up(t, n) // n
    t_pad = local_t * n
    feats_pad = np.zeros((t_pad, feats.shape[-1]), np.float32)
    feats_pad[:t] = feats

    sess = jnp.asarray(session_idx, jnp.int32)
    mode = jnp.asarray(mode_idx, jnp.int32)

    # A halo may span several shards when local_t < context: gather whole
    # neighbour blocks over multiple ring hops, then slice.
    hops = min(-(-context // local_t), n - 1) if n > 1 else 0

    def local_fn(local_feats, sess, mode):
        # local_feats: [local_t, D] shard of the time axis.
        idx = jax.lax.axis_index(axis)

        # Halo exchange over ICI: hop h moves every block h devices to the
        # right (resp. left), so device i accumulates the blocks of
        # i-hops..i-1 (resp. i+1..i+hops).
        left_blocks, right_blocks = [], []
        for hop in range(1, hops + 1):
            to_right = [(i, (i + hop) % n) for i in range(n)]
            to_left = [(i, (i - hop) % n) for i in range(n)]
            left_blocks.insert(0, jax.lax.ppermute(local_feats, axis, to_right))
            right_blocks.append(jax.lax.ppermute(local_feats, axis, to_left))
        pad_shape = (context, local_feats.shape[-1])
        if hops:
            left_halo = jnp.concatenate(left_blocks, axis=0)[-context:]
            right_halo = jnp.concatenate(right_blocks, axis=0)[:context]
            # When hops*local_t < context (tiny shards), the uncovered far
            # positions lie outside [0, t) and are masked below — pad on the
            # far side to keep global alignment of the window.
            if left_halo.shape[0] < context:
                short = context - left_halo.shape[0]
                left_halo = jnp.concatenate(
                    [jnp.zeros((short, pad_shape[1]), local_feats.dtype),
                     left_halo], axis=0)
                right_halo = jnp.concatenate(
                    [right_halo,
                     jnp.zeros((short, pad_shape[1]), local_feats.dtype)], axis=0)
        else:
            left_halo = jnp.zeros(pad_shape, local_feats.dtype)
            right_halo = jnp.zeros(pad_shape, local_feats.dtype)
        window = jnp.concatenate([left_halo, local_feats, right_halo], axis=0)

        # Validity within this window in *global* terms: frames at global
        # position < 0 (device 0's wrap-around left halo) or >= t (the last
        # devices' wrap-around right halo + round-up padding) are masked
        # inside the generator — activation-level masking, exactly
        # equivalent to the conv stack's boundary zero-padding.
        start = idx * local_t - context
        num_valid = jnp.clip(t - start, 0, window.shape[0])
        valid_start = jnp.clip(-start, 0, window.shape[0])

        emg = generator.apply(
            {"params": params}, window[None], sess[None], mode[None],
            num_valid_frames=num_valid, valid_start_frames=valid_start)[0]
        return emg[context * up:(context + local_t) * up]

    shard = NamedSharding(mesh, P(axis, None))
    feats_sharded = jax.device_put(jnp.asarray(feats_pad), shard)

    fn = jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(axis, None),
    ))
    out = fn(feats_sharded, sess, mode)
    return np.asarray(out)[: up * t]
