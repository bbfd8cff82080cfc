"""Pipeline parallelism: GPipe-style staged execution of a homogeneous layer
stack over a ``stage`` mesh axis.

The reference is strictly single-device (SURVEY.md §2.3); like tensor and
sequence parallelism this is a scaling extension the TPU design gets almost
for free. The EMG encoder's dominant compute is its stack of identical
post-norm transformer layers (``models/emg_encoder.py``: six layers at
model_size 768 — reference ste_gan/models/emg_encoder.py:79-90); pipelining
splits that stack into per-device stages so the *depth* dimension scales
past one device's memory/FLOPs without touching layer code.

Mechanism (the canonical JAX/"How to Scale Your Model" pipelining recipe):

* layer parameters are stacked on a leading axis and sharded over
  ``stage`` — each device holds exactly its own stage's weights;
* the batch is split into ``M`` microbatches; inside ``shard_map`` every
  device runs the same ``lax.scan`` over ``M + S - 1`` ticks, applying its
  local layer to whatever sits in its input buffer and handing the result
  to the next stage with a single-hop ``lax.ppermute`` over ICI;
* stage 0 injects microbatch ``t`` at tick ``t``; stage ``S-1`` collects
  microbatch ``t-(S-1)`` at tick ``t``; a final ``psum`` broadcasts the
  collected outputs (zeros elsewhere) so the result is replicated.

Because ``ppermute``/``scan``/``psum`` are differentiable, ``jax.grad``
through :func:`pipeline_apply` yields the sequential stack's gradients —
the backward schedule is the reverse pipeline XLA derives automatically.
Forward equality (ulp-tight at equal microbatch shapes) and gradient
equality vs the plain sequential loop are asserted in
``tests/test_pipeline_parallel.py``.

Bubble economics: utilisation is ``M / (M + S - 1)`` — choose
``M >= 4*S`` for >80%. This module trades that bubble for depth scaling;
it composes with data parallelism over a 2-D ``(data, stage)`` mesh
(:func:`create_stage_mesh_2d`): the per-microbatch batch axis shards over
``data`` while the ring runs over ``stage`` — :func:`pipeline_apply`
detects the extra axis and shards its input/output accordingly.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ste_gan_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"


def create_stage_mesh(num_stages: int,
                      devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D ``stage`` mesh over the first ``num_stages`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_stages > len(devices):
        raise ValueError(
            f"requested {num_stages} stages, have {len(devices)} devices")
    return Mesh(np.asarray(devices[:num_stages]), (STAGE_AXIS,))


def create_stage_mesh_2d(data_parallel: int, num_stages: int,
                         devices: Optional[Sequence[jax.Device]] = None
                         ) -> Mesh:
    """2-D ``(data, stage)`` mesh: each of ``data_parallel`` replicas runs
    the ``num_stages``-deep pipeline on its slice of every microbatch."""
    devices = list(devices if devices is not None else jax.devices())
    n = data_parallel * num_stages
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data_parallel, num_stages)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def stack_stage_params(layer_params: Sequence[Any]) -> Any:
    """Stack per-layer parameter pytrees on a new leading stage axis.

    All layers must share one structure and per-leaf shapes (true for the
    encoder's transformer stack)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def pipeline_apply(layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any, x: jnp.ndarray, mesh: Mesh,
                   num_microbatches: int) -> jnp.ndarray:
    """Apply ``layer_fn`` ``S`` times sequentially (stage ``s`` uses
    ``stacked_params[s]``), executed as an ``S``-stage pipeline over
    ``mesh``'s ``stage`` axis.

    ``layer_fn(params, x_mb) -> y_mb`` must preserve the microbatch shape
    (true for transformer encoder layers). ``x`` is ``[B, ...]`` with
    ``B % num_microbatches == 0``. Semantics are identical to::

        for s in range(S):
            x = layer_fn(params[s], x)

    which the tests assert bit-exactly (fwd) and for gradients.
    """
    num_stages = mesh.shape[STAGE_AXIS]
    batch = x.shape[0]
    if batch % num_microbatches:
        raise ValueError(f"batch {batch} not divisible by "
                         f"num_microbatches {num_microbatches}")
    mb = batch // num_microbatches
    # On a (data, stage) mesh each data replica pipelines its slice of
    # every microbatch; the ring and schedule are unchanged.
    data_size = mesh.shape.get(DATA_AXIS, 1)
    if mb % data_size:
        raise ValueError(f"microbatch size {mb} not divisible by the "
                         f"data axis ({data_size})")
    x_spec = P(None, DATA_AXIS) if data_size > 1 else P()
    x_mb = x.reshape(num_microbatches, mb, *x.shape[1:])
    m, s = num_microbatches, num_stages
    perm = [(i, (i + 1) % s) for i in range(s)]

    def local_fn(params_local, x_all):
        # params_local: this stage's [1, ...] slice; x_all: all microbatches
        # (replicated — stage 0 reads them, other stages ignore them).
        params_local = jax.tree.map(lambda p: p[0], params_local)
        sidx = jax.lax.axis_index(STAGE_AXIS)
        # The carries become stage-varying inside the loop (ppermute /
        # stage-conditional writes); mark the replicated zeros accordingly
        # so scan's carry types match.
        varying = lambda a: jax.lax.pcast(a, (STAGE_AXIS,), to="varying")
        outs0 = varying(jnp.zeros_like(x_all))
        buf0 = varying(jnp.zeros_like(x_all[0]))

        def tick(carry, t):
            buf, outs = carry
            inject = x_all[jnp.clip(t, 0, m - 1)]
            inp = jnp.where(sidx == 0, inject, buf)
            y = layer_fn(params_local, inp)
            # Last stage banks microbatch t-(s-1) once it's real.
            oidx = jnp.clip(t - (s - 1), 0, m - 1)
            take = jnp.logical_and(sidx == s - 1, t >= s - 1)
            outs = outs.at[oidx].set(jnp.where(take, y, outs[oidx]))
            buf = jax.lax.ppermute(y, STAGE_AXIS, perm)
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                    jnp.arange(m + s - 1))
        # Replicate the last stage's collected outputs to every stage.
        return jax.lax.psum(
            jnp.where(sidx == s - 1, outs, jnp.zeros_like(outs)), STAGE_AXIS)

    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(P(STAGE_AXIS), x_spec), out_specs=x_spec)
    stacked_params = jax.device_put(
        stacked_params, NamedSharding(mesh, P(STAGE_AXIS)))
    out = fn(stacked_params, x_mb)
    return out.reshape(batch, *x.shape[1:])


def transformer_stack_layer_fn(d_model: int, num_heads: int,
                               dim_feedforward: int,
                               relative_positional_distance: int = 100,
                               dtype: Any = jnp.float32) -> Callable:
    """``layer_fn`` for :func:`pipeline_apply` that applies one of the EMG
    encoder's post-norm transformer layers (models/transformer.py) in eval
    mode — stage ``s`` runs layer ``s`` of the stack."""
    from ste_gan_tpu.models.transformer import TransformerEncoderLayer

    layer = TransformerEncoderLayer(
        d_model=d_model, num_heads=num_heads,
        dim_feedforward=dim_feedforward, dropout=0.0,
        relative_positional=True,
        relative_positional_distance=relative_positional_distance,
        dtype=dtype)

    def layer_fn(params, x):
        return layer.apply({"params": params}, x, train=False)

    return layer_fn


def encoder_transformer_params(variables: Any, num_layers: int) -> Any:
    """Stack the ``transformer_{i}`` parameter subtrees of an
    ``EMGEncoderTransformer`` variable collection for pipelining."""
    return stack_stage_params(
        [variables["params"][f"transformer_{i}"] for i in range(num_layers)])
