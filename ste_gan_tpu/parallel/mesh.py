"""Device mesh and sharding helpers.

The reference is strictly single-device (no DDP/NCCL anywhere; see SURVEY.md
§2.3-2.4). Here data parallelism is first-class: a 1-D ``data`` mesh, batches
sharded on their leading axis, parameters replicated, and the fused train
step jit-compiled over the mesh so XLA inserts the gradient all-reduces over
ICI. The mesh keeps a named axis so tensor/sequence-parallel axes can be
added later without touching call sites.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(data_parallel: int = -1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``data_parallel`` devices
    (all local devices when <= 0)."""
    devices = list(devices if devices is not None else jax.devices())
    n = data_parallel if data_parallel > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def place_batch_leaves(batch: Any, sharded: NamedSharding,
                       replicated: NamedSharding, data_size: int) -> Any:
    """device_put every array leaf under ``sharded`` when its leading axis
    divides ``data_size``, else under ``replicated`` (e.g. a short
    validation batch — correct, just not parallelised). Non-array leaves
    (None, strings) pass through untouched. Shared by the 1-D and 2-D
    batch-placement helpers so the leaf-walking rules stay in one place."""

    def put(leaf):
        if leaf is None or not hasattr(leaf, "shape"):
            return leaf
        ok = leaf.ndim > 0 and leaf.shape[0] % data_size == 0
        return jax.device_put(leaf, sharded if ok else replicated)

    return jax.tree.map(put, batch)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put every array leaf with its batch axis sharded over ``data``."""
    return place_batch_leaves(batch, batch_sharding(mesh),
                              replicate_sharding(mesh), mesh.size)


def constrain_batch(mesh: Mesh, batch: Any) -> Any:
    """In-jit analogue of :func:`shard_batch`: apply
    ``with_sharding_constraint`` over the ``data`` axis to every array leaf
    whose leading axis divides the data-axis size (others replicate). Used
    where a batch is CONSTRUCTED inside the jitted program — e.g. the
    device-resident fold — so GSPMD partitions the downstream loss instead
    of falling back to whatever the gather propagation chose. Works on both
    the 1-D ``(data,)`` and 2-D ``(data, model)`` meshes (leaves replicate
    over any other axes)."""
    data_size = mesh.shape[DATA_AXIS]
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    def constrain(leaf):
        if leaf is None or not hasattr(leaf, "shape"):
            return leaf
        ok = leaf.ndim > 0 and leaf.shape[0] % data_size == 0
        return jax.lax.with_sharding_constraint(
            leaf, sharded if ok else replicated)

    return jax.tree.map(constrain, batch)


def largest_divisor_mesh_size(batch_size: int, requested: int) -> int:
    """Largest mesh size <= requested that divides the global batch."""
    n = max(1, min(requested, batch_size))
    while batch_size % n:
        n -= 1
    return n


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sharding), tree)
