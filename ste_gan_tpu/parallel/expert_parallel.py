"""Expert parallelism: shard MoE expert weights over an ``expert`` mesh axis.

Completes the framework's parallelism axes (data / tensor / sequence /
pipeline / expert); the reference is strictly single-device (SURVEY.md
§2.3). Pairs with ``models/moe.py``: its expert-stacked FFN weights
``[E, ...]`` shard on their leading axis, and because the MoE block is
written as plain einsums over that axis, GSPMD partitions the unchanged
program — each device holds and runs only its experts, with the
dispatch/combine contractions lowering to all-to-all-style collectives
over ICI. Semantics are unchanged by construction; equality with the
single-device forward is asserted in ``tests/test_moe.py``.

Mechanism mirrors ``parallel/tensor_parallel.py``: a named mesh axis, one
pytree-path sharding rule applied to parameters AND the mirrored optimizer
moments, small/indivisible leaves replicated.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ste_gan_tpu.parallel.mesh import DATA_AXIS

EXPERT_AXIS = "expert"
# Module name flax gives MoE blocks (models/transformer.py names the block
# "moe_ffn"); the path rule keys on it so an unrelated leaf that happens to
# have a matching leading dim is never sharded by accident.
_MOE_SCOPE = "moe_ffn"


def create_expert_mesh(data_parallel: int, expert_parallel: int,
                       devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """``(data, expert)`` mesh over the first ``data*expert`` devices.

    ``data_parallel <= 0`` means "whatever is left after the expert axis".
    """
    devices = list(devices if devices is not None else jax.devices())
    if expert_parallel <= 0:
        raise ValueError("expert_parallel must be positive")
    if data_parallel <= 0:
        data_parallel = max(1, len(devices) // expert_parallel)
    n = data_parallel * expert_parallel
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data_parallel, expert_parallel)
    return Mesh(grid, (DATA_AXIS, EXPERT_AXIS))


def _is_expert_leaf(path, leaf, expert_size: int) -> bool:
    shape = getattr(leaf, "shape", None)
    if not shape or len(shape) < 2:
        return False
    if shape[0] % expert_size:
        return False
    names = [str(getattr(p, "key", p)) for p in path]
    # The router [D, E] is token-side, not expert-stacked — its leading dim
    # is d_model, which can coincidentally divide the expert axis.
    if names and names[-1] == "router":
        return False
    return any(_MOE_SCOPE in n for n in names)


def moe_state_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree: expert-stacked leaves under a ``moe_ffn``
    module shard their leading (expert) axis over ``expert``; everything
    else replicates. Applies identically to optimizer moments because they
    mirror the parameter tree's paths and shapes."""
    expert_size = mesh.shape.get(EXPERT_AXIS, 1)

    def spec(path, leaf):
        if _is_expert_leaf(path, leaf, expert_size):
            ndim = len(leaf.shape)
            return NamedSharding(mesh, P(EXPERT_AXIS, *([None] * (ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_moe_state(mesh: Mesh, tree: Any) -> Any:
    """Place a params/optimizer pytree onto the mesh under the rule."""
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s) if hasattr(leaf, "shape")
        else leaf,
        tree, moe_state_shardings(mesh, tree))
