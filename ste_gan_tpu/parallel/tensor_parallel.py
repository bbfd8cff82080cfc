"""Tensor parallelism: a 2-D ``(data, model)`` mesh with GSPMD sharding rules.

The reference is strictly single-device (SURVEY.md §2.3: no DDP/NCCL
anywhere), and at this model scale (~35M params) tensor parallelism is not
*required* — data parallelism alone replicates comfortably. This module is
the scaling layer above that: it lets the same fused train step
(``train/gan.py``) run with every large parameter tensor **sharded over a
second mesh axis**, so the framework's memory ceiling and per-device matmul
shapes scale past pure DP without touching model or step code.

The mechanism is the canonical XLA/GSPMD recipe (the "How to Scale Your
Model" loop): pick a mesh, annotate shardings on the *inputs* (parameters,
optimizer states, batch), and let the SPMD partitioner propagate shardings
through the unchanged program and insert the all-gathers / reduce-scatters
over ICI. Concretely:

* every parameter leaf whose trailing axis (the output-channel / feature
  axis in this codebase's channel-last layout) divides the ``model`` axis
  size is sharded on that axis — conv kernels ``[*k, in, out]`` split into
  per-device output-channel slabs, biases / weight-norm ``g`` vectors split
  alike, so a WNConv's per-output-channel ``g * v / ||v||`` reparameterisation
  stays local to the shard;
* both AdamW optimizer states follow automatically: their ``mu``/``nu``
  leaves mirror parameter shapes, so the same rule places them consistently
  and the optimizer update stays fully local (no collective cost);
* small / indivisible leaves (scalars, spectral-norm power-iteration
  vectors, odd-sized heads) stay replicated — correctness never depends on
  the rule's choices, only the partitioning does;
* the batch shards over ``data`` exactly as in the 1-D mesh.

Semantics are unchanged by construction — GSPMD partitions the same XLA
program — which the tests assert by trajectory equality against the
single-device step (``tests/test_tensor_parallel.py``).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ste_gan_tpu.parallel.mesh import DATA_AXIS, place_batch_leaves

MODEL_AXIS = "model"


def create_mesh_2d(data_parallel: int, model_parallel: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """``(data, model)`` mesh over the first ``data*model`` devices.

    ``data_parallel <= 0`` means "whatever is left after the model axis"
    (all local devices / model_parallel).
    """
    devices = list(devices if devices is not None else jax.devices())
    if model_parallel <= 0:
        raise ValueError("model_parallel must be positive")
    if data_parallel <= 0:
        data_parallel = max(1, len(devices) // model_parallel)
    n = data_parallel * model_parallel
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def leaf_partition_spec(leaf: Any, model_size: int) -> P:
    """Sharding rule for one state leaf: shard the trailing axis over
    ``model`` when it divides evenly and is large enough to be worth
    splitting; otherwise replicate.

    The trailing axis is the output-channel / feature axis everywhere in
    this codebase (conv kernels ``[*k, in, out]``, biases ``[out]``,
    weight-norm ``g`` ``[out]``, dense kernels ``[in, out]``, embeddings
    ``[vocab, dim]``), so this one rule gives classic output-sharded tensor
    parallelism across the whole model, and applies identically to the
    optimizer-moment leaves that mirror those shapes.
    """
    shape = getattr(leaf, "shape", None)
    if not shape:  # scalars, None, non-arrays
        return P()
    last = shape[-1]
    # Below 2 elements per shard the split costs more than it frees.
    if last % model_size or last < 2 * model_size:
        return P()
    return P(*([None] * (len(shape) - 1)), MODEL_AXIS)


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree for a train-state pytree under ``mesh``."""
    model = _model_axis_size(mesh)
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, leaf_partition_spec(leaf, model)),
        tree)


def shard_state(mesh: Mesh, tree: Any) -> Any:
    """Place a state pytree (params + optimizer states + spectral vectors)
    onto the mesh under the tensor-parallel rule."""
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s) if hasattr(leaf, "shape")
        else leaf,
        tree, state_shardings(mesh, tree))


def shard_batch_2d(mesh: Mesh, batch: Any) -> Any:
    """Shard the leading (batch) axis over ``data`` only; every model-axis
    replica sees the full local batch. Indivisible leaves replicate."""
    return place_batch_leaves(
        batch, NamedSharding(mesh, P(DATA_AXIS)), NamedSharding(mesh, P()),
        mesh.shape[DATA_AXIS])


def sharding_summary(tree: Any, mesh: Mesh) -> Tuple[int, int, int]:
    """(sharded_params, replicated_params, total_leaves) under the rule —
    for logging how much of the model the ``model`` axis actually splits."""
    model = _model_axis_size(mesh)
    sharded = replicated = leaves = 0
    for leaf in jax.tree.leaves(tree):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            continue
        leaves += 1
        n = int(np.prod(shape)) if shape else 1
        if leaf_partition_spec(leaf, model) == P():
            replicated += n
        else:
            sharded += n
    return sharded, replicated, leaves
