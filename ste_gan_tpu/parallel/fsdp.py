"""Fully-sharded data parallelism (FSDP / ZeRO-3 analogue) over ``data``.

The reference is strictly single-device (SURVEY.md §2.3: no DDP, no ZeRO,
no NCCL anywhere), and at this model scale (~35M params) plain data
parallelism replicates comfortably. This module removes the replication
ceiling anyway: with FSDP the *data-parallel axis itself* also shards every
large parameter and both AdamW moment trees, so per-device state memory
falls ~1/``data`` while the batch math is unchanged. It completes the
framework's scaling matrix — DP (mesh.py), TP (tensor_parallel.py), SP
(sequence_parallel.py), PP (pipeline_parallel.py), EP (expert_parallel.py),
and FSDP here — all through the same mesh recipe.

Mechanism — gather-at-step-entry through ``shard_map``: every persistent
state leaf (parameters, both AdamW moment trees, spectral-norm state) is
STORED sharded over the ``data`` mesh axis on its largest evenly-divisible
dimension. At step entry a ``shard_map`` all-gathers each sharded leaf back
to its compute layout (replicated over ``data``, still sharded over
``model`` on a hybrid mesh), the UNCHANGED fused train step runs on the
gathered trees exactly as in plain DP, and a second ``shard_map`` re-slices
the updated state so each device keeps only its slab. Between steps — the
entire residency of the training state in HBM — per-device state memory is
~1/``data`` of the replicated layout; the full trees exist only transiently
inside the step. Semantics are unchanged by construction (gather/slice only
move data), which ``tests/test_fsdp.py`` asserts by full-pytree trajectory
equality against single-device execution.

Why ``shard_map`` instead of ``with_sharding_constraint``? Two XLA SPMD
partitioner limitations, both measured on the 8-device CPU mesh:

* The implicit per-layer formulation (annotate state shardings, let GSPMD
  insert per-use all-gathers) CHECK-fails in ``convolution_handler.cc:983``
  (``new_input_batch_size % new_output_batch_size``) whenever a conv
  kernel is sharded on the SAME mesh axis as the activations' batch dim —
  the partitioner attempts a grouped-batch dot partition instead of
  replicating the kernel operand and dies during compilation.
* The explicit-constraint formulation (constrain compute trees replicated
  at entry, constrain outputs sharded at exit) dies the same way: GSPMD
  propagates the OUTPUT constraints backwards through the AdamW update
  into the discriminator kernel-gradient convolutions (grouped / 2-D
  convs whose kernel-grad lowers to a batch-group-count conv), and
  ``jax.lax.optimization_barrier`` does not stop sharding propagation.

``shard_map`` in/out specs are hard boundaries for sharding propagation:
the inner step's parameter inputs are anchored to the compute layout and
its state outputs to the storage layout, so no convolution in the program
ever sees a ``data``-sharded kernel, and the partitioner never enters the
conv-grouping path.

Composition: on a 2-D ``(data, model)`` mesh the tensor-parallel rule
(trailing / output-channel axis over ``model``) applies first and FSDP
shards the best *remaining* axis over ``data`` — the classic hybrid
"FSDP x TP" layout, e.g. a conv kernel ``[k, in, out]`` becomes
``P(None, 'data', 'model')``. Leaves with no eligible remaining axis
(scalars, short vectors, spectral-norm power-iteration state) replicate
over ``data`` exactly as before — the rule only changes placement, never
values.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ste_gan_tpu.parallel.mesh import DATA_AXIS
from ste_gan_tpu.parallel.tensor_parallel import (
    MODEL_AXIS, leaf_partition_spec)


def _model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


def fsdp_partition_spec(leaf: Any, data_size: int, model_size: int = 1) -> P:
    """Storage sharding rule for one state leaf under FSDP (optionally
    hybrid with tensor parallelism).

    Start from the tensor-parallel spec (trailing axis over ``model`` when
    ``model_size > 1``), then shard the LARGEST remaining axis over
    ``data`` when it divides evenly and leaves at least 2 elements per
    shard. Largest-axis choice maximises the memory each leaf sheds;
    ineligible leaves keep their TP spec (possibly fully replicated) —
    correctness never depends on the rule's choices.
    """
    shape = getattr(leaf, "shape", None)
    if not shape:  # scalars, None, non-arrays
        return P()
    base = list(_compute_spec(leaf, model_size))
    if len(base) < len(shape):  # leaf_partition_spec returned P()
        base = [None] * len(shape)
    if data_size > 1:
        candidates = [(dim, i) for i, dim in enumerate(shape)
                      if base[i] is None
                      and dim % data_size == 0 and dim >= 2 * data_size]
        if candidates:
            # max() on (size, index) prefers the largest axis; for ties the
            # LAST such axis (feature-like in this codebase's layouts).
            _, axis = max(candidates)
            base[axis] = DATA_AXIS
    if all(entry is None for entry in base):
        return P()
    return P(*base)


def _compute_spec(leaf: Any, model_size: int) -> P:
    """COMPUTE-layout spec: replicated over ``data``, tensor-parallel over
    ``model`` on a hybrid mesh (the layout plain DP / TP training uses)."""
    shape = getattr(leaf, "shape", None)
    if not shape or model_size <= 1:
        return P()
    return leaf_partition_spec(leaf, model_size)


def _storage_specs(mesh: Mesh, tree: Any) -> Any:
    data = mesh.shape[DATA_AXIS]
    model = _model_axis_size(mesh)
    return jax.tree.map(
        lambda leaf: fsdp_partition_spec(leaf, data, model), tree)


def _compute_specs(mesh: Mesh, tree: Any) -> Any:
    model = _model_axis_size(mesh)
    return jax.tree.map(lambda leaf: _compute_spec(leaf, model), tree)


def fsdp_state_shardings(mesh: Mesh, tree: Any) -> Any:
    """NamedSharding pytree for a train-state pytree under the FSDP rule."""
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        _storage_specs(mesh, tree))


def fsdp_shard_state(mesh: Mesh, tree: Any) -> Any:
    """Place a state pytree (params + optimizer states + spectral vectors)
    onto the mesh fully sharded over ``data`` (and ``model`` when the mesh
    has that axis)."""
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s) if hasattr(leaf, "shape")
        else leaf,
        tree, fsdp_state_shardings(mesh, tree))


def _data_axis_of(spec: P) -> int:
    return list(spec).index(DATA_AXIS)


def fsdp_gather_tree(mesh: Mesh, tree: Any) -> Any:
    """In-jit: move a tree from STORAGE layout (FSDP-sharded over ``data``)
    to COMPUTE layout (replicated over ``data``; still sharded over
    ``model`` on a hybrid mesh) — one explicit ``all_gather`` per sharded
    leaf, inside a ``shard_map`` so the boundary shardings are exact and
    GSPMD propagation cannot leak the storage layout into the compute
    program."""
    storage = _storage_specs(mesh, tree)
    compute = _compute_specs(mesh, tree)

    def gather(t):
        def leaf_gather(x, s_spec):
            if not hasattr(x, "shape") or DATA_AXIS not in s_spec:
                return x
            return jax.lax.all_gather(x, DATA_AXIS,
                                      axis=_data_axis_of(s_spec), tiled=True)
        return jax.tree.map(leaf_gather, t, storage)

    # check_vma=False: the checker cannot prove all_gather outputs
    # replicated; trajectory-equality tests cover the semantics.
    return jax.shard_map(gather, mesh=mesh, in_specs=(storage,),
                         out_specs=compute, check_vma=False)(tree)


def fsdp_scatter_tree(mesh: Mesh, tree: Any) -> Any:
    """In-jit: move a tree from COMPUTE layout back to STORAGE layout —
    each device keeps only its slab of every sharded leaf (a local slice,
    no communication), so the step's output state leaves the program
    FSDP-sharded and the next dispatch re-enters with no host resharding."""
    storage = _storage_specs(mesh, tree)
    compute = _compute_specs(mesh, tree)
    data = mesh.shape[DATA_AXIS]

    def scatter(t):
        idx = jax.lax.axis_index(DATA_AXIS)

        def leaf_slice(x, s_spec):
            if not hasattr(x, "shape") or DATA_AXIS not in s_spec:
                return x
            axis = _data_axis_of(s_spec)
            size = x.shape[axis] // data
            return jax.lax.dynamic_slice_in_dim(x, idx * size, size, axis)
        return jax.tree.map(leaf_slice, t, storage)

    return jax.shard_map(scatter, mesh=mesh, in_specs=(compute,),
                         out_specs=storage, check_vma=False)(tree)


def fsdp_wrap_gan_step(inner_step, mesh: Mesh):
    """Wrap the fused GAN train step (``train/gan.py::make_train_step``)
    for FSDP-sharded state: gather the FULL train state (params, spectral
    vectors, both AdamW moment trees) and the frozen encoder to compute
    layout at entry, run the unchanged step, re-slice the updated state
    back to storage layout. The metrics dict passes through untouched."""

    def step(state, batch, encoder_variables):
        state = fsdp_gather_tree(mesh, state)
        new_state, metrics = inner_step(
            state, batch, fsdp_gather_tree(mesh, encoder_variables))
        return fsdp_scatter_tree(mesh, new_state), metrics

    return step


def fsdp_wrap_eval_step(inner_eval, mesh: Mesh):
    """Same gather treatment for the jitted validation step (generator
    params + frozen encoder are its only parameter inputs)."""

    def eval_step(gen_params, batch, encoder_variables):
        return inner_eval(fsdp_gather_tree(mesh, gen_params), batch,
                          fsdp_gather_tree(mesh, encoder_variables))

    return eval_step


def fsdp_sharding_summary(tree: Any, mesh: Mesh) -> Tuple[int, int, int]:
    """(sharded_params, replicated_params, total_leaves) under the FSDP
    rule — for logging how much state the ``data`` axis actually splits."""
    data = mesh.shape[DATA_AXIS]
    model = _model_axis_size(mesh)
    sharded = replicated = leaves = 0
    for leaf in jax.tree.leaves(tree):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            continue
        leaves += 1
        n = int(np.prod(shape)) if shape else 1
        spec = fsdp_partition_spec(leaf, data, model)
        if DATA_AXIS in spec:
            sharded += n
        else:
            replicated += n
    return sharded, replicated, leaves
