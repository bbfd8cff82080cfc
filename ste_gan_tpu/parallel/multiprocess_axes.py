"""Cross-process pipeline and expert parallelism.

``parallel/multiprocess.py`` proves the fused GAN step's data-parallel /
FSDP / tensor-parallel modes across OS processes. This worker proves the
framework's remaining two parallelism axes — whose collectives have
genuinely different shapes — over a mesh axis that SPANS the process
boundary (gloo on CPU, the transport stand-in for DCN; the identical
GSPMD program rides ICI/DCN on a real pod):

* ``pipeline``: the encoder transformer stack as an 8-stage GPipe ring
  (`parallel/pipeline_parallel.py`) with 4 stages per process — the
  single-hop ``ppermute`` at stage 3→4 and the wrap-around 7→0 cross the
  process boundary every tick, forward and backward (the reverse ring XLA
  derives through ``jax.grad``).
* ``expert``: a ``MoEFeedForward`` block (`models/moe.py`) with its
  expert-stacked weights sharded over an 8-way ``expert`` axis
  (`parallel/expert_parallel.py`), 4 experts per process — the
  dispatch/combine einsum contractions lower to all-to-all-style
  collectives across the processes.

The reference has no distributed execution at all (SURVEY.md §2.3-2.4).
``tests/test_multiprocess_axes.py`` spawns a 2-process fleet per mode and
asserts forward AND gradient equality against the single-process oracle,
plus cross-process replica agreement after the re-replicating all-gather.

Worker CLI (one spawn per process):

    python -m ste_gan_tpu.parallel.multiprocess_axes \
        --coordinator localhost:<port> --num_processes 2 --process_id <i> \
        --mode pipeline --out <dir>
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu.parallel.multiprocess import (flatten_state, initialize,
                                               mesh_barrier)


def _warm_ring(mesh) -> None:
    """Form the gloo contexts the pipeline will use — the per-axis psum
    clique AND the ring's pairwise ppermute channels — with trivial
    collectives while processes are in lockstep (see
    `multiprocess.mesh_barrier` for why: compile skew vs the 30 s gloo
    handshake deadline)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ste_gan_tpu.parallel.pipeline_parallel import STAGE_AXIS

    mesh_barrier(mesh)
    s = mesh.shape[STAGE_AXIS]
    perm = [(i, (i + 1) % s) for i in range(s)]
    x = jax.jit(lambda: jnp.arange(s, dtype=jnp.int32),
                out_shardings=NamedSharding(mesh, P(STAGE_AXIS)))()
    ring = jax.jit(jax.shard_map(
        lambda v: jax.lax.ppermute(v, STAGE_AXIS, perm), mesh=mesh,
        in_specs=P(STAGE_AXIS), out_specs=P(STAGE_AXIS)))
    # The re-replicating identity is itself a warmup: it forms the
    # stage-axis all-gather context the gradient dump will reuse.
    out = jax.jit(lambda v: v,
                  out_shardings=NamedSharding(mesh, P()))(ring(x))
    rolled = np.asarray(out.addressable_data(0))
    want = np.roll(np.arange(s, dtype=np.int32), 1)
    if not np.array_equal(rolled, want):
        raise RuntimeError(f"ring warmup returned {rolled}, want {want}")

# Tiny-but-real geometry shared by the worker and the test oracle.
D_MODEL = 32
HEADS = 4
FF = 64
STAGES = 8          # transformer layers == pipeline stages
MICROBATCHES = 8
BATCH = 16          # pipeline input rows
SEQ = 12
EXPERTS = 8
MOE_B, MOE_T = 4, 8


def pipeline_setup() -> Tuple[Any, Any]:
    """(layer_fn, deterministic init_fn) for the 8-layer stack.

    ``init_fn`` is jit-traceable and seed-deterministic, so every process
    computes identical values on its own devices — the multi-host-safe
    initialisation pattern (no broadcast), same as
    ``multiprocess.run_steps``.
    """
    from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
    from ste_gan_tpu.parallel.pipeline_parallel import (
        stack_stage_params, transformer_stack_layer_fn)

    model = EMGEncoderTransformer(
        model_size=D_MODEL, num_extra_res_blocks=1,
        num_transformer_layers=STAGES, num_heads=HEADS,
        dim_feedforward=FF, dropout=0.0)
    layer_fn = transformer_stack_layer_fn(D_MODEL, HEADS, FF)

    def init_fn():
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16 * 16, 8)), train=False)
        stacked = stack_stage_params(
            [variables["params"][f"transformer_{i}"] for i in range(STAGES)])
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (BATCH, SEQ, D_MODEL), jnp.float32)
        return stacked, x

    return layer_fn, init_fn


def moe_setup() -> Tuple[Any, Any]:
    """(moe module, deterministic init_fn) for the 8-expert block."""
    from ste_gan_tpu.models.moe import MoEFeedForward

    moe = MoEFeedForward(num_experts=EXPERTS, dim_feedforward=FF, top_k=2)

    def init_fn():
        x = jax.random.normal(jax.random.PRNGKey(6),
                              (MOE_B, MOE_T, D_MODEL), jnp.float32)
        params = moe.init(jax.random.PRNGKey(0), x)["params"]
        return params, x

    return moe, init_fn


def run_pipeline(out: Path, process_id: int) -> None:
    """8-stage GPipe ring over all global devices: stages 0-3 live on
    process 0, stages 4-7 on process 1; every ppermute hop between them
    crosses the gloo transport."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ste_gan_tpu.parallel.pipeline_parallel import (STAGE_AXIS,
                                                        create_stage_mesh,
                                                        pipeline_apply)

    mesh = create_stage_mesh(STAGES, devices=jax.devices())  # ALL global
    _warm_ring(mesh)
    layer_fn, init_fn = pipeline_setup()
    rep = NamedSharding(mesh, P())
    stage0 = NamedSharding(mesh, P(STAGE_AXIS))
    abstract_stacked, _ = jax.eval_shape(init_fn)
    stacked, x = jax.jit(
        init_fn,
        out_shardings=(jax.tree.map(lambda _: stage0, abstract_stacked),
                       rep))()

    def fwd(sp, xx):
        return pipeline_apply(layer_fn, sp, xx, mesh, MICROBATCHES)

    def loss_fn(sp, xx):
        return jnp.mean(jnp.square(fwd(sp, xx)))

    y = jax.jit(fwd)(stacked, x)
    grads = jax.jit(jax.grad(loss_fn))(stacked, x)
    # Re-replicate (cross-process all-gather) so every process can dump a
    # full view — agreement between the dumps proves the gather round-trips.
    grads = jax.jit(lambda g: g, out_shardings=rep)(grads)
    _dump(out, process_id, y, grads)


def run_expert(out: Path, process_id: int) -> None:
    """8-way expert sharding over all global devices: experts 0-3 on
    process 0, 4-7 on process 1; dispatch/combine contractions cross the
    gloo transport."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ste_gan_tpu.parallel.expert_parallel import (create_expert_mesh,
                                                      moe_state_shardings)

    mesh = create_expert_mesh(1, EXPERTS, devices=jax.devices())  # ALL
    mesh_barrier(mesh)
    moe, init_fn = moe_setup()
    rep = NamedSharding(mesh, P())
    abstract_params, _ = jax.eval_shape(init_fn)
    # Key the rule on the flax scope it expects ("moe_ffn").
    param_shardings = moe_state_shardings(
        mesh, {"moe_ffn": abstract_params})["moe_ffn"]
    params, x = jax.jit(init_fn, out_shardings=(param_shardings, rep))()

    def fwd(p, xx):
        return moe.apply({"params": p}, xx)

    def loss_fn(p, xx):
        return jnp.mean(jnp.square(fwd(p, xx)))

    y = jax.jit(fwd)(params, x)
    grads = jax.jit(jax.grad(loss_fn))(params, x)
    grads = jax.jit(lambda g: g, out_shardings=rep)(grads)
    _dump(out, process_id, y, grads)


def _dump(out: Path, process_id: int, y, grads) -> None:
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / f"fwd_p{process_id}.npy",
            np.asarray(y.addressable_data(0)))
    np.savez(out / f"grads_p{process_id}.npz", **flatten_state(grads))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--mode", choices=("pipeline", "expert"), required=True)
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    initialize(args.coordinator, args.num_processes, args.process_id)
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    if args.mode == "pipeline":
        run_pipeline(args.out, args.process_id)
    else:
        run_expert(args.out, args.process_id)
    print(f"process {args.process_id}/{args.num_processes}: "
          f"{args.mode} over {jax.device_count()} global devices OK")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
