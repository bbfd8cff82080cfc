"""True multi-process execution of the fused GAN train step.

Everything else in this package scales over the devices of ONE process
(`parallel/mesh.py` 1-D data mesh, 2-D tensor-parallel, FSDP, ...). This
module runs the SAME fused step across multiple OS processes, each owning
a slice of the global device mesh, with cross-process collectives — the
multi-host analogue. On CPU the collectives ride gloo over TCP sockets
(the transport stand-in for DCN); on a real multi-host TPU pod the
identical code rides ICI/DCN, because the program is the same GSPMD
partitioning — only the runtime transport changes.

The reference has no distributed execution of any kind (no DDP /
``init_process_group`` / NCCL anywhere — SURVEY.md §2.3-2.4, verified by
grep); this is a scaling extension, evidenced by
``tests/test_multiprocess.py``: two processes × 4 CPU devices running this
worker produce the same training trajectory as one process × 8 devices.

Worker CLI (spawned once per process by the test, or by a pod launcher):

    python -m ste_gan_tpu.parallel.multiprocess \
        --coordinator localhost:<port> --num_processes 2 --process_id <i> \
        --steps 3 --out <dir>

Each process computes the SAME seeded global batch and contributes only
its local rows (`jax.make_array_from_process_local_data`) — exactly the
per-host sharded-loader contract (`data/loader.py``'s process_index /
process_count slicing).
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                       replicate_sharding)


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the multi-process runtime. Must run before any backend touch.

    On CPU backends the cross-process collective implementation is gloo
    (TCP); the axon TPU plugin in this image ignores ``JAX_PLATFORMS`` so
    the config route pins the platform when the spawner asked for CPU.
    """
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    barrier()


def barrier() -> None:
    """Form the cross-process collective transport with a trivial
    all-reduce while all processes are still in lockstep from
    ``jax.distributed.initialize``.

    Without this, the transport (gloo context on CPU) is first formed at
    the first REAL collective — after each process compiles the full train
    step, where per-process compile skew (e.g. a compilation-cache hit in
    one process and a miss in another) can exceed gloo's 30 s
    connect/key-exchange timeouts and kill the fleet. Once the context
    exists, later collectives block on data, not on handshakes.
    """
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.asarray(devs), ("d",))
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("d"))
    ones = jax.jit(lambda: jnp.ones((len(devs),), jnp.int32),
                   out_shardings=sharding)()
    total = int(jax.jit(jnp.sum)(ones))  # cross-process all-reduce
    if total != len(devs):
        raise RuntimeError(
            f"collective barrier summed {total} over {len(devs)} devices")
    # Also pre-form the per-local-device-column contexts that
    # `multihost_utils.process_allgather` groups (its (processes,
    # local_devices) mesh gathers over 'processes', i.e. one gloo clique
    # per column: (0, 2048), (1, 2049), ...). Orbax's save/restore
    # barriers (`sync_global_processes`) hit those cliques lazily —
    # potentially after minutes of per-process compile skew, exceeding
    # gloo's 30 s handshake deadline. The skew is structural: only
    # process 0 may write persistent-compile-cache entries AND the cache
    # key's accelerator_config hash is process-dependent, so non-primary
    # processes recompile everything, every run. Measured: fleet restarts
    # with --restore_ckpt died at orbax restore's first barrier without
    # this (tests/test_launch.py).
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ste_gan_tpu.barrier")


def mesh_barrier(mesh) -> None:
    """Pre-form the gloo context of every mesh-axis sub-clique with a
    trivial per-axis ``psum`` while all processes are still in lockstep.

    ``barrier`` only forms the all-device context; on a multi-axis mesh
    the per-axis collectives group *different* device subsets (e.g. the
    ``data``-axis groups of a (data, model) mesh stride across processes),
    and each subset's gloo context is otherwise first formed at its first
    real collective — after each process compiles the full train step,
    where per-process compile skew (a compilation-cache hit in one process
    and a miss in another: minutes) exceeds gloo's 30 s key-exchange
    deadline and kills the fleet. Measured: the 2-process TP mode dies
    with ``Gloo context initialization failed: DEADLINE_EXCEEDED`` on the
    data-axis group without this.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    for axis in mesh.axis_names:
        n = mesh.shape[axis]
        if n == 1:
            continue
        ones = jax.jit(lambda n=n: jnp.ones((n,), jnp.int32),
                       out_shardings=NamedSharding(mesh, P(axis)))()
        reduce = jax.jit(jax.shard_map(
            lambda x, axis=axis: jax.lax.psum(x, axis), mesh=mesh,
            in_specs=P(axis), out_specs=P()))
        total = int(reduce(ones)[0])
        if total != n:
            raise RuntimeError(
                f"{axis}-axis barrier summed {total} over {n} devices")


def tiny_setup():
    """Small-but-complete GAN setup (full loss surface, both optimizers,
    spectral norm) shared by the worker and the single-process oracle in
    ``tests/test_multiprocess.py``. Mirrors ``__graft_entry__``'s dryrun
    geometry: chunk 512, 4 sessions, 2+2 discriminators."""
    from ste_gan_tpu.config import Config
    from ste_gan_tpu.models.discriminator import DiscriminatorEnsemble
    from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
    from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
    from ste_gan_tpu.train.gan import GANModels

    cfg = Config()
    cfg.train.chunk_size = 512
    cfg.train.batch_size = 16
    cfg.train.mixed_precision = False
    cfg.data.num_emg_sessions = 4

    models = GANModels(
        generator=EMGGeneratorGanTTS(num_sessions=4, channels=32),
        discriminator=DiscriminatorEnsemble(
            num_multi_pool=2, num_multi_scale=2,
            period_spec_override=((8, 3, 1, 2), (16, 3, 3, 2)),
            scale_spec_override=((8, 15, 1, 1, 7), (16, 5, 2, 4, 2))),
        encoder=EMGEncoderTransformer(
            model_size=32, num_extra_res_blocks=3, num_transformer_layers=1,
            num_heads=4, dim_feedforward=64, dropout=0.0),
    )
    return cfg, models


def _global_batch(mesh, batch_np: dict) -> dict:
    """Host batch -> global arrays sharded over ``data``. Every process
    passes only ITS rows; together they form the global batch (the
    multi-host form of ``mesh.shard_batch``)."""
    sharding = batch_sharding(mesh)
    n = jax.process_count()
    p = jax.process_index()

    def put(leaf):
        rows = leaf.shape[0]
        local = leaf[p * rows // n:(p + 1) * rows // n]
        return jax.make_array_from_process_local_data(sharding, local)

    return {k: put(np.asarray(v)) for k, v in batch_np.items()}


def run_steps(mesh, cfg, models, n_steps: int, seed: int = 0,
              fsdp: bool = False, start_step: int = 0,
              restore_ckpt=None, save_ckpt=None,
              ckpt_every: int = 0, ckpt_dir=None) -> Tuple[Any, list]:
    """Run ``n_steps`` fused GAN steps over ``mesh`` on deterministic
    seeded batches. Works identically single-process (oracle) and
    multi-process (each process holding a device slice): batch ``i`` is
    derived from ``(seed, i)`` only, and every process contributes its
    local rows of each one — so a run restored at ``start_step`` sees
    exactly the batches the uninterrupted run would.

    When ``mesh`` has a ``model`` axis (`create_mesh_2d`), parameters and
    their mirrored optimizer moments shard into output-channel slabs over
    it (`parallel/tensor_parallel.py`). With the row-major device grid the
    ``model`` axis pairs adjacent device IDs, so in a multi-process run TP
    stays *within* each process while ``data`` spans processes — the
    standard pod layout (TP over ICI, DP over DCN); what this mode proves
    is that TP composes with cross-process data parallelism. The batch
    still shards over ``data`` only.

    With ``fsdp=True`` the persistent train state is STORED sharded over
    the ``data`` axis (`parallel/fsdp.py`) — across *processes* in the
    multi-process case, i.e. multi-host ZeRO-3 (on a 2-D mesh: hybrid
    FSDP x TP) — and the returned state is re-replicated at the end so
    callers compare layouts-agnostically.

    ``save_ckpt``/``restore_ckpt`` checkpoint the train state through
    orbax in its STORAGE layout: in a multi-process run each process
    writes/reads only its addressable shards (the multi-host checkpoint
    protocol — orbax coordinates the commit over `jax.distributed`), and a
    checkpoint is restorable under any topology whose mesh the caller
    passes — 2-process FSDP -> 1-process replicated and back (the
    writer topology is not baked into the artifact).

    ``ckpt_every``/``ckpt_dir`` additionally checkpoint DURING the run, to
    ``ckpt_dir/step_{k}`` after every ``ckpt_every``-th step, marking each
    completed save with a ``step_{k}.done`` sentinel (written by process 0
    only after orbax's cross-process commit finishes) — the recovery
    points `parallel/launch.py`'s supervisor restarts a crashed fleet
    from. Because batch ``i`` depends only on ``(seed, i)``, redoing the
    steps after the last checkpoint is exact, not approximate.

    Fault injection (tests only): ``STE_MP_CRASH="<step>:<proc>:<flag>"``
    hard-kills process ``<proc>`` (``os._exit``) just before step
    ``<step>``, creating ``<flag>`` first so the injection disarms itself
    across restarts.
    """
    from ste_gan_tpu import constants as C
    from ste_gan_tpu.train.gan import init_state, make_train_step

    mesh_barrier(mesh)  # form per-axis gloo cliques before any big compile
    rep = replicate_sharding(mesh)
    rng = jax.random.PRNGKey(seed)

    def init_fn():
        return (init_state(cfg, models, rng),
                models.encoder.init(
                    rng, jnp.zeros((1, cfg.train.chunk_size, 8)),
                    train=False))

    # Build the state/encoder ON the mesh. out_shardings places every leaf
    # (replicated, TP-sharded over `model`, or FSDP-sharded over `data`),
    # and since the computation is deterministic, all processes agree on
    # the values — the multi-host-safe way to initialise without
    # broadcasting.
    abstract = jax.eval_shape(init_fn)
    tp = mesh.shape.get("model", 1) > 1
    if fsdp:
        from ste_gan_tpu.parallel.fsdp import (fsdp_state_shardings,
                                               fsdp_wrap_gan_step)

        out_shardings = fsdp_state_shardings(mesh, abstract)
        raw_step: Any = fsdp_wrap_gan_step(make_train_step(cfg, models),
                                           mesh)
    elif tp:
        from ste_gan_tpu.parallel.tensor_parallel import state_shardings

        out_shardings = state_shardings(mesh, abstract)
        raw_step = make_train_step(cfg, models)
    else:
        out_shardings = jax.tree.map(lambda _: rep, abstract)
        raw_step = make_train_step(cfg, models)
    state, encoder_variables = jax.jit(
        init_fn, out_shardings=out_shardings)()

    if restore_ckpt is not None:
        state = restore_state(restore_ckpt, abstract[0], out_shardings[0])

    b = cfg.train.batch_size
    frames = cfg.train.chunk_size // C.HOPSIZE
    step = jax.jit(raw_step, donate_argnums=0)

    crash = _crash_plan()
    history = []
    for i in range(start_step, start_step + n_steps):
        if crash is not None and i == crash[0] \
                and jax.process_index() == crash[1]:
            import os
            Path(crash[2]).touch()  # disarm before dying
            os._exit(17)
        rng_np = np.random.default_rng((seed, i))
        batch = {
            C.DataType.REAL_EMG: np.tanh(rng_np.normal(
                0, 0.4, (b, cfg.train.chunk_size, 8))).astype(np.float32),
            C.DataType.SPEECH_UNITS: rng_np.normal(
                size=(b, frames, 256)).astype(np.float32),
            C.DataType.PHONEMES: rng_np.integers(
                0, C.NUM_PHONEMES, (b, frames)).astype(np.int32),
            C.DataType.SESSION_INDEX: rng_np.integers(
                0, 4, (b,)).astype(np.int32),
            C.DataType.SPEAKING_MODE_INDEX: np.zeros((b,), np.int32),
        }
        state, metrics = step(state, _global_batch(mesh, batch),
                              encoder_variables)
        jax.block_until_ready(metrics)
        history.append({"G": float(metrics["loss/generator"]),
                        "D": float(metrics["loss/discriminator"])})
        if ckpt_every and ckpt_dir is not None \
                and (i + 1) % ckpt_every == 0:
            tag = Path(ckpt_dir) / f"step_{i + 1}"
            save_state(tag, state)
            if jax.process_index() == 0:
                tag.with_suffix(".done").touch()
    if save_ckpt is not None:
        save_state(save_ckpt, state)
    if fsdp or tp:
        # Re-replicate (an all-gather across processes) so callers see the
        # same layout as plain DP and can compare leaf-for-leaf.
        state = jax.jit(lambda s: s, out_shardings=rep)(state)
    return state, history


def _crash_plan():
    """Parse the ``STE_MP_CRASH`` fault-injection spec (see `run_steps`).
    Returns ``(step, process_id, flag_path)`` while armed, else None —
    the flag file, created by the dying process, disarms the injection
    for restarted fleets."""
    import os

    spec = os.environ.get("STE_MP_CRASH", "")
    if not spec:
        return None
    step, proc, flag = spec.split(":", 2)
    if Path(flag).exists():
        return None
    return int(step), int(proc), flag


def save_state(path, state) -> None:
    """Checkpoint a (possibly cross-process-sharded) train state. Every
    process calls this with the same path; each writes only its
    addressable shards and orbax commits atomically over the
    `jax.distributed` barrier — the multi-host save protocol the
    single-process `train/checkpoint.py` manager does not need."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).resolve(), state, force=True)
    ckptr.wait_until_finished()


def restore_state(path, abstract_state, shardings):
    """Restore a train state INTO the caller's layout (``shardings`` — any
    mesh/topology, independent of the writer's): each process reads only
    the byte ranges backing its shards."""
    import orbax.checkpoint as ocp

    target = jax.tree.map(
        lambda leaf, s: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                             sharding=s),
        abstract_state, shardings)
    return ocp.StandardCheckpointer().restore(Path(path).resolve(), target)


def flatten_state(state) -> dict:
    """Replicated train state -> {path: local numpy} for saving/compare."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    return {jax.tree_util.keystr(path): np.asarray(
        leaf.addressable_data(0) if hasattr(leaf, "addressable_data")
        else leaf) for path, leaf in leaves}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--fsdp", action="store_true",
                    help="store the train state FSDP-sharded over the "
                         "data axis — across processes: multi-host ZeRO-3")
    ap.add_argument("--model_parallel", type=int, default=1,
                    help="size of a `model` mesh axis: params shard into "
                         "output-channel slabs within each process while "
                         "data parallelism spans processes — the standard "
                         "pod layout (composes with --fsdp: hybrid "
                         "FSDP x TP)")
    ap.add_argument("--start_step", type=int, default=0,
                    help="resume point: batch i is seeded by (seed, i)")
    ap.add_argument("--restore_ckpt", type=Path, default=None,
                    help="restore the train state from this orbax "
                         "checkpoint before stepping (any writer topology)")
    ap.add_argument("--save_ckpt", type=Path, default=None,
                    help="checkpoint the final train state here (each "
                         "process writes its addressable shards)")
    ap.add_argument("--ckpt_every", type=int, default=0,
                    help="also checkpoint to --ckpt_dir/step_{k} every k "
                         "steps with a .done sentinel — the recovery "
                         "points the launch supervisor restarts from")
    ap.add_argument("--ckpt_dir", type=Path, default=None)
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    initialize(args.coordinator, args.num_processes, args.process_id)
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    if args.model_parallel > 1:
        from ste_gan_tpu.parallel.tensor_parallel import create_mesh_2d

        mesh = create_mesh_2d(-1, args.model_parallel,
                              devices=jax.devices())  # ALL global devices
    else:
        mesh = create_mesh(devices=jax.devices())  # ALL global devices
    assert jax.process_count() == args.num_processes
    cfg, models = tiny_setup()
    state, history = run_steps(mesh, cfg, models, args.steps,
                               fsdp=args.fsdp, start_step=args.start_step,
                               restore_ckpt=args.restore_ckpt,
                               save_ckpt=args.save_ckpt,
                               ckpt_every=args.ckpt_every,
                               ckpt_dir=args.ckpt_dir)

    args.out.mkdir(parents=True, exist_ok=True)
    # Every process holds a full replica; each writes its own view so the
    # test can also assert cross-process replica agreement.
    np.savez(args.out / f"state_p{args.process_id}.npz",
             **flatten_state(state))
    (args.out / f"history_p{args.process_id}.json").write_text(
        json.dumps(history))
    print(f"process {args.process_id}/{args.num_processes}: "
          f"{args.steps} steps over {jax.device_count()} global devices OK "
          f"(G={history[-1]['G']:.4f})")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
