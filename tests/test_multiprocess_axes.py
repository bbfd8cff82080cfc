"""Cross-process pipeline and expert parallelism: 2 OS processes × 4 CPU
devices running (a) the encoder transformer stack as an 8-stage GPipe ring
whose ppermute hops cross the process boundary every tick, and (b) an
8-expert MoE block whose dispatch/combine contractions cross it, both via
gloo collectives (the multi-host/DCN analogue). Forward AND gradients must
match the single-process sequential / unsharded oracle; both processes
must dump identical full views after the re-replicating all-gather.

Together with `tests/test_multiprocess.py` (DP / FSDP / TP / hybrid on the
fused GAN step) this demonstrates every parallelism axis of the framework
under the actual multi-process runtime, not just in-process GSPMD. The
reference has no distributed execution at all (SURVEY §2.3-2.4).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.parallel.multiprocess_axes import (MICROBATCHES,
                                                    moe_setup,
                                                    pipeline_setup)

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module", params=["pipeline", "expert"])
def worker_outputs(request, tmp_path_factory):
    """Spawn the 2-process fleet once per mode."""
    out = tmp_path_factory.mktemp(f"axes_{request.param}")
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ste_gan_tpu.parallel.multiprocess_axes",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--mode", request.param, "--out", str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, \
            f"{request.param} worker {i} failed:\n{log[-3000:]}"
    return request.param, out


def _oracle(mode):
    """Single-process forward + gradients for the same seeded setup.

    For the pipeline the oracle is the plain sequential layer loop at the
    pipeline's microbatch shape (the semantics `pipeline_apply` promises);
    for MoE it is the unsharded single-device apply.
    """
    if mode == "pipeline":
        layer_fn, init_fn = pipeline_setup()
        stacked, x = jax.jit(init_fn)()
        mb = x.shape[0] // MICROBATCHES
        n_layers = jax.tree.leaves(stacked)[0].shape[0]

        def seq(sp, xx):
            chunks = []
            for i in range(MICROBATCHES):
                h = xx[i * mb:(i + 1) * mb]
                for s in range(n_layers):
                    h = layer_fn(jax.tree.map(lambda p: p[s], sp), h)
                chunks.append(h)
            return jnp.concatenate(chunks, axis=0)

        def loss_fn(sp, xx):
            return jnp.mean(jnp.square(seq(sp, xx)))

        y = jax.jit(seq)(stacked, x)
        grads = jax.jit(jax.grad(loss_fn))(stacked, x)
        return np.asarray(y), grads

    moe, init_fn = moe_setup()
    params, x = jax.jit(init_fn)()

    def loss_fn(p, xx):
        return jnp.mean(jnp.square(moe.apply({"params": p}, xx)))

    y = jax.jit(lambda p, xx: moe.apply({"params": p}, xx))(params, x)
    grads = jax.jit(jax.grad(loss_fn))(params, x)
    return np.asarray(y), grads


class TestMultiProcessAxes:
    def test_forward_and_grads_match_single_process(self, worker_outputs):
        mode, out = worker_outputs
        want_y, want_grads = _oracle(mode)

        got_y = np.load(out / "fwd_p0.npy")
        np.testing.assert_allclose(got_y, want_y, rtol=1e-4, atol=2e-6,
                                   err_msg=f"{mode} forward")

        got = dict(np.load(out / "grads_p0.npz"))
        want = {jax.tree_util.keystr(path): np.asarray(leaf)
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(want_grads)[0]}
        assert set(got) == set(want)
        for key in sorted(want):
            np.testing.assert_allclose(
                got[key], want[key], rtol=1e-3, atol=1e-5,
                err_msg=f"2-process {mode} grads != 1-process at {key}")

    def test_replicas_agree_across_processes(self, worker_outputs):
        """Both processes dump identical full views — the re-replicating
        all-gather (stage/expert shards -> every process) round-trips."""
        _, out = worker_outputs
        np.testing.assert_array_equal(np.load(out / "fwd_p0.npy"),
                                      np.load(out / "fwd_p1.npy"))
        p0 = dict(np.load(out / "grads_p0.npz"))
        p1 = dict(np.load(out / "grads_p1.npz"))
        assert set(p0) == set(p1)
        for key in p0:
            np.testing.assert_array_equal(p0[key], p1[key], err_msg=key)
