"""True multi-process data parallelism: 2 OS processes × 4 CPU devices
running the fused GAN step over one global mesh (gloo cross-process
collectives — the multi-host/DCN analogue) reproduce the single-process
8-device trajectory, in plain-DP mode AND with the persistent train state
FSDP-sharded ACROSS the processes (multi-host ZeRO-3).

The reference has no distributed execution at all (SURVEY §2.3-2.4); the
in-process mesh tests (`tests/test_train_step.py`,
`tests/test_multidevice_trajectory.py`, `tests/test_fsdp.py`) cover GSPMD
semantics — this file covers the actual multi-process runtime: rendezvous,
cross-process collective transport, per-process batch contribution
(`jax.make_array_from_process_local_data`), and replica agreement.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu.parallel.mesh import create_mesh
from ste_gan_tpu.parallel.multiprocess import (flatten_state, run_steps,
                                               tiny_setup)

REPO = Path(__file__).resolve().parents[1]
N_STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def oracle():
    """Single-process 8-device plain-DP trajectory (the semantics both
    multi-process modes must reproduce)."""
    cfg, models = tiny_setup()
    state, history = run_steps(create_mesh(8), cfg, models, N_STEPS)
    return flatten_state(state), history


@pytest.fixture(scope="module", params=["dp", "fsdp"])
def worker_outputs(request, tmp_path_factory):
    """Spawn the 2-process worker fleet once per mode."""
    out = tmp_path_factory.mktemp(f"mp_{request.param}")
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    extra = ["--fsdp"] if request.param == "fsdp" else []
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ste_gan_tpu.parallel.multiprocess",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--steps", str(N_STEPS), "--out", str(out)] + extra,
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, \
            f"{request.param} worker {i} failed:\n{log[-3000:]}"
    return out


class TestMultiProcess:
    def test_two_processes_match_single_process(self, worker_outputs,
                                                oracle):
        want, want_hist = oracle
        got = dict(np.load(worker_outputs / "state_p0.npz"))
        assert set(got) == set(want)
        for key in want:
            np.testing.assert_allclose(
                got[key], want[key], rtol=2e-5, atol=2e-6,
                err_msg=f"2-process != 1-process at {key}")

        got_hist = json.loads(
            (worker_outputs / "history_p0.json").read_text())
        for h_got, h_want in zip(got_hist, want_hist):
            assert abs(h_got["G"] - h_want["G"]) < 1e-4
            assert abs(h_got["D"] - h_want["D"]) < 1e-4

    def test_replicas_agree_across_processes(self, worker_outputs):
        """Both processes must hold identical final state — the invariant
        multi-host checkpointing relies on (exact in DP; in FSDP each
        process re-gathers the other's shards, so agreement additionally
        proves the cross-process all-gather round-trips)."""
        p0 = dict(np.load(worker_outputs / "state_p0.npz"))
        p1 = dict(np.load(worker_outputs / "state_p1.npz"))
        assert set(p0) == set(p1)
        for key in p0:
            np.testing.assert_array_equal(p0[key], p1[key], err_msg=key)
