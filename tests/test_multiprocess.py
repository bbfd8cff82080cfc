"""True multi-process data parallelism: 2 OS processes × 4 CPU devices
running the fused GAN step over one global mesh (gloo cross-process
collectives — the multi-host/DCN analogue) reproduce the single-process
8-device trajectory, in plain-DP mode, with the persistent train state
FSDP-sharded ACROSS the processes (multi-host ZeRO-3), with parameters
tensor-parallel-sharded over a 2-D (data, model) mesh (TP within each
process, DP across them — the standard pod layout), and with both
composed (hybrid FSDP × TP).

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


# Plain DP and FSDP keep the math bit-for-bit (same per-device reduction
# shapes as the oracle); TP re-orders the model-axis reductions, so those
# modes match at the same tolerances as the in-process TP trajectory test
# (`tests/test_tensor_parallel.py`).
MODE_FLAGS = {"dp": [], "fsdp": ["--fsdp"], "tp": ["--model_parallel", "2"],
              "fsdp_tp": ["--fsdp", "--model_parallel", "2"]}
MODE_TOL = {"dp": dict(rtol=2e-5, atol=2e-6),
            "fsdp": dict(rtol=2e-5, atol=2e-6),
            "tp": dict(rtol=2e-3, atol=1e-5),
            "fsdp_tp": dict(rtol=2e-3, atol=1e-5)}


@pytest.fixture(scope="module", params=list(MODE_FLAGS))
def worker_outputs(request, tmp_path_factory):
    """Spawn the 2-process worker fleet once per mode."""
    out = tmp_path_factory.mktemp(f"mp_{request.param}")
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ste_gan_tpu.parallel.multiprocess",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--steps", str(N_STEPS), "--out", str(out)]
            + MODE_FLAGS[request.param],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, \
            f"{request.param} worker {i} failed:\n{log[-3000:]}"
    return request.param, out


class TestMultiProcess:
    def test_two_processes_match_single_process(self, worker_outputs,
                                                oracle):
        mode, out = worker_outputs
        want, want_hist = oracle
        got = dict(np.load(out / "state_p0.npz"))
        assert set(got) == set(want)
        for key in want:
            np.testing.assert_allclose(
                got[key], want[key], **MODE_TOL[mode],
                err_msg=f"2-process {mode} != 1-process at {key}")

        loss_tol = 1e-4 if mode in ("dp", "fsdp") else 5e-2
        got_hist = json.loads((out / "history_p0.json").read_text())
        for h_got, h_want in zip(got_hist, want_hist):
            assert abs(h_got["G"] - h_want["G"]) < loss_tol
            assert abs(h_got["D"] - h_want["D"]) < loss_tol

    def test_replicas_agree_across_processes(self, worker_outputs):
        """Both processes must hold identical final state — the invariant
        multi-host checkpointing relies on (exact in DP; in FSDP/TP each
        process re-gathers the other's shards, so agreement additionally
        proves the cross-process all-gather round-trips)."""
        _, out = worker_outputs
        p0 = dict(np.load(out / "state_p0.npz"))
        p1 = dict(np.load(out / "state_p1.npz"))
        assert set(p0) == set(p1)
        for key in p0:
            np.testing.assert_array_equal(p0[key], p1[key], err_msg=key)
