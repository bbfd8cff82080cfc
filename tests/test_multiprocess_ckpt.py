"""Multi-host checkpointing: a 2-process fleet with the train state
FSDP-sharded ACROSS the processes saves an orbax checkpoint (each process
writing only its addressable shards), a NEW 2-process fleet restores it
and continues — and the combined trajectory equals the uninterrupted
single-process run. The same checkpoint also restores into a DIFFERENT
topology (1 process × 8 devices, replicated layout): the writer topology
is not baked into the artifact.

This is the multi-host form of the preemption/resume subsystem
(`train/checkpoint.py`, `tests/test_preemption.py` cover single-process);
the reference has neither distributed execution nor distributed
checkpoints (SURVEY §2.3-2.4, §5).
"""
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
PHASE = 2  # steps per phase; oracle runs 2*PHASE uninterrupted


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_fleet(out: Path, steps: int, start_step: int = 0,
                 save_ckpt: Path = None, restore_ckpt: Path = None) -> None:
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    extra = ["--fsdp", "--start_step", str(start_step)]
    if save_ckpt is not None:
        extra += ["--save_ckpt", str(save_ckpt)]
    if restore_ckpt is not None:
        extra += ["--restore_ckpt", str(restore_ckpt)]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ste_gan_tpu.parallel.multiprocess",
             "--coordinator", f"localhost:{port}",
             "--num_processes", "2", "--process_id", str(i),
             "--steps", str(steps), "--out", str(out)] + extra,
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{log[-3000:]}"


@pytest.fixture(scope="module")
def oracle():
    """Uninterrupted single-process 8-device run over both phases."""
    cfg, models = tiny_setup()
    state, _ = run_steps(create_mesh(8), cfg, models, 2 * PHASE)
    return flatten_state(state)


@pytest.fixture(scope="module")
def resumed(tmp_path_factory):
    """Fleet A saves at step PHASE; fleet B restores and finishes."""
    root = tmp_path_factory.mktemp("mp_ckpt")
    ckpt = root / "ckpt"
    _spawn_fleet(root / "a", steps=PHASE, save_ckpt=ckpt)
    _spawn_fleet(root / "b", steps=PHASE, start_step=PHASE,
                 restore_ckpt=ckpt)
    return root


class TestMultiHostCheckpoint:
    def test_save_restore_resume_matches_uninterrupted(self, resumed,
                                                       oracle):
        got = dict(np.load(resumed / "b" / "state_p0.npz"))
        assert set(got) == set(oracle)
        for key in oracle:
            np.testing.assert_allclose(
                got[key], oracle[key], rtol=2e-5, atol=2e-6,
                err_msg=f"resumed fleet != uninterrupted run at {key}")

    def test_restore_into_different_topology(self, resumed, oracle):
        """The 2-process FSDP-sharded checkpoint restores into 1 process
        × 8 devices with a replicated layout and continues to the same
        final state."""
        cfg, models = tiny_setup()
        state, _ = run_steps(create_mesh(8), cfg, models, PHASE,
                             start_step=PHASE,
                             restore_ckpt=resumed / "ckpt")
        got = flatten_state(state)
        assert set(got) == set(oracle)
        for key in oracle:
            np.testing.assert_allclose(
                got[key], oracle[key], rtol=2e-5, atol=2e-6,
                err_msg=f"elastic restore != uninterrupted run at {key}")
