"""Fleet launcher failure recovery: a 2-process fleet is hard-killed
(``os._exit``, fault-injected) mid-run; the supervisor detects the death,
tears down the survivor (which would otherwise block forever in its next
collective), restarts the fleet from the newest sentinel-marked recovery
checkpoint, and the recovered run's final state EQUALS the uninterrupted
single-process oracle — crash-recovery is exact, not approximate, because
batch ``i`` is a pure function of ``(seed, i)``.

The reference's only failure story is a manual ``--continue_run``
(SURVEY.md §5); it has no distributed execution, let alone supervised
fleets.
"""
import argparse
import os
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu.parallel.launch import FleetLauncher, latest_recovery_point
from ste_gan_tpu.parallel.mesh import create_mesh
from ste_gan_tpu.parallel.multiprocess import (flatten_state, run_steps,
                                               tiny_setup)

STEPS = 6
CRASH_AT = 5  # proc 1 dies just before step 5; last recovery point = 4


def _launcher_args(run_dir: Path, **over) -> argparse.Namespace:
    base = dict(
        num_processes=2, steps=STEPS, run_dir=run_dir, ckpt_every=2,
        max_restarts=2, attempt_timeout=900, cpu_devices=4,
        coordinator_host="localhost", fsdp=False, model_parallel=1)
    base.update(over)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def oracle():
    """Uninterrupted single-process 8-device run."""
    cfg, models = tiny_setup()
    state, history = run_steps(create_mesh(8), cfg, models, STEPS)
    return flatten_state(state), history


@pytest.fixture(scope="module")
def recovered(tmp_path_factory):
    """Launch a fleet with a hard kill injected into process 1."""
    run_dir = tmp_path_factory.mktemp("fleet")
    flag = run_dir / "crash.flag"
    os.environ["STE_MP_CRASH"] = f"{CRASH_AT}:1:{flag}"
    try:
        summary = FleetLauncher(_launcher_args(run_dir)).run()
    finally:
        del os.environ["STE_MP_CRASH"]
    return run_dir, flag, summary


@pytest.fixture(scope="module")
def elastic_recovered(tmp_path_factory):
    """Elastic recovery: process 1 dies just before step 3 and its host is
    modeled as permanently lost — the supervisor relaunches ONE process
    (4 devices instead of 8) from the step-2 recovery checkpoint (the
    checkpoints are topology-elastic) and the run completes at the
    smaller world size."""
    run_dir = tmp_path_factory.mktemp("elastic_fleet")
    flag = run_dir / "crash.flag"
    os.environ["STE_MP_CRASH"] = f"3:1:{flag}"
    try:
        summary = FleetLauncher(_launcher_args(
            run_dir, elastic=True, min_processes=1)).run()
    finally:
        del os.environ["STE_MP_CRASH"]
    return run_dir, flag, summary


class TestElasticRecovery:
    def test_world_shrank_and_completed(self, elastic_recovered):
        run_dir, flag, summary = elastic_recovered
        assert flag.exists(), "fault injection never fired"
        assert summary["ok"]
        assert summary["restarts"] == 1
        assert summary["world_sizes"] == [2, 1]
        assert summary["recovered_from"] == [2]
        # The final attempt really ran single-process: exactly one state
        # file, and process 1's log exists only for the crashed attempt.
        out = Path(summary["final_out"])
        assert (out / "state_p0.npz").exists()
        assert not (out / "state_p1.npz").exists()
        assert (run_dir / "attempt_0" / "log_p1.txt").exists()

    def test_shrunk_fleet_continues_the_trajectory(self, elastic_recovered,
                                                   oracle):
        """The half-size fleet continues the SAME training trajectory: the
        global batch is a pure function of (seed, step) and the restored
        state is exact, so the only difference vs the uninterrupted
        8-device oracle is gradient reduction order over 4 devices."""
        _, _, summary = elastic_recovered
        want, _ = oracle
        got = dict(np.load(Path(summary["final_out"]) / "state_p0.npz"))
        assert set(got) == set(want)
        for key in want:
            np.testing.assert_allclose(
                got[key], want[key], rtol=5e-4, atol=1e-5,
                err_msg=f"elastic fleet != uninterrupted run at {key}")


class TestFleetRecovery:
    def test_crash_was_injected_and_detected(self, recovered):
        run_dir, flag, summary = recovered
        assert flag.exists(), "fault injection never fired"
        assert summary["ok"]
        assert summary["restarts"] == 1
        # Recovery resumed from the newest complete checkpoint, not from
        # scratch: steps 4 and 5 were redone, 0-3 were not.
        assert summary["recovered_from"] == [4]
        assert (run_dir / "attempt_0" / "log_p1.txt").exists()
        assert latest_recovery_point(run_dir / "recovery")[0] == STEPS

    def test_recovered_state_matches_uninterrupted(self, recovered, oracle):
        run_dir, _, summary = recovered
        want, _ = oracle
        got = dict(np.load(Path(summary["final_out"]) / "state_p0.npz"))
        assert set(got) == set(want)
        for key in want:
            np.testing.assert_allclose(
                got[key], want[key], rtol=2e-5, atol=2e-6,
                err_msg=f"recovered fleet != uninterrupted run at {key}")

    def test_replicas_agree_after_recovery(self, recovered):
        _, _, summary = recovered
        out = Path(summary["final_out"])
        p0 = dict(np.load(out / "state_p0.npz"))
        p1 = dict(np.load(out / "state_p1.npz"))
        assert set(p0) == set(p1)
        for key in p0:
            np.testing.assert_array_equal(p0[key], p1[key], err_msg=key)
