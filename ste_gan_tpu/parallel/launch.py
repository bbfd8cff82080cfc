"""Multi-process fleet launcher with failure detection and recovery.

The `multiprocess` worker runs one process of a fleet; this module is the
supervisor that runs the WHOLE fleet: it allocates a coordinator port,
spawns one worker per process, streams their logs, detects a worker
death, tears the survivors down (they would otherwise block forever in
the next collective waiting for the dead peer), and relaunches the fleet
from the newest complete recovery checkpoint (``--ckpt_every`` saves,
each marked by a ``step_{k}.done`` sentinel only after orbax's
cross-process commit finishes — a torn save is never picked). Because the
worker's batch ``i`` is a pure function of ``(seed, i)``, the redone
steps are exact and the recovered trajectory equals the uninterrupted
one (`tests/test_launch.py` proves final-state equality through an
injected hard kill).

This is the `torchrun`-shaped piece of the failure-recovery subsystem
(SURVEY.md §5 "failure detection/recovery": the reference has none —
only a manual ``--continue_run``; the single-process trainers here
already do SIGTERM-checkpointing, `tests/test_preemption.py`). Worker
crashes it recovers from include the OOM-killer, preemption of one host,
and hardware faults — anything that exits a process without poisoning
the checkpoint directory.

With ``--elastic`` the supervisor additionally handles *permanent*
capacity loss: instead of respawning at full size (and hanging if the
dead host never returns), each failed attempt halves the world size
(floor ``--min_processes``) and restores the topology-elastic recovery
checkpoint onto the smaller mesh — training continues the same
trajectory on the surviving capacity
(`tests/test_launch.py::TestElasticRecovery`).

Usage (CPU fleet, the multi-host stand-in; on a real pod drop
``--cpu_devices`` and give each host's address via --coordinator_host):

    python -m ste_gan_tpu.parallel.launch \
        --num_processes 2 --cpu_devices 4 --steps 6 \
        --ckpt_every 2 --run_dir /tmp/fleet \
        [--elastic] [--fsdp] [--model_parallel 2]
"""
from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import time
from pathlib import Path
from typing import List, Optional, Tuple


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def latest_recovery_point(ckpt_dir: Path) -> Optional[Tuple[int, Path]]:
    """Newest recovery checkpoint, by the ``step_{k}.done`` sentinels the
    worker writes after orbax's cross-process commit — an interrupted
    save has no sentinel and is skipped."""
    best = None
    for done in ckpt_dir.glob("step_*.done"):
        step = int(done.stem.split("_")[1])
        ckpt = done.with_suffix("")
        if ckpt.is_dir() and (best is None or step > best[0]):
            best = (step, ckpt)
    return best


class FleetLauncher:
    """Spawn/supervise/recover one multi-process worker fleet."""

    def __init__(self, args: argparse.Namespace):
        self.args = args
        self.run_dir = Path(args.run_dir)
        self.ckpt_dir = self.run_dir / "recovery"
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.ckpt_dir.mkdir(exist_ok=True)
        # Current world size. With --elastic it SHRINKS on restart (a lost
        # host is modeled as permanently gone); without, restarts respawn
        # at full size (the lost host is expected back).
        self.world = args.num_processes
        self.elastic = getattr(args, "elastic", False)
        self.min_processes = getattr(args, "min_processes", 1)

    # -- one attempt ------------------------------------------------------
    def _spawn(self, attempt: int, start_step: int,
               restore: Optional[Path]) -> Tuple[list, Path]:
        import os

        a = self.args
        out = self.run_dir / f"attempt_{attempt}"
        out.mkdir(exist_ok=True)
        port = free_port()
        env = dict(os.environ)
        if a.cpu_devices:
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                                f"{a.cpu_devices}")
        cmd_base = [
            sys.executable, "-m", "ste_gan_tpu.parallel.multiprocess",
            "--coordinator", f"{a.coordinator_host}:{port}",
            "--num_processes", str(self.world),
            "--steps", str(a.steps - start_step),
            "--start_step", str(start_step),
            "--ckpt_every", str(a.ckpt_every),
            "--ckpt_dir", str(self.ckpt_dir),
            "--out", str(out),
        ]
        if restore is not None:
            cmd_base += ["--restore_ckpt", str(restore)]
        if a.fsdp:
            cmd_base += ["--fsdp"]
        if a.model_parallel > 1:
            cmd_base += ["--model_parallel", str(a.model_parallel)]

        procs = []
        for i in range(self.world):
            log = (out / f"log_p{i}.txt").open("w")
            p = subprocess.Popen(cmd_base + ["--process_id", str(i)],
                                 stdout=log, stderr=subprocess.STDOUT,
                                 env=env)
            p._log_handle = log  # closed in _teardown
            procs.append(p)
        return procs, out

    def _teardown(self, procs: list) -> None:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        deadline = time.monotonic() + 15
        for p in procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.monotonic()))
            except subprocess.TimeoutExpired:
                p.kill()
                p.wait()
        for p in procs:
            p._log_handle.close()

    def _watch(self, procs: list) -> bool:
        """Block until the fleet finishes or a worker dies. True = every
        worker exited 0; False = at least one died (survivors, which
        would block forever in their next collective, are torn down)."""
        deadline = time.monotonic() + self.args.attempt_timeout
        while True:
            codes = [p.poll() for p in procs]
            if any(c not in (None, 0) for c in codes):
                self._teardown(procs)
                return False
            if all(c == 0 for c in codes):
                self._teardown(procs)  # closes log handles
                return True
            if time.monotonic() > deadline:
                self._teardown(procs)
                return False
            time.sleep(0.25)

    # -- the supervision loop --------------------------------------------
    def run(self) -> dict:
        restarts = 0
        recovered_from: List[int] = []
        world_sizes: List[int] = [self.world]
        while True:
            rec = latest_recovery_point(self.ckpt_dir) if restarts else None
            start = rec[0] if rec else 0
            restore = rec[1] if rec else None
            if restarts:
                recovered_from.append(start)
                print(f"[launch] restart {restarts}: recovering from "
                      f"step {start} with {self.world} process(es)"
                      + (f" ({restore})" if restore else " (scratch)"),
                      flush=True)
            procs, out = self._spawn(restarts, start, restore)
            if self._watch(procs):
                summary = {
                    "ok": True,
                    "steps": self.args.steps,
                    "num_processes": self.args.num_processes,
                    "world_sizes": world_sizes,
                    "restarts": restarts,
                    "recovered_from": recovered_from,
                    "final_out": str(out),
                }
                (self.run_dir / "summary.json").write_text(
                    json.dumps(summary, indent=1))
                print(f"[launch] fleet done: {json.dumps(summary)}",
                      flush=True)
                return summary
            restarts += 1
            if self.elastic and self.world > self.min_processes:
                # Elastic recovery: the dead process's host is treated as
                # permanently lost — relaunch the fleet at half the world
                # size instead of waiting for capacity that may not return.
                # The recovery checkpoints are topology-elastic (each
                # process restores only its addressable shards of the new,
                # smaller mesh; tests/test_multiprocess_ckpt.py), and the
                # global batch is a pure function of (seed, step), so the
                # shrunk fleet continues the SAME trajectory (reduction
                # order over fewer devices is the only difference).
                self.world = max(self.min_processes, self.world // 2)
                print(f"[launch] elastic: shrinking world to {self.world} "
                      "process(es)", flush=True)
            world_sizes.append(self.world)
            if restarts > self.args.max_restarts:
                summary = {"ok": False, "restarts": restarts - 1,
                           "world_sizes": world_sizes[:-1],
                           "recovered_from": recovered_from,
                           "failed_attempt": str(out)}
                (self.run_dir / "summary.json").write_text(
                    json.dumps(summary, indent=1))
                raise SystemExit(
                    f"[launch] fleet failed after {restarts - 1} restarts; "
                    f"logs in {out}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--run_dir", type=Path, required=True,
                    help="supervisor state: recovery/ checkpoints, "
                         "attempt_{n}/ logs+outputs, summary.json")
    ap.add_argument("--ckpt_every", type=int, default=0,
                    help="recovery-checkpoint cadence in steps (0 = only "
                         "restart-from-scratch recovery)")
    ap.add_argument("--max_restarts", type=int, default=2)
    ap.add_argument("--attempt_timeout", type=float, default=1800,
                    help="seconds before a hung attempt (e.g. deadlocked "
                         "collective) is torn down and restarted")
    ap.add_argument("--cpu_devices", type=int, default=0,
                    help="force each worker onto N virtual CPU devices "
                         "(the multi-host simulation mode); 0 = inherit "
                         "the real platform")
    ap.add_argument("--coordinator_host", default="localhost")
    ap.add_argument("--elastic", action="store_true",
                    help="shrink the world on restart instead of "
                         "respawning at full size: each failed attempt "
                         "halves num_processes (floor --min_processes), "
                         "modeling a permanently lost host; the "
                         "topology-elastic recovery checkpoints restore "
                         "onto the smaller mesh and training continues")
    ap.add_argument("--min_processes", type=int, default=1)
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--model_parallel", type=int, default=1)
    args = ap.parse_args()
    FleetLauncher(args).run()


if __name__ == "__main__":
    main()
