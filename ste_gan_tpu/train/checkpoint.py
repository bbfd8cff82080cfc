"""Orbax checkpointing with the reference's retention policy.

The reference keeps (ste_gan/train.py:370-374,421-466,478-494): periodic
checkpoints every ``interval_save`` steps, a ``-final`` checkpoint at
max_steps, a ``-last`` checkpoint every 5 epochs, and ``best`` generator/
discriminator weights selected by validation speech-unit error; resume picks
the highest-numbered periodic checkpoint (ste_gan/utils/common.py:23-61).

Here each checkpoint is a single Orbax pytree holding the *entire*
:class:`~ste_gan_tpu.train.gan.GANTrainState` (both networks, both optimizer
states, spectral-norm state, step counter) plus a JSON metadata sidecar with
the epoch. Session/speaking-mode vocab JSONs live next to the checkpoints,
exactly like the reference (ste_gan/data/emg_dataset.py:202-218).
"""
from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"checkpoint-(\d+)$")


class CheckpointManager:
    def __init__(self, run_dir: Path):
        self.run_dir = Path(run_dir).resolve()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------
    def _path(self, tag: str) -> Path:
        return self.run_dir / tag

    def save(self, tag: str, state: Any, epoch: int = 0,
             block: bool = True) -> None:
        """Save a checkpoint. ``block=False`` returns as soon as the
        device->host snapshot is taken (~0.3 s) and lets the disk write
        (~20 s for the full train state) proceed in Orbax's background
        thread, overlapped with training — safe with buffer donation
        because the snapshot happens before returning. Any in-flight save
        is finished first; Orbax's tmp-dir rename keeps partially-written
        checkpoints invisible to resume."""
        self._ckptr.wait_until_finished()
        path = self._path(tag)
        self._ckptr.save(path, state, force=True)
        if block:
            self._ckptr.wait_until_finished()
        (self.run_dir / f"{tag}.meta.json").write_text(
            json.dumps({"epoch": int(epoch)}))

    def wait_until_finished(self) -> None:
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, template: Any) -> Tuple[Any, int]:
        path = self._path(tag)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        state = self._ckptr.restore(path, abstract)
        meta_path = self.run_dir / f"{tag}.meta.json"
        epoch = 0
        if meta_path.exists():
            epoch = int(json.loads(meta_path.read_text()).get("epoch", 0))
        return state, epoch

    # ------------------------------------------------------------------
    def save_periodic(self, state, step: int, epoch: int,
                      block: bool = False) -> None:
        self.save(f"checkpoint-{step:08d}", state, epoch, block=block)

    def save_final(self, state, epoch: int) -> None:
        # Final saves block: the process exits right after.
        self.save("checkpoint-final", state, epoch, block=True)

    def save_last(self, state, epoch: int) -> None:
        self.save("checkpoint-last", state, epoch, block=False)

    def save_best(self, state, epoch: int) -> None:
        self.save("best", state, epoch, block=False)

    def latest_periodic_tag(self) -> Optional[str]:
        steps = []
        for path in self.run_dir.glob("checkpoint-*"):
            match = _STEP_RE.match(path.name)
            if match and path.is_dir():
                steps.append(int(match.group(1)))
        if not steps:
            if self._path("checkpoint-last").is_dir():
                return "checkpoint-last"
            if self._path("checkpoint-final").is_dir():
                return "checkpoint-final"
            return None
        return f"checkpoint-{max(steps):08d}"

    def restore_latest(self, template: Any) -> Optional[Tuple[Any, int]]:
        tag = self.latest_periodic_tag()
        if tag is None:
            return None
        logging.info("Resuming from checkpoint: %s", self._path(tag))
        return self.restore(tag, template)


def restore_from_path(path: Path, template: Any) -> Tuple[Any, int]:
    """Restore a train state from an explicit ``--checkpoint`` path.

    ``path`` may point at a single checkpoint directory (e.g.
    ``<run>/checkpoint-00010000``, ``<run>/best``) or at a run directory, in
    which case the newest checkpoint inside it is used — the analogue of the
    reference's explicit-checkpoint start (ste_gan/utils/common.py:23-61).
    """
    path = Path(path).resolve()
    if not path.is_dir():
        raise FileNotFoundError(f"--checkpoint path does not exist: {path}")
    if (_STEP_RE.match(path.name) or path.name in
            ("checkpoint-final", "checkpoint-last", "best")):
        mgr = CheckpointManager(path.parent)
        logging.info("Restoring from explicit checkpoint: %s", path)
        return mgr.restore(path.name, template)
    restored = CheckpointManager(path).restore_latest(template)
    if restored is None:
        raise FileNotFoundError(f"No checkpoints found under run dir: {path}")
    return restored


# ---------------------------------------------------------------------------
# Standalone pytrees (frozen EMG encoder, exported generators)
# ---------------------------------------------------------------------------


def save_pytree(path: Path, tree: Any) -> None:
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_pytree(path: Path, template: Any) -> Any:
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(path, abstract)
