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
import shutil
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"checkpoint-(\d+)$")
_INFLIGHT_SUFFIX = ".inflight"


class CheckpointManager:
    def __init__(self, run_dir: Path):
        self.run_dir = Path(run_dir).resolve()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        # (tmp_path, tag, meta_dict) of a background save not yet promoted.
        self._pending: Optional[Tuple[Path, str, dict]] = None

    # ------------------------------------------------------------------
    def _path(self, tag: str) -> Path:
        return self.run_dir / tag

    def _finalize_pending(self) -> None:
        """Wait for the in-flight background write, then atomically swap
        it into its final tag and write meta.json. Until this point the
        PREVIOUS checkpoint under the tag stays intact on disk, so a
        crash mid-write never loses both copies (overwriting
        ``checkpoint-last``/``best`` used to have a ~20 s window where
        neither existed), and meta.json can never describe a checkpoint
        whose data write later failed."""
        self._ckptr.wait_until_finished()
        if self._pending is None:
            return
        tmp, tag, meta = self._pending
        self._pending = None
        if not tmp.is_dir():  # background write failed; old copy survives
            logging.error("background checkpoint write for %r failed", tag)
            return
        final = self._path(tag)
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)
        (self.run_dir / f"{tag}.meta.json").write_text(json.dumps(meta))

    def save(self, tag: str, state: Any, epoch: int = 0,
             block: bool = True, extra_meta: Optional[dict] = None) -> None:
        """Save a checkpoint. ``block=False`` returns as soon as the
        device->host snapshot is taken (~0.3 s) and lets the disk write
        (~20 s for the full train state) proceed in Orbax's background
        thread, overlapped with training — safe with buffer donation
        because the snapshot happens before returning. The write lands in
        a ``<tag>.inflight`` temp dir and is promoted to ``<tag>`` (and
        only then gets its meta.json) once it finishes — at the start of
        the next save, or in :meth:`wait_until_finished`."""
        self._finalize_pending()
        tmp = self._path(f"{tag}{_INFLIGHT_SUFFIX}")
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, state, force=True)
        meta = {**(extra_meta or {}), "epoch": int(epoch)}
        self._pending = (tmp, tag, meta)
        if block:
            self._finalize_pending()

    def wait_until_finished(self) -> None:
        self._finalize_pending()

    def restore(self, tag: str, template: Any) -> Tuple[Any, int]:
        path = self._path(tag)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            state = _restore_optional_tolerant(self._ckptr, path, abstract)
        except Exception as exc:
            _reraise_with_flavor_hint(exc, path, template)
            raise
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

    def save_best(self, state, epoch: int,
                  su_error: Optional[float] = None) -> None:
        """``su_error`` is persisted in best.meta.json so a resumed run
        initialises its best-so-far from the historical best instead of
        +inf (which would let a worse later validation overwrite the best
        checkpoint after any restart)."""
        extra = {} if su_error is None else {"su_error": float(su_error)}
        self.save("best", state, epoch, block=False, extra_meta=extra)

    def best_su_error(self) -> float:
        """Historical best validation speech-unit error recorded next to
        the ``best`` checkpoint; +inf when absent."""
        meta_path = self.run_dir / "best.meta.json"
        if meta_path.exists() and self._path("best").is_dir():
            try:
                return float(json.loads(meta_path.read_text()).get(
                    "su_error", float("inf")))
            except (ValueError, json.JSONDecodeError):
                return float("inf")
        return float("inf")

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


def _tree_keypaths(tree, prefix=()) -> set:
    if isinstance(tree, dict):
        out = set()
        for k, v in tree.items():
            out |= _tree_keypaths(v, prefix + (str(k),))
        return out
    return {prefix}


def _opt_flavor(keypaths: set) -> str:
    """Classify an optimizer-state subtree by its serialized key structure.

    optax ``inject_hyperparams(adamw)`` nests per-leaf moments under
    ``inner_state``; the flat single-buffer AdamW
    (ops/flat_adamw.py::FlatAdamWState) stores single ``mu``/``nu``
    buffers at the top level. The two layouts are checkpoint-incompatible
    (ste_gan_tpu/train/gan.py make_optimizer NOTE)."""
    tops = {kp[0] for kp in keypaths if kp}
    if "inner_state" in tops:
        return "optax"
    if {"mu", "nu"} <= tops:
        return "flat"
    return "unknown"


def _reraise_with_flavor_hint(exc: Exception, path: Path, template: Any) -> None:
    """If a restore failure is explained by an optimizer-flavour mismatch
    (flat vs optax AdamW state layouts), raise a loud, actionable error
    instead of orbax's structural one. Otherwise return and let the
    caller re-raise the original exception."""
    try:
        saved = ocp.StandardCheckpointer().metadata(path).item_metadata.tree
        tmpl = jax.tree.map(lambda x: None, template)
        tmpl_dict = (tmpl.__dict__ if hasattr(tmpl, "__dict__")
                     else dict(tmpl) if isinstance(tmpl, dict) else None)
        saved_dict = saved if isinstance(saved, dict) else None
        if tmpl_dict is None or saved_dict is None:
            return
        for opt_key in ("opt_g", "opt_d", "opt_state"):
            if opt_key not in saved_dict or opt_key not in tmpl_dict:
                continue
            saved_flavor = _opt_flavor(_tree_keypaths(saved_dict[opt_key]))
            tmpl_flavor = _opt_flavor(_tree_keypaths(
                jax.tree.map(lambda x: None, _to_plain(tmpl_dict[opt_key]))))
            if ("unknown" not in (saved_flavor, tmpl_flavor)
                    and saved_flavor != tmpl_flavor):
                raise ValueError(
                    f"checkpoint at {path} was written with the "
                    f"'{saved_flavor}' AdamW optimizer flavour but the "
                    f"current config expects '{tmpl_flavor}' "
                    f"(cfg.train.flat_optimizer mismatch) — the two state "
                    f"layouts are incompatible; resume with the same "
                    f"optimizer flavour the run was started with"
                ) from exc
    except ValueError:
        raise
    except Exception:
        return


def _to_plain(tree):
    """namedtuple/pytree -> nested dicts of Nones for key-structure sniffing."""
    if hasattr(tree, "_asdict"):
        return {k: _to_plain(v) for k, v in tree._asdict().items()}
    if isinstance(tree, dict):
        return {str(k): _to_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return {str(i): _to_plain(v) for i, v in enumerate(tree)}
    return None


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
    return _restore_optional_tolerant(ckptr, path, abstract)


def _restore_optional_tolerant(ckptr, path, abstract: Any) -> Any:
    """Restore, tolerating optional (None-valued) top-level state fields
    that a checkpoint written before the field existed does not contain.

    Orbax records an explicit marker for a None subtree, so a template
    whose dataclass gained an optional field (e.g. GANTrainState.gen_ema,
    default None) structurally mismatches pre-field checkpoints even
    though the field holds no arrays. On that mismatch, retry with the
    None fields pruned from the template (restoring into a plain dict of
    the remaining fields — orbax matches nodes by key name) and rebuild
    the dataclass with the Nones reinstated. A checkpoint that HAS data
    for the field still mismatches loudly if the template lacks it."""
    import dataclasses

    try:
        return ckptr.restore(path, abstract)
    except ValueError as exc:
        if ("do not match" not in str(exc)
                or not dataclasses.is_dataclass(abstract)):
            raise
        fields = {f.name: getattr(abstract, f.name)
                  for f in dataclasses.fields(abstract)}
        pruned = {k: v for k, v in fields.items() if v is not None}
        if len(pruned) == len(fields):
            raise
        restored = ckptr.restore(path, pruned)
        return type(abstract)(
            **{k: restored.get(k, None) for k in fields})
