"""Checkpointing across mesh topologies: a train state sharded over the
2-D (data, model) tensor-parallel mesh saves through the production
CheckpointManager and restores (a) back onto the same mesh with the
model-axis sharding intact, (b) onto a single device, and (c) onto a
DIFFERENT 2-D topology — the elastic-reconfiguration property a real
multi-chip deployment needs for preemption-resume at a new slice shape.

The reference has no distributed training at all (SURVEY.md §2.3); its
checkpoints are single-device torch state_dicts (ste_gan/train.py:425-436).
"""
import jax
import numpy as np
import pytest

from ste_gan_tpu.parallel.tensor_parallel import (
    create_mesh_2d, shard_batch_2d, shard_state)
from ste_gan_tpu.train.checkpoint import CheckpointManager
from ste_gan_tpu.train.gan import init_state, make_train_step

from tests.test_train_step import synthetic_batch, tiny_cfg, tiny_models


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(jax.device_get(x)),
                                      np.asarray(jax.device_get(y)))


@pytest.fixture(scope="module")
def tp_run():
    """One TP step on a (4, 2) mesh -> (sharded advanced state, step fn,
    fixtures). Module-scoped: the step compile is the expensive part."""
    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    mesh = create_mesh_2d(4, 2)
    state = shard_state(mesh, init_state(cfg, models, jax.random.PRNGKey(0)))
    enc_s = shard_state(mesh, enc_vars)
    step = jax.jit(make_train_step(cfg, models))
    state, _ = step(state, shard_batch_2d(mesh, synthetic_batch(cfg)), enc_s)
    jax.block_until_ready(state.gen_params)
    return dict(cfg=cfg, models=models, mesh=mesh, state=state,
                step=step, enc_s=enc_s)


class TestTensorParallelCheckpoint:
    def test_save_sharded_restore_same_mesh(self, tp_run, tmp_path):
        mgr = CheckpointManager(tmp_path)
        mgr.save("checkpoint-00000001", tp_run["state"], epoch=1)
        restored, epoch = mgr.restore("checkpoint-00000001", tp_run["state"])
        assert epoch == 1
        _assert_trees_equal(tp_run["state"], restored)

        # The model-axis sharding survives the round trip: big generator
        # kernels come back as out-channel slabs, not replicated.
        split = [
            leaf for leaf in jax.tree.leaves(restored.gen_params)
            if leaf.sharding.shard_shape(leaf.shape) != leaf.shape]
        assert split, "no leaf restored sharded"
        # ... and the restored state steps without resharding.
        state2, metrics = tp_run["step"](
            restored,
            shard_batch_2d(tp_run["mesh"], synthetic_batch(tp_run["cfg"],
                                                           seed=2)),
            tp_run["enc_s"])
        assert np.isfinite(float(metrics["loss/generator"]))
        assert int(state2.step) == 2

    def test_restore_onto_single_device(self, tp_run, tmp_path):
        """A run sharded over 8 devices resumes on one (scale-down)."""
        mgr = CheckpointManager(tmp_path)
        mgr.save("checkpoint-00000001", tp_run["state"], epoch=3)
        template = init_state(tp_run["cfg"], tp_run["models"],
                              jax.random.PRNGKey(0))
        restored, epoch = mgr.restore("checkpoint-00000001", template)
        assert epoch == 3
        _assert_trees_equal(tp_run["state"], restored)
        for leaf in jax.tree.leaves(restored.gen_params):
            assert leaf.sharding.shard_shape(leaf.shape) == leaf.shape

    def test_restore_onto_different_topology(self, tp_run, tmp_path):
        """Saved on (4, 2), resumed on (2, 4): a new slice shape picks up
        the same numbers under its own sharding rule."""
        mgr = CheckpointManager(tmp_path)
        mgr.save("checkpoint-00000001", tp_run["state"], epoch=0)
        mesh_b = create_mesh_2d(2, 4)
        template = shard_state(
            mesh_b, init_state(tp_run["cfg"], tp_run["models"],
                               jax.random.PRNGKey(0)))
        restored, _ = mgr.restore("checkpoint-00000001", template)
        _assert_trees_equal(tp_run["state"], restored)
        split = [
            leaf for leaf in jax.tree.leaves(restored.gen_params)
            if leaf.sharding.shard_shape(leaf.shape) != leaf.shape]
        assert split
        for leaf in split:
            assert leaf.shape[-1] % 4 == 0  # sliced 4 ways on the new mesh

    def test_single_device_checkpoint_restores_sharded(self, tp_run,
                                                       tmp_path):
        """The inverse direction: an old single-device run scales OUT onto
        a tensor-parallel mesh at resume."""
        cfg, models = tp_run["cfg"], tp_run["models"]
        state_sd = init_state(cfg, models, jax.random.PRNGKey(7))
        mgr = CheckpointManager(tmp_path)
        mgr.save("checkpoint-00000002", state_sd, epoch=0)
        template = shard_state(tp_run["mesh"], state_sd)
        restored, _ = mgr.restore("checkpoint-00000002", template)
        _assert_trees_equal(state_sd, restored)
        assert any(
            leaf.sharding.shard_shape(leaf.shape) != leaf.shape
            for leaf in jax.tree.leaves(restored.gen_params))
