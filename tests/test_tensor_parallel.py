"""Tensor parallelism (2-D data x model mesh) on the virtual 8-device CPU
mesh: the UNCHANGED fused GAN train step runs with parameters sharded over
the model axis, and the multi-step trajectory is equal to single-device
execution over the FULL train-state pytree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ste_gan_tpu.train.gan import init_state, make_train_step
from ste_gan_tpu.parallel.tensor_parallel import (
    MODEL_AXIS, create_mesh_2d, leaf_partition_spec, shard_batch_2d,
    shard_state, sharding_summary, state_shardings)

from tests.test_train_step import synthetic_batch, tiny_cfg, tiny_models


class TestPartitionRule:
    def test_conv_kernel_shards_trailing_axis(self):
        leaf = np.zeros((3, 16, 32))
        assert leaf_partition_spec(leaf, 4) == P(None, None, MODEL_AXIS)

    def test_bias_shards(self):
        assert leaf_partition_spec(np.zeros((32,)), 4) == P(MODEL_AXIS)

    def test_indivisible_replicates(self):
        assert leaf_partition_spec(np.zeros((3, 16, 30)), 4) == P()

    def test_too_small_replicates(self):
        # 8 channels over 8-way model parallelism: 1 element/shard -> keep.
        assert leaf_partition_spec(np.zeros((8,)), 8) == P()

    def test_scalar_replicates(self):
        assert leaf_partition_spec(jnp.zeros(()), 4) == P()
        assert leaf_partition_spec(None, 4) == P()


@pytest.mark.parametrize("grid", [(4, 2), (2, 4)])
class TestTensorParallelStep:
    """The same step function, three trajectories: single-device vs a 2-D
    mesh with model-sharded parameters. GSPMD partitions the identical XLA
    program, so every leaf of the final state must agree."""

    def test_three_step_trajectory_matches_single_device(self, grid):
        data, model = grid
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, models))
        batches = [synthetic_batch(cfg, seed=s) for s in range(3)]

        s1 = state0
        for b in batches:
            s1, m1 = step(s1, b, enc_vars)

        mesh = create_mesh_2d(data, model)
        s2 = shard_state(mesh, state0)
        enc_s = shard_state(mesh, enc_vars)
        for b in batches:
            s2, m2 = step(s2, shard_batch_2d(mesh, b), enc_s)

        np.testing.assert_allclose(float(m1["loss/generator"]),
                                   float(m2["loss/generator"]), rtol=2e-4)
        flat1 = jax.tree_util.tree_flatten_with_path(s1)[0]
        flat2 = jax.tree.leaves(s2)
        assert len(flat1) == len(flat2)
        for (path, l1), l2 in zip(flat1, flat2):
            name = jax.tree_util.keystr(path)
            a, b_ = np.asarray(l1), np.asarray(jax.device_get(l2))
            if a.dtype.kind in "iu":
                np.testing.assert_array_equal(a, b_, err_msg=name)
            else:
                np.testing.assert_allclose(a, b_, rtol=2e-3, atol=1e-5,
                                           err_msg=name)

    def test_parameters_are_actually_sharded(self, grid):
        data, model = grid
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        mesh = create_mesh_2d(data, model)
        state = shard_state(mesh, state0)

        # The big generator conv kernels split into out-channel slabs.
        sharded_bytes = 0
        seen_split = False
        for leaf in jax.tree.leaves(state.gen_params):
            shard = leaf.sharding.shard_shape(leaf.shape)
            if shard != leaf.shape:
                seen_split = True
                assert shard[-1] == leaf.shape[-1] // model
                sharded_bytes += leaf.nbytes
        assert seen_split and sharded_bytes > 0

        # Optimizer moments follow their parameters leaf-for-leaf.
        specs_p = jax.tree.leaves(state_shardings(mesh, state.gen_params))
        mu = state.opt_g.inner_state[0].mu if hasattr(state.opt_g, "inner_state") \
            else None
        if mu is not None:
            specs_m = jax.tree.leaves(state_shardings(mesh, mu))
            assert [s.spec for s in specs_m] == [s.spec for s in specs_p]

        # Most of the model's parameter volume is split, not replicated.
        sharded, replicated, _ = sharding_summary(state.gen_params, mesh)
        assert sharded > replicated

    def test_updated_state_keeps_model_sharding(self, grid):
        data, model = grid
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        mesh = create_mesh_2d(data, model)
        state = shard_state(mesh, state0)
        step = jax.jit(make_train_step(cfg, models))
        new_state, _ = step(state, shard_batch_2d(mesh, synthetic_batch(cfg)),
                            shard_state(mesh, enc_vars))
        # The sharding survives the update: a second step re-dispatches on
        # the same layout with no host-side resharding.
        for old, new in zip(jax.tree.leaves(state.gen_params),
                            jax.tree.leaves(new_state.gen_params)):
            assert new.sharding.shard_shape(new.shape) == \
                old.sharding.shard_shape(old.shape)
