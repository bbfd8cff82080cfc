"""FSDP (ZeRO-3 analogue) on the virtual 8-device CPU mesh: the fused GAN
train step runs with parameters AND both AdamW moment trees sharded over
the ``data`` axis (optionally hybrid with the tensor-parallel ``model``
axis) via the gather-at-step-entry wrapper, and the multi-step trajectory
is equal to single-device execution over the FULL train-state pytree."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ste_gan_tpu.parallel.fsdp import (
    fsdp_partition_spec, fsdp_shard_state, fsdp_sharding_summary,
    fsdp_state_shardings, fsdp_wrap_gan_step)
from ste_gan_tpu.parallel.mesh import DATA_AXIS, create_mesh, shard_batch
from ste_gan_tpu.parallel.tensor_parallel import (
    MODEL_AXIS, create_mesh_2d, shard_batch_2d)
from ste_gan_tpu.train.gan import init_state, make_train_step

from tests.test_train_step import synthetic_batch, tiny_cfg, tiny_models


class TestPartitionRule:
    def test_conv_kernel_shards_largest_axis_over_data(self):
        # [k=3, in=16, out=32]: out is the largest divisible axis.
        leaf = np.zeros((3, 16, 32))
        assert fsdp_partition_spec(leaf, 8) == P(None, None, DATA_AXIS)

    def test_hybrid_shards_remaining_axis(self):
        # TP takes the trailing axis; FSDP takes the next-largest (in=16).
        leaf = np.zeros((3, 16, 32))
        assert fsdp_partition_spec(leaf, 4, model_size=4) == \
            P(None, DATA_AXIS, MODEL_AXIS)

    def test_bias_shards_over_data(self):
        assert fsdp_partition_spec(np.zeros((32,)), 8) == P(DATA_AXIS)

    def test_hybrid_bias_keeps_model_only(self):
        # The single axis already belongs to 'model' — nothing left for
        # 'data'.
        assert fsdp_partition_spec(np.zeros((32,)), 4, model_size=4) == \
            P(MODEL_AXIS)

    def test_indivisible_replicates(self):
        assert fsdp_partition_spec(np.zeros((30,)), 8) == P()

    def test_too_small_replicates(self):
        # 8 elements over 8-way FSDP: 1 element/shard -> keep replicated.
        assert fsdp_partition_spec(np.zeros((8,)), 8) == P()

    def test_scalar_replicates(self):
        assert fsdp_partition_spec(jnp.zeros(()), 8) == P()
        assert fsdp_partition_spec(None, 8) == P()

    def test_tie_prefers_trailing_axis(self):
        # (16, 16): equal sizes -> the later (feature-like) axis wins.
        assert fsdp_partition_spec(np.zeros((16, 16)), 8) == P(None, DATA_AXIS)


MESHES = {
    "fsdp8": lambda: (create_mesh(8), shard_batch),
    "fsdp4_tp2": lambda: (create_mesh_2d(4, 2), shard_batch_2d),
    "fsdp2_tp4": lambda: (create_mesh_2d(2, 4), shard_batch_2d),
}


@pytest.mark.parametrize("mesh_key", sorted(MESHES))
class TestFSDPStep:
    """The same inner step function under the FSDP wrapper: params and
    both AdamW moment trees live sharded over ``data`` between steps, the
    wrapper all-gathers compute trees at step entry and re-scatters the
    updated state, so every leaf of the final state must agree with
    single-device execution."""

    def test_three_step_trajectory_matches_single_device(self, mesh_key):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        inner = make_train_step(cfg, models)
        step = jax.jit(inner)
        batches = [synthetic_batch(cfg, seed=s) for s in range(3)]

        s1 = state0
        for b in batches:
            s1, m1 = step(s1, b, enc_vars)

        mesh, batch_fn = MESHES[mesh_key]()
        fsdp_step = jax.jit(fsdp_wrap_gan_step(inner, mesh))
        s2 = fsdp_shard_state(mesh, state0)
        enc_s = fsdp_shard_state(mesh, enc_vars)
        for b in batches:
            s2, m2 = fsdp_step(s2, batch_fn(mesh, b), enc_s)

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

    def test_state_is_actually_sharded_over_data(self, mesh_key):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        mesh, _ = MESHES[mesh_key]()
        state = fsdp_shard_state(mesh, state0)
        data = mesh.shape[DATA_AXIS]

        seen_split = False
        for leaf in jax.tree.leaves(state.gen_params):
            spec = leaf.sharding.spec
            if DATA_AXIS in spec:
                seen_split = True
                axis = list(spec).index(DATA_AXIS)
                shard = leaf.sharding.shard_shape(leaf.shape)
                assert shard[axis] == leaf.shape[axis] // data
        assert seen_split

        # AdamW moments follow their parameters leaf-for-leaf, keeping the
        # optimizer update shard-local.
        specs_p = jax.tree.leaves(fsdp_state_shardings(mesh, state.gen_params))
        mu = getattr(state.opt_g, "inner_state", [None])[0]
        if mu is not None and hasattr(mu, "mu"):
            specs_m = jax.tree.leaves(fsdp_state_shardings(mesh, mu.mu))
            assert [s.spec for s in specs_m] == [s.spec for s in specs_p]

        # Most of the model's parameter volume is sharded, not replicated.
        sharded, replicated, _ = fsdp_sharding_summary(state.gen_params, mesh)
        assert sharded > replicated

    def test_updated_state_keeps_fsdp_sharding(self, mesh_key):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        mesh, batch_fn = MESHES[mesh_key]()
        state = fsdp_shard_state(mesh, state0)
        step = jax.jit(fsdp_wrap_gan_step(make_train_step(cfg, models), mesh))
        new_state, _ = step(state, batch_fn(mesh, synthetic_batch(cfg)),
                            fsdp_shard_state(mesh, enc_vars))
        # The sharding survives the update: a second step re-dispatches on
        # the same layout with no host-side resharding.
        for old, new in zip(jax.tree.leaves(state.gen_params),
                            jax.tree.leaves(new_state.gen_params)):
            assert new.sharding.shard_shape(new.shape) == \
                old.sharding.shard_shape(old.shape)
