"""Pipeline parallelism (parallel/pipeline_parallel.py): GPipe-staged
execution of the EMG encoder's transformer stack must match the sequential
layer loop, forward AND gradient, on a virtual stage mesh (ulp-tight at
equal microbatch shapes; bit-exactness across differently-compiled
programs is not a meaningful target — jit fusion reassociates fp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.parallel.pipeline_parallel import (
    create_stage_mesh, create_stage_mesh_2d, encoder_transformer_params,
    pipeline_apply, stack_stage_params, transformer_stack_layer_fn)

D_MODEL, HEADS, FF, LAYERS = 32, 4, 64, 4


@pytest.fixture(scope="module")
def stack():
    """(layer_fn, per-layer params list, input) from a REAL tiny
    EMGEncoderTransformer's transformer stack."""
    model = EMGEncoderTransformer(
        model_size=D_MODEL, num_extra_res_blocks=1,
        num_transformer_layers=LAYERS, num_heads=HEADS,
        dim_feedforward=FF, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16 * 16, 8)), train=False)
    layer_fn = transformer_stack_layer_fn(D_MODEL, HEADS, FF)
    params = [variables["params"][f"transformer_{i}"]
              for i in range(LAYERS)]
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 12, D_MODEL),
                          jnp.float32)
    return layer_fn, params, x


def _sequential(layer_fn, params, x):
    for p in params:
        x = layer_fn(p, x)
    return x


class TestForward:
    @pytest.mark.parametrize("microbatches", [4, 8])
    def test_bit_exact_vs_sequential(self, stack, microbatches):
        layer_fn, params, x = stack
        mesh = create_stage_mesh(LAYERS)
        got = jax.jit(lambda sp, xx: pipeline_apply(
            layer_fn, sp, xx, mesh, microbatches))(
            stack_stage_params(params), x)

        # Ulp-tight against the sequential loop run at the SAME microbatch
        # shape (same math; only jit-fusion reassociation differs)...
        mb = x.shape[0] // microbatches
        want_mb = jnp.concatenate(
            [_sequential(layer_fn, params, x[i * mb:(i + 1) * mb])
             for i in range(microbatches)], axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want_mb),
                                   rtol=1e-4, atol=2e-6)
        # ...and float-tight against the full-batch loop (a different batch
        # tiling re-associates reductions at the ~1e-4 level).
        want_full = _sequential(layer_fn, params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want_full),
                                   rtol=1e-3, atol=1e-5)

    def test_encoder_param_stacker(self, stack):
        layer_fn, params, x = stack
        model = EMGEncoderTransformer(
            model_size=D_MODEL, num_extra_res_blocks=1,
            num_transformer_layers=LAYERS, num_heads=HEADS,
            dim_feedforward=FF, dropout=0.0)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16 * 16, 8)), train=False)
        stacked = encoder_transformer_params(variables, LAYERS)
        leaf = jax.tree.leaves(stacked)[0]
        assert leaf.shape[0] == LAYERS

    def test_rejects_indivisible_microbatches(self, stack):
        layer_fn, params, x = stack
        mesh = create_stage_mesh(LAYERS)
        with pytest.raises(ValueError):
            pipeline_apply(layer_fn, stack_stage_params(params), x, mesh, 3)


class TestDataComposition:
    """Pipeline x data parallelism: on a (data=2, stage=4) mesh each data
    replica pipelines its slice of every microbatch — same schedule, same
    results as the 1-D stage mesh and the sequential loop."""

    def test_forward_matches_sequential_on_2d_mesh(self, stack):
        layer_fn, params, x = stack
        mesh = create_stage_mesh_2d(2, LAYERS)
        got = jax.jit(lambda sp, xx: pipeline_apply(
            layer_fn, sp, xx, mesh, 4))(stack_stage_params(params), x)
        mb = x.shape[0] // 4
        want = jnp.concatenate(
            [_sequential(layer_fn, params, x[i * mb:(i + 1) * mb])
             for i in range(4)], axis=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=2e-6)

    def test_grads_match_sequential_on_2d_mesh(self, stack):
        layer_fn, params, x = stack
        mesh = create_stage_mesh_2d(2, LAYERS)
        stacked = stack_stage_params(params)
        g_pipe = jax.jit(jax.grad(lambda sp: jnp.sum(jnp.square(
            pipeline_apply(layer_fn, sp, x, mesh, 4)))))(stacked)
        g_seq = stack_stage_params(jax.grad(
            lambda pl: jnp.sum(jnp.square(_sequential(layer_fn, pl, x))))(
            params))
        # Looser than the 1-D case: parameter grads now also psum over the
        # 'data' axis, adding one more f32 reduction-order perturbation
        # (observed ~0.6% relative on near-zero LayerNorm coordinates).
        for (kp, a), b in zip(jax.tree.leaves_with_path(g_pipe),
                              jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-5,
                err_msg=jax.tree_util.keystr(kp))

    def test_rejects_indivisible_data_slice(self, stack):
        layer_fn, params, x = stack  # batch 8, mb=2 per microbatch
        mesh = create_stage_mesh_2d(2, LAYERS)
        with pytest.raises(ValueError):
            # 8 microbatches -> mb=1, not divisible by data=2.
            pipeline_apply(layer_fn, stack_stage_params(params), x, mesh, 8)


class TestGradients:
    def test_grads_match_sequential(self, stack):
        """d(loss)/d(params) through the pipeline == through the loop —
        ppermute/scan are differentiable, so training-time pipelining
        needs no separate backward schedule."""
        layer_fn, params, x = stack
        mesh = create_stage_mesh(LAYERS)
        stacked = stack_stage_params(params)

        def loss_pipe(sp):
            return jnp.sum(jnp.square(
                pipeline_apply(layer_fn, sp, x, mesh, 4)))

        def loss_seq(plist):
            return jnp.sum(jnp.square(_sequential(layer_fn, plist, x)))

        g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
        g_seq = jax.grad(loss_seq)(params)
        g_seq_stacked = stack_stage_params(g_seq)
        for (kp, a), b in zip(jax.tree.leaves_with_path(g_pipe),
                              jax.tree.leaves(g_seq_stacked)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(kp))
