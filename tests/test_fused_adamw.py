"""Fused Pallas AdamW vs optax.adamw (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ste_gan_tpu.ops.fused_adamw import (
    FusedAdamWState, fused_adamw, fused_adamw_update)


def _tree(rng):
    return {
        "w": jnp.asarray(rng.normal(size=(300, 70)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(70,)), jnp.float32),
        "scalar": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
    }


class TestFusedAdamW:
    def test_matches_optax_over_steps(self, rng):
        params = _tree(rng)
        lr, b1, b2, eps, wd = 2e-4, 0.8, 0.99, 1e-8, 1e-2

        ref_opt = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
        ref_state = ref_opt.init(params)
        ref_params = params

        state = FusedAdamWState(
            jnp.zeros((), jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params))
        fused_params = params

        for step in range(5):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    np.random.default_rng(step).normal(size=p.shape),
                    jnp.float32),
                params)
            updates, ref_state = ref_opt.update(grads, ref_state, ref_params)
            ref_params = optax.apply_updates(ref_params, updates)
            fused_params, state = fused_adamw_update(
                fused_params, grads, state, lr=lr, b1=b1, b2=b2, eps=eps,
                weight_decay=wd, interpret=True)

        for key in params:
            np.testing.assert_allclose(
                np.asarray(fused_params[key]), np.asarray(ref_params[key]),
                rtol=1e-5, atol=1e-7, err_msg=key)

    def test_optax_wrapper_interface(self, rng):
        params = _tree(rng)
        opt = fused_adamw(2e-4, b1=0.8, b2=0.99)
        state = opt.init(params)
        assert float(state.hyperparams["learning_rate"]) == pytest.approx(2e-4)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, state = opt.update(grads, state, params)
        new_params = optax.apply_updates(params, updates)
        # Matches optax.adamw after one step.
        ref = optax.adamw(2e-4, b1=0.8, b2=0.99, eps=1e-8, weight_decay=1e-2)
        ref_updates, _ = ref.update(grads, ref.init(params), params)
        want = optax.apply_updates(params, ref_updates)
        for key in params:
            np.testing.assert_allclose(np.asarray(new_params[key]),
                                       np.asarray(want[key]),
                                       rtol=1e-5, atol=1e-7)

    def test_injectable_lr(self, rng):
        params = _tree(rng)
        opt = fused_adamw(2e-4)
        state = opt.init(params)
        state.hyperparams["learning_rate"] = jnp.asarray(1e-5, jnp.float32)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        # With a 20x smaller LR the update magnitude shrinks accordingly.
        assert float(jnp.abs(updates["w"]).max()) < 2e-5


class TestFlatAdamW:
    """Flat single-buffer AdamW (ops/flat_adamw.py) — an opt-in backend
    (``cfg.train.flat_optimizer``); the trainer default is optax."""

    def test_matches_optax_over_steps(self, rng):
        from ste_gan_tpu.ops.flat_adamw import (
            flat_adamw_apply, flat_adamw_init)

        params = _tree(rng)
        lr, b1, b2, eps, wd = 2e-4, 0.8, 0.99, 1e-8, 1e-2
        ref_opt = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
        ref_state = ref_opt.init(params)
        ref_params = params
        state = flat_adamw_init(params, learning_rate=lr)
        flat_params = params

        for step in range(5):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    np.random.default_rng(step).normal(size=p.shape),
                    jnp.float32),
                params)
            updates, ref_state = ref_opt.update(grads, ref_state, ref_params)
            ref_params = optax.apply_updates(ref_params, updates)
            flat_params, state = flat_adamw_apply(
                flat_params, grads, state, b1=b1, b2=b2, eps=eps,
                weight_decay=wd)

        for key in params:
            np.testing.assert_allclose(
                np.asarray(flat_params[key]), np.asarray(ref_params[key]),
                rtol=1e-6, atol=1e-8, err_msg=key)

    def test_injectable_lr_and_state_shapes(self, rng):
        from ste_gan_tpu.ops.flat_adamw import (
            flat_adamw_apply, flat_adamw_init)
        from ste_gan_tpu.train.gan import set_learning_rate

        params = _tree(rng)
        state = flat_adamw_init(params, learning_rate=2e-4)
        n = sum(p.size for p in jax.tree.leaves(params))
        assert state.mu.shape == (n,)
        state = set_learning_rate(state, 1e-5)
        grads = jax.tree.map(jnp.ones_like, params)
        new_params, state = flat_adamw_apply(params, grads, state)
        assert int(state.count) == 1
        # LR actually took effect (small update magnitude).
        delta = float(jnp.max(jnp.abs(new_params["w"] - params["w"])))
        assert delta < 1e-3

    def test_pallas_flat_variant_matches(self, rng):
        from ste_gan_tpu.ops.flat_adamw import (
            flat_adamw_apply, flat_adamw_init)

        params = _tree(rng)
        grads = jax.tree.map(lambda p: p * 0.1, params)
        s0 = flat_adamw_init(params, learning_rate=2e-4)
        p_a, s_a = flat_adamw_apply(params, grads, s0, b1=0.8, b2=0.99)
        p_b, s_b = flat_adamw_apply(params, grads, s0, b1=0.8, b2=0.99,
                                    use_pallas=True)
        for key in params:
            np.testing.assert_allclose(np.asarray(p_a[key]),
                                       np.asarray(p_b[key]),
                                       rtol=1e-6, atol=1e-7, err_msg=key)
