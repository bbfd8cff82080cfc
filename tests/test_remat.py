"""Rematerialisation (train.remat): jax.checkpoint around the generator
forward and both loss phases must not change the training math — remat
changes the schedule (recompute in the pullback instead of saving
residuals), not the values. Verified as multi-step trajectory equality
over the FULL train-state pytree, alone and composed with grad_accum."""
import copy

import jax
import numpy as np

from ste_gan_tpu.train.gan import init_state, make_train_step

from tests.test_grad_accum import _assert_states_close, _run
from tests.test_train_step import synthetic_batch, tiny_cfg, tiny_models


def test_remat_trajectory_matches_baseline():
    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    batches = [synthetic_batch(cfg, seed=s) for s in range(3)]

    base = jax.jit(make_train_step(cfg, models))
    s1, m1 = _run(cfg, models, enc_vars, base, state0, batches)

    cfg_r = copy.deepcopy(cfg)
    cfg_r.train.remat = True
    rmt = jax.jit(make_train_step(cfg_r, models))
    s2, m2 = _run(cfg_r, models, enc_vars, rmt, state0, batches)

    for key in m1:
        np.testing.assert_allclose(float(m1[key]), float(m2[key]),
                                   rtol=2e-3, atol=1e-5, err_msg=key)
    _assert_states_close(s1, s2)


def test_remat_composes_with_grad_accum():
    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    batches = [synthetic_batch(cfg, seed=s) for s in range(2)]

    base = jax.jit(make_train_step(cfg, models))
    s1, _ = _run(cfg, models, enc_vars, base, state0, batches)

    cfg_r = copy.deepcopy(cfg)
    cfg_r.train.remat = True
    cfg_r.train.grad_accum = 2
    models_r, _ = tiny_models(cfg_r, jax.random.PRNGKey(1))
    rmt = jax.jit(make_train_step(cfg_r, models_r))
    s2, _ = _run(cfg_r, models_r, enc_vars, rmt, state0, batches)
    _assert_states_close(s1, s2)


def test_remat_shrinks_compiled_temp_memory():
    """The knob's reason to exist, asserted on the compiled program: the
    remat step must reserve LESS temp (activation/workspace) HBM than the
    baseline step at identical shapes. memory_analysis is backend-provided;
    skip quietly if this backend doesn't expose it."""
    import pytest

    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    batch = synthetic_batch(cfg, seed=0)

    def temp_bytes(c):
        step = jax.jit(make_train_step(c, models), donate_argnums=0)
        mem = step.lower(state0, batch, enc_vars).compile().memory_analysis()
        if mem is None:
            pytest.skip("memory_analysis unavailable on this backend")
        return int(mem.temp_size_in_bytes)

    base = temp_bytes(cfg)
    cfg_r = copy.deepcopy(cfg)
    cfg_r.train.remat = True
    rmt = temp_bytes(cfg_r)
    assert rmt < base, (rmt, base)
