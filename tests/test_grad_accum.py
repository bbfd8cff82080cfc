"""Gradient accumulation (train.grad_accum = K): the K-microbatch scanned
step must equal the full-batch fused step — exactly, not approximately —
because every loss term is a batch mean and spectral-norm power iteration
is batch-independent. Verified over multi-step trajectories on the FULL
train-state pytree, alone and composed with the data-parallel mesh and
with FSDP."""
import copy

import jax
import numpy as np
import pytest

from ste_gan_tpu.parallel.fsdp import fsdp_shard_state, fsdp_wrap_gan_step
from ste_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ste_gan_tpu.train.gan import init_state, make_train_step

from tests.test_train_step import synthetic_batch, tiny_cfg, tiny_models


def _assert_states_close(s1, s2, rtol=2e-3, atol=1e-5):
    flat1 = jax.tree_util.tree_flatten_with_path(s1)[0]
    flat2 = jax.tree.leaves(s2)
    assert len(flat1) == len(flat2)
    for (path, l1), l2 in zip(flat1, flat2):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(l1), np.asarray(jax.device_get(l2))
        if a.dtype.kind in "iu":
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                                       err_msg=name)


def _run(cfg, models, enc_vars, step_fn, state, batches, place=lambda b: b):
    metrics = None
    for b in batches:
        state, metrics = step_fn(state, place(b), enc_vars)
    return state, metrics


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_trajectory_matches_full_batch(accum):
    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    batches = [synthetic_batch(cfg, seed=s) for s in range(3)]

    full = jax.jit(make_train_step(cfg, models))
    s1, m1 = _run(cfg, models, enc_vars, full, state0, batches)

    cfg_a = copy.deepcopy(cfg)
    cfg_a.train.grad_accum = accum
    # Rebuild models from the accum config: the factory selects the
    # partitioner-safe grouped-conv kernel grad when grad_accum > 1
    # (params are untouched — only the apply path differs).
    models_a, _ = tiny_models(cfg_a, jax.random.PRNGKey(1))
    acc = jax.jit(make_train_step(cfg_a, models_a))
    s2, m2 = _run(cfg_a, models_a, enc_vars, acc, state0, batches)

    # Metrics match: means average back, counters sum back.
    for key in m1:
        np.testing.assert_allclose(float(m1[key]), float(m2[key]),
                                   rtol=2e-3, atol=1e-5, err_msg=key)
    _assert_states_close(s1, s2)


def test_accum_must_divide_batch():
    cfg = tiny_cfg()
    cfg.train.grad_accum = 3  # batch_size = 8
    models, _ = tiny_models(cfg, jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="grad_accum"):
        make_train_step(cfg, models)


def test_accum_composes_with_data_parallel_mesh():
    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    batches = [synthetic_batch(cfg, seed=s) for s in range(2)]

    full = jax.jit(make_train_step(cfg, models))
    s1, m1 = _run(cfg, models, enc_vars, full, state0, batches)

    cfg_a = copy.deepcopy(cfg)
    cfg_a.train.grad_accum = 2
    mesh = create_mesh(4)  # microbatch of 4 shards over 4 devices
    models_a, _ = tiny_models(cfg_a, jax.random.PRNGKey(1))
    acc = jax.jit(make_train_step(cfg_a, models_a))
    s2, m2 = _run(cfg_a, models_a, replicate(mesh, enc_vars), acc,
                  replicate(mesh, state0), batches,
                  place=lambda b: shard_batch(mesh, b))
    np.testing.assert_allclose(float(m1["loss/generator"]),
                               float(m2["loss/generator"]), rtol=2e-3)
    np.testing.assert_allclose(float(m1["loss/discriminator"]),
                               float(m2["loss/discriminator"]), rtol=2e-3)
    _assert_states_close(s1, s2)


def test_accum_composes_with_fsdp():
    cfg = tiny_cfg()
    models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
    state0 = init_state(cfg, models, jax.random.PRNGKey(0))
    batches = [synthetic_batch(cfg, seed=s) for s in range(2)]

    full = jax.jit(make_train_step(cfg, models))
    s1, m1 = _run(cfg, models, enc_vars, full, state0, batches)

    cfg_a = copy.deepcopy(cfg)
    cfg_a.train.grad_accum = 2
    mesh = create_mesh(4)
    models_a, _ = tiny_models(cfg_a, jax.random.PRNGKey(1))
    acc = jax.jit(fsdp_wrap_gan_step(make_train_step(cfg_a, models_a), mesh))
    s2, m2 = _run(cfg_a, models_a, fsdp_shard_state(mesh, enc_vars), acc,
                  fsdp_shard_state(mesh, state0), batches,
                  place=lambda b: shard_batch(mesh, b))
    np.testing.assert_allclose(float(m1["loss/generator"]),
                               float(m2["loss/generator"]), rtol=2e-3)
    np.testing.assert_allclose(float(m1["loss/discriminator"]),
                               float(m2["loss/discriminator"]), rtol=2e-3)
    _assert_states_close(s1, s2)
