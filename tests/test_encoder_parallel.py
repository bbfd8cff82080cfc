"""Encoder pre-training over device meshes.

The reference encoder trainer is strictly single-device
(ste_gan/emg_encoder/train.py:150-236); here the SAME fused encoder step
runs data-parallel (folded windows sharded over a 1-D 'data' mesh,
parameters replicated — BatchNorm statistics stay global-batch exact via
GSPMD collectives) and tensor-parallel (params + AdamW moments sharded into
output-channel slabs over a 2-D (data, model) mesh).

Proof structure: GRADIENTS must match the single-device program to
float32 reduction-order noise (atol 1e-5; measured 1.8e-7). Post-AdamW
PARAMETER trajectories cannot be compared that tightly — at step k the
update is ~lr*sign(m/sqrt(v)), so any coordinate whose true gradient is
~0 flips a full lr on reduction-order noise alone — hence the trajectory
check bounds params by the Adam drift ceiling (2*steps*lr) and pins the
LOSS trajectory (which is insensitive to those zero-gradient coordinates)
tightly. E2E, train_encoder_model must reproduce its single-device loss
trajectory through the mesh paths, mirroring the GAN trainer's proof
(tests/test_multidevice_trajectory.py, tests/test_train_loop_tp.py).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import emg_encoder_constants as EC
from ste_gan_tpu.config import Config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.models.emg_encoder import init_emg_encoder
from ste_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ste_gan_tpu.parallel.tensor_parallel import (
    create_mesh_2d, shard_batch_2d, shard_state)
from ste_gan_tpu.train.encoder import (
    EncoderTrainState, make_encoder_train_step, make_optimizer,
    train_encoder_model, voiced_batch_loss)
from ste_gan_tpu.train.encoder_data import fold_encoder_batch

from tests.test_encoder_training import _items

SEQ_LEN = 50        # window = 400 EMG samples, 25 frames at 16:1
N_WIN = 8           # divisible by the 8-device data axis
MAX_SAMPLES = 16


def _tiny_state(rng_key):
    cfg = Config()
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
    }
    model = init_emg_encoder(cfg)
    variables = model.init(rng_key, jnp.zeros((1, SEQ_LEN * 8, 8)),
                           train=False)
    optimizer = make_optimizer()
    state = EncoderTrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]))
    return model, state


def _batches(n_steps):
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n_steps):
        items = _items(rng, [60, 70, 40])  # 170 frames <= 8*25 capacity
        fold = fold_encoder_batch(items, seq_len=SEQ_LEN, n_win=N_WIN,
                                  max_samples=MAX_SAMPLES)
        out.append(jax.tree.map(jnp.asarray, fold.as_dict()))
    return out


def _run(place_tree, place_batch, batches):
    model, state = _tiny_state(jax.random.PRNGKey(0))
    state = place_tree(state)
    step = jax.jit(make_encoder_train_step(model, MAX_SAMPLES),
                   donate_argnums=0)
    losses = []
    for i, batch in enumerate(batches):
        state, metrics = step(state, place_batch(batch), i)
        losses.append(float(metrics["loss"]))
    return state, losses


def _grads(place_tree, place_batch, batch):
    model, state = _tiny_state(jax.random.PRNGKey(0))
    state = place_tree(state)

    def loss_fn(params, batch_stats, b):
        (su, ph), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            b["emg_windows"], train=True,
            rngs={"shift": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        n, f, d = su.shape
        loss, _, _ = voiced_batch_loss(
            su.reshape(n * f, d), ph.reshape(n * f, -1), b, MAX_SAMPLES)
        return loss

    return jax.jit(jax.grad(loss_fn))(state.params, state.batch_stats,
                                      place_batch(batch))


def _assert_tree_close(tree_a, tree_b, rtol, atol, what):
    leaves_a, treedef_a = jax.tree.flatten(tree_a)
    leaves_b, treedef_b = jax.tree.flatten(tree_b)
    assert treedef_a == treedef_b, what
    assert len(leaves_a) > 0, what
    for i, (a, b) in enumerate(zip(leaves_a, leaves_b)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=rtol, atol=atol,
            err_msg=f"{what}: leaf {i}/{len(leaves_a)}")


MESH_CASES = {
    "dp8": (lambda: create_mesh(8), replicate, shard_batch),
    "tp_4x2": (lambda: create_mesh_2d(4, 2), shard_state, shard_batch_2d),
    "tp_2x4": (lambda: create_mesh_2d(2, 4), shard_state, shard_batch_2d),
}


class TestGradientParity:
    @pytest.mark.parametrize("case", sorted(MESH_CASES))
    def test_grads_match_single_device(self, case):
        """The mesh program's gradients == single-device gradients to f32
        reduction-order noise (BatchNorm's cross-shard batch statistics
        included — the semantic crux of sharding the window axis)."""
        batch = _batches(1)[0]
        g1 = _grads(lambda t: t, lambda b: b, batch)
        make_mesh, place_tree, place_batch = MESH_CASES[case]
        mesh = make_mesh()
        gm = _grads(lambda t: place_tree(mesh, t),
                    lambda b: place_batch(mesh, b), batch)
        _assert_tree_close(g1, gm, rtol=1e-3, atol=1e-5, what=f"grads[{case}]")


class TestStepTrajectory:
    @pytest.mark.parametrize("case", sorted(MESH_CASES))
    def test_trajectory_matches_single_device(self, case):
        n_steps = 4
        batches = _batches(n_steps)
        state1, losses1 = _run(lambda t: t, lambda b: b, batches)

        make_mesh, place_tree, place_batch = MESH_CASES[case]
        mesh = make_mesh()
        state_m, losses_m = _run(lambda t: place_tree(mesh, t),
                                 lambda b: place_batch(mesh, b), batches)

        assert int(state1.step) == int(state_m.step) == n_steps
        # Loss trajectory is the tight invariant (insensitive to the
        # zero-gradient sign-flip coordinates).
        np.testing.assert_allclose(losses_m, losses1, rtol=1e-4)
        # Params/batch_stats bounded by the Adam drift ceiling.
        drift = 2.0 * n_steps * EC.LEARNING_RATE
        _assert_tree_close(state1.params, state_m.params,
                           rtol=1e-3, atol=drift, what="params")
        _assert_tree_close(state1.batch_stats, state_m.batch_stats,
                           rtol=1e-3, atol=drift, what="batch_stats")

    def test_tp_params_actually_sharded(self):
        mesh = create_mesh_2d(4, 2)
        _, state = _tiny_state(jax.random.PRNGKey(0))
        state = shard_state(mesh, state)
        shard_counts = {
            len(leaf.sharding.device_set)
            for leaf in jax.tree.leaves(state.params)
            if hasattr(leaf, "sharding")}
        assert 8 in shard_counts  # at least the big kernels span the mesh
        kernels = [leaf for leaf in jax.tree.leaves(state.params)
                   if getattr(leaf, "ndim", 0) >= 2
                   and leaf.shape[-1] % 2 == 0 and leaf.shape[-1] >= 4]
        assert kernels
        sharded = [k for k in kernels
                   if k.sharding.spec and k.sharding.spec[-1] == "model"]
        assert len(sharded) > len(kernels) // 2


class TestTrainerE2E:
    def test_trainer_mesh_matches_single(self, tmp_path):
        """train_encoder_model with data_parallel=8 (device-resident fold +
        constrain_batch) and with (data=4, model=2) reproduces the
        single-device loss trajectory on a mixed voiced+silent corpus."""
        corpus = tmp_path / "corpus"
        generate_synthetic_corpus(corpus, num_train=8, num_valid=2,
                                  num_test=2, num_sessions=2, min_frames=110,
                                  max_frames=140, seed=5,
                                  silent_fraction=0.3)
        cfg = Config()
        cfg.data.dataset_root = str(corpus)
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 1, "dropout": 0.0,
        }

        def run(tag, dp, mp):
            train_ds = EMGDataset(corpus, "train", return_mfccs=False,
                                  return_emg_feats=False,
                                  filter_by_length=False,
                                  only_include_voiced=False)
            dev_ds = EMGDataset(
                corpus, "valid", return_mfccs=False, return_emg_feats=False,
                filter_by_length=False, only_include_voiced=False,
                session_id_to_idx=train_ds.session_id_to_idx,
                speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx)
            run_dir = tmp_path / tag
            train_encoder_model(cfg, train_ds, dev_ds, run_dir, debug=False,
                                max_len=8000, num_epochs=2, warmup_steps=10,
                                transfer_dtype="float32",
                                data_parallel=dp, model_parallel=mp)
            vals = [json.loads(line) for line in
                    (run_dir / "metrics.jsonl").read_text().splitlines()]
            return ([v["value"] for v in vals if v["tag"] == "train/loss"],
                    [v["value"] for v in vals if v["tag"] == "val/loss"])

        single_tr, single_val = run("single", 1, 1)
        dp_tr, dp_val = run("dp8", 8, 1)
        tp_tr, tp_val = run("tp", 4, 2)
        assert len(single_tr) >= 2 and len(single_val) == 2
        np.testing.assert_allclose(dp_tr, single_tr, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(dp_val, single_val, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(tp_tr, single_tr, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(tp_val, single_val, rtol=1e-3, atol=1e-4)
