"""Encoder pre-training with GPipe pipeline parallelism at the product
surface: ``train_encoder_model(..., pipeline_stages=S)`` (CLI
``--pipeline_stages``) reproduces the single-device loss trajectory.

The library mechanism (parallel/pipeline_parallel.py) has its own
forward/gradient equality proofs in tests/test_pipeline_parallel.py; this
file is the composition proof at the trainer level, mirroring what
tests/test_encoder_parallel.py::TestTrainerE2E does for the data- and
tensor-parallel axes: same corpus, same seeds, same budget — the pipelined
trainer's train/val loss series must match the sequential trainer's to
float32 reduction-order noise. Dropout is 0 in the test config because the
two schedules cannot share a dropout stream (documented in
EMGEncoderTransformer.pipelined); everything else (shift augmentation RNG,
BatchNorm statistics, AdamW updates) is common math.

Reference anchor: the reference encoder trainer is strictly single-device
(ste_gan/emg_encoder/train.py:150-236); pipelining is a TPU scaling
extension (SURVEY.md §2.3).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.config import Config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.models.emg_encoder import init_emg_encoder
from ste_gan_tpu.train.encoder import train_encoder_model

pytestmark = pytest.mark.slow


def _datasets(corpus):
    train_ds = EMGDataset(corpus, "train", return_mfccs=False,
                          return_emg_feats=False, filter_by_length=False,
                          only_include_voiced=False)
    dev_ds = EMGDataset(
        corpus, "valid", return_mfccs=False, return_emg_feats=False,
        filter_by_length=False, only_include_voiced=False,
        session_id_to_idx=train_ds.session_id_to_idx,
        speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx)
    return train_ds, dev_ds


def _cfg(corpus):
    cfg = Config()
    cfg.data.dataset_root = str(corpus)
    # 2 transformer layers so a 2-stage pipeline holds one layer per stage;
    # dropout 0: the pipelined schedule cannot reproduce the sequential
    # dropout stream (see EMGEncoderTransformer.pipelined docstring).
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 2, "dropout": 0.0,
    }
    return cfg


class TestPipelineTrainerE2E:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("pp_corpus") / "corpus"
        generate_synthetic_corpus(root, num_train=8, num_valid=2,
                                  num_test=2, num_sessions=2,
                                  min_frames=110, max_frames=140, seed=5)
        return root

    def _run(self, corpus, tmp_path, tag, dp, stages, microbatches=0,
             resident=True):
        train_ds, dev_ds = _datasets(corpus)
        run_dir = tmp_path / tag
        # max_len 6400 -> a 4-window fold: divisible by the data axis (2)
        # and by the reduced microbatch count (2) of the composed run.
        train_encoder_model(_cfg(corpus), train_ds, dev_ds, run_dir,
                            debug=False, max_len=6400, num_epochs=2,
                            warmup_steps=10, transfer_dtype="float32",
                            device_resident_data=resident,
                            data_parallel=dp, pipeline_stages=stages,
                            pipeline_microbatches=microbatches)
        vals = [json.loads(line) for line in
                (run_dir / "metrics.jsonl").read_text().splitlines()]
        return ([v["value"] for v in vals if v["tag"] == "train/loss"],
                [v["value"] for v in vals if v["tag"] == "val/loss"])

    def test_pipeline_trainer_matches_single(self, corpus, tmp_path):
        single_tr, single_val = self._run(corpus, tmp_path, "single", 1, 1)
        pp_tr, pp_val = self._run(corpus, tmp_path, "pp2", 1, 2)
        # Composed with the data axis AND the host input pipeline: a
        # (data=2, stage=2) mesh over 4 of the 8 virtual devices, fewer
        # microbatches (bigger bubble, same math).
        dppp_tr, dppp_val = self._run(corpus, tmp_path, "dp2pp2", 2, 2,
                                      microbatches=2, resident=False)

        assert len(single_tr) >= 2 and len(single_val) == 2
        np.testing.assert_allclose(pp_tr, single_tr, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(pp_val, single_val, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(dppp_tr, single_tr, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(dppp_val, single_val, rtol=1e-3,
                                   atol=1e-4)

    def test_guards(self, corpus, tmp_path):
        train_ds, dev_ds = _datasets(corpus)
        with pytest.raises(ValueError, match="mutually exclusive"):
            train_encoder_model(_cfg(corpus), train_ds, dev_ds,
                                tmp_path / "bad", max_len=8000,
                                num_epochs=1, pipeline_stages=2,
                                model_parallel=2)
        with pytest.raises(ValueError, match="not divisible"):
            # 2 layers cannot split over 4 stages... caught at first step
            # construction time inside the pipelined method.
            train_encoder_model(_cfg(corpus), train_ds, dev_ds,
                                tmp_path / "bad2", max_len=8000,
                                num_epochs=1, pipeline_stages=4)


class TestPipelinedMethodEquality:
    """Module-level: EMGEncoderTransformer.pipelined == __call__ (eval and
    dropout-free train modes), gradients included."""

    def test_forward_and_grad_match(self, rng):
        from ste_gan_tpu.parallel.pipeline_parallel import create_stage_mesh

        cfg = Config()
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 4, "dropout": 0.0,
        }
        model = init_emg_encoder(cfg)
        x = jnp.asarray(rng.normal(size=(4, 400, 8)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        mesh = create_stage_mesh(2)

        seq_su, seq_ph = model.apply(variables, x, train=False)
        pp_su, pp_ph = model.apply(variables, x, mesh, 4, train=False,
                                   method="pipelined")
        np.testing.assert_allclose(np.asarray(pp_su), np.asarray(seq_su),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pp_ph), np.asarray(seq_ph),
                                   rtol=1e-5, atol=1e-5)

        def loss(params, method, *extra):
            su, ph = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, *extra, train=False, method=method)
            return jnp.sum(su * su) + jnp.sum(jax.nn.log_softmax(ph))

        g_seq = jax.grad(loss)(variables["params"], "__call__")
        g_pp = jax.grad(loss)(variables["params"], "pipelined", mesh, 4)
        flat_seq = jax.tree.leaves(g_seq)
        flat_pp = jax.tree.leaves(g_pp)
        assert len(flat_seq) == len(flat_pp)
        for a, b in zip(flat_seq, flat_pp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_moe_rejected(self):
        from ste_gan_tpu.parallel.pipeline_parallel import create_stage_mesh

        cfg = Config()
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 2, "dropout": 0.0, "moe_experts": 2,
        }
        model = init_emg_encoder(cfg)
        x = jnp.zeros((2, 400, 8))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        with pytest.raises(NotImplementedError, match="MoE"):
            model.apply(variables, x, create_stage_mesh(2), 2,
                        method="pipelined")
