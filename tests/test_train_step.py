"""Integration tests for the fused GAN train step: single-device loss
decrease and 8-device data-parallel execution on the virtual CPU mesh."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.data.collate import ste_gan_collate
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.models.discriminator import DiscriminatorEnsemble
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
from ste_gan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ste_gan_tpu.train.gan import (
    GANModels, build_models, epoch_lr, init_state, make_eval_step,
    make_train_step, set_learning_rate)

TINY_PERIOD_SPEC = ((8, 3, 1, 2), (16, 3, 3, 2))
TINY_SCALE_SPEC = ((8, 15, 1, 1, 7), (16, 5, 2, 4, 2))


def tiny_cfg() -> Config:
    cfg = Config()
    cfg.train.chunk_size = 512
    cfg.train.batch_size = 8
    cfg.train.mixed_precision = False
    cfg.model.params = {"channels": 32}
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
    }
    cfg.data.num_emg_sessions = 4
    return cfg


def tiny_models(cfg, rng):
    """Returns (GANModels, frozen encoder variables). Mirrors the factory's
    grouped-conv impl selection (models/discriminator.py): accumulating
    configs take the partitioner-safe kernel-grad path."""
    generator = EMGGeneratorGanTTS(num_sessions=4, channels=32)
    discriminator = DiscriminatorEnsemble(
        num_multi_pool=2, num_multi_scale=2,
        period_spec_override=TINY_PERIOD_SPEC,
        scale_spec_override=TINY_SCALE_SPEC,
        conv_impl=("safe_grad"
                   if int(getattr(cfg.train, "grad_accum", 1)) > 1
                   else "xla"))
    encoder = EMGEncoderTransformer(
        model_size=32, num_extra_res_blocks=3, num_transformer_layers=1,
        num_heads=4, dim_feedforward=64, dropout=0.0)
    enc_vars = encoder.init(rng, jnp.zeros((1, cfg.train.chunk_size, 8)),
                            train=False)
    return GANModels(generator, discriminator, encoder), enc_vars


def synthetic_batch(cfg, batch_size=None, seed=0):
    rng = np.random.default_rng(seed)
    b = batch_size or cfg.train.batch_size
    frames = cfg.train.chunk_size // C.HOPSIZE
    return {
        C.DataType.REAL_EMG: jnp.asarray(
            np.tanh(rng.normal(0, 0.4, (b, cfg.train.chunk_size, 8))), jnp.float32),
        C.DataType.SPEECH_UNITS: jnp.asarray(
            rng.normal(0, 1, (b, frames, 256)), jnp.float32),
        C.DataType.PHONEMES: jnp.asarray(
            rng.integers(0, C.NUM_PHONEMES, (b, frames)), jnp.int32),
        C.DataType.SESSION_INDEX: jnp.asarray(rng.integers(0, 4, (b,)), jnp.int32),
        C.DataType.SPEAKING_MODE_INDEX: jnp.zeros((b,), jnp.int32),
    }


class TestTrainStep:
    def test_losses_decrease(self):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, models), donate_argnums=0)

        batch = synthetic_batch(cfg)
        history = []
        for _ in range(30):
            state, metrics = step(state, batch, enc_vars)
            history.append(float(metrics["loss/generator"]))
        # The generator loss on a fixed batch must drop substantially.
        assert history[-1] < history[0] * 0.8, history[::6]
        assert int(state.step) == 30

    def test_metrics_complete_and_finite(self):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, models))
        _, metrics = step(state, synthetic_batch(cfg), enc_vars)
        for key in ("loss/generator", "loss/discriminator", "loss/multi_td",
                    "loss/speech_unit", "loss/phoneme", "loss/feature_matching",
                    "loss/adversarial", "count/num_phones", "count/num_correct"):
            assert key in metrics, key
            assert np.isfinite(float(metrics[key])), key
        frames = cfg.train.chunk_size // C.HOPSIZE
        assert int(metrics["count/num_phones"]) == cfg.train.batch_size * frames

    def test_td_only_arm_emits_zero_counters(self):
        """The TD-only ablation configuration (adversarial, feature-match,
        SU, and phoneme losses all disabled — benchmarks/
        adversarial_ablation.py arm 'td_only') must still emit the phoneme
        counter keys (as zeros) so the trainer's in-step epoch
        accumulation works unchanged, and must train: no encoder/disc
        forward runs, only the TD loss drives G."""
        cfg = tiny_cfg()
        cfg.train.loss_adversarial = ""
        cfg.train.loss_feat_match_error = False
        cfg.train.loss_speech_unit_error = False
        cfg.train.loss_phoneme_error = False
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, models), donate_argnums=0)
        batch = synthetic_batch(cfg)
        history = []
        for _ in range(10):
            state, metrics = step(state, batch, enc_vars)
            history.append(float(metrics["loss/generator"]))
        for key in ("count/num_phones", "count/num_correct",
                    "count/num_silence", "count/num_correct_no_silence"):
            assert int(metrics[key]) == 0, key
        assert "loss/adversarial" not in metrics
        assert "loss/speech_unit" not in metrics
        assert history[-1] < history[0], history

    def test_spectral_state_updates(self):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, models))
        new_state, _ = step(state, synthetic_batch(cfg), enc_vars)
        before = jax.tree.leaves(state.disc_spectral)[0]
        after = jax.tree.leaves(new_state.disc_spectral)[0]
        assert not np.allclose(before, after)

    def test_lr_schedule_injection(self):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        assert np.isclose(epoch_lr(cfg, 0), cfg.train.learning_rate)
        assert np.isclose(epoch_lr(cfg, 10),
                          cfg.train.learning_rate * 0.999 ** 10)
        opt_g = set_learning_rate(state.opt_g, epoch_lr(cfg, 10))
        assert np.isclose(float(opt_g.hyperparams["learning_rate"]),
                          cfg.train.learning_rate * 0.999 ** 10)


class TestDataParallel:
    def test_sharded_step_matches_single_device(self):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        batch = synthetic_batch(cfg)
        step = make_train_step(cfg, models)

        # Single device.
        s1, m1 = jax.jit(step)(state, batch, enc_vars)

        # 8-device mesh: params replicated, batch sharded.
        mesh = create_mesh(8)
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, batch)
        enc_r = replicate(mesh, enc_vars)
        s8, m8 = jax.jit(step)(state_r, batch_s, enc_r)

        np.testing.assert_allclose(float(m1["loss/generator"]),
                                   float(m8["loss/generator"]), rtol=2e-4)
        np.testing.assert_allclose(float(m1["loss/discriminator"]),
                                   float(m8["loss/discriminator"]), rtol=2e-4)
        # Updated parameters agree across the two executions.
        l1 = jax.tree.leaves(s1.gen_params)[0]
        l8 = jax.tree.leaves(s8.gen_params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=1e-3, atol=1e-6)

    def test_eval_step(self):
        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        eval_step = jax.jit(make_eval_step(cfg, models))
        metrics = eval_step(state.gen_params, synthetic_batch(cfg), enc_vars)
        for key in ("val/waveform", "val/multi_td", "val/speech_unit",
                    "val/phoneme", "count/num_phones"):
            assert np.isfinite(float(metrics[key])), key


class TestFusedDiscPasses:
    def test_semantics_exact_vs_unfused(self):
        """The paired ensemble pass is SEMANTICS-EXACT vs two separate
        passes: weight-normed sub-discriminators are stateless (stacked
        batch == two calls), and the spectral scale discriminator runs
        fake-then-real inside the pass so its power iteration advances
        identically. Losses, updated parameters, and the spectral state all
        match (tolerances cover conv reduction-order differences between
        batch-B and batch-2B programs)."""
        cfg = tiny_cfg()
        cfg.train.fused_disc_passes = False
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        batch = synthetic_batch(cfg)

        state0 = init_state(cfg, models, jax.random.PRNGKey(0))
        s_ref, m_ref = jax.jit(make_train_step(cfg, models))(
            state0, batch, enc_vars)

        cfg_f = tiny_cfg()
        cfg_f.train.fused_disc_passes = True
        state1 = init_state(cfg_f, models, jax.random.PRNGKey(0))
        s_fused, m_fused = jax.jit(make_train_step(cfg_f, models))(
            state1, batch, enc_vars)

        for key in ("loss/discriminator", "loss/adversarial",
                    "loss/feature_matching", "loss/generator"):
            np.testing.assert_allclose(float(m_fused[key]), float(m_ref[key]),
                                       rtol=1e-4, err_msg=key)
        # Spectral-norm power-iteration state advances identically.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6),
            s_ref.disc_spectral, s_fused.disc_spectral)
        # Updated discriminator parameters match.
        ref_leaves = jax.tree.leaves(s_ref.disc_params)
        fused_leaves = jax.tree.leaves(s_fused.disc_params)
        for a, b in zip(ref_leaves, fused_leaves):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-6)


class TestStrippedConfigDefaults:
    def test_step_builder_matches_dataclass_defaults(self):
        """A duck-typed config whose train object lacks every TPU-native
        field (a legacy snapshot) must build EXACTLY the same step as the
        dataclass defaults — one source of truth (VERDICT r4 #6: a
        call-site literal silently flipped fused_disc_passes)."""
        import types

        cfg = tiny_cfg()
        models, enc_vars = tiny_models(cfg, jax.random.PRNGKey(1))
        state = init_state(cfg, models, jax.random.PRNGKey(0))
        batch = synthetic_batch(cfg)

        # Strip every field a pre-extension snapshot would not carry.
        stripped_names = {
            "fused_disc_passes", "generator_ema", "remat", "grad_accum",
            "flat_optimizer", "fused_optimizer", "grouped_conv_impl",
            "pallas_grouped_conv", "model_parallel", "fsdp",
            "steps_per_dispatch", "device_resident_data",
            "host_rss_restart_gb", "transfer_dtype",
        }
        train_fields = {f.name: getattr(cfg.train, f.name)
                        for f in dataclasses.fields(type(cfg.train))
                        if f.name not in stripped_names}
        duck = types.SimpleNamespace(
            model=cfg.model, data=cfg.data, emg_encoder=cfg.emg_encoder,
            train=types.SimpleNamespace(**train_fields))

        s_full, m_full = jax.jit(make_train_step(cfg, models))(
            state, batch, enc_vars)
        s_duck, m_duck = jax.jit(make_train_step(duck, models))(
            state, batch, enc_vars)

        for key in sorted(m_full):
            np.testing.assert_array_equal(
                np.asarray(m_full[key]), np.asarray(m_duck[key]), err_msg=key)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            s_full.gen_params, s_duck.gen_params)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            s_full.disc_spectral, s_duck.disc_spectral)
