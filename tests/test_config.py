"""Config system: YAML merge, CLI override semantics, run naming,
checkpoint manager round trips."""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import (
    Config, TrainConfig, add_eval_hyperparams_to_parser, apply_cli_overrides,
    config_from_dict, create_ste_gan_model_name, load_config, train_setting)
from ste_gan_tpu.train.checkpoint import CheckpointManager, load_pytree, save_pytree


class TestConfigMerge:
    def test_three_file_merge(self, tmp_path):
        (tmp_path / "base.yaml").write_text(
            "model_base_dir: exp/x\nmodel:\n  discriminator_small: false\n"
            "train:\n  batch_size: 7\n")
        (tmp_path / "data.yaml").write_text(
            "dataset_root: /data\nname: mini\nnum_emg_sessions: 3\n")
        (tmp_path / "enc.yaml").write_text(
            "type: EMGEncoderTransformer\nparams:\n  model_size: 32\n")
        cfg = load_config(config=tmp_path / "base.yaml",
                          data=tmp_path / "data.yaml",
                          emg_enc_cfg=tmp_path / "enc.yaml")
        assert cfg.model_base_dir == "exp/x"
        assert cfg.model.discriminator_small is False
        assert cfg.train.batch_size == 7
        assert cfg.data.name == "mini" and cfg.data.num_emg_sessions == 3
        assert cfg.emg_encoder.params["model_size"] == 32
        # Untouched values keep reference defaults.
        assert cfg.train.loss_multi_td_weight == 15.0

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            config_from_dict({"train": {"not_a_key": 1}})

    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.train.max_steps = 123
        cfg.save(tmp_path / "c.yaml")
        cfg2 = load_config(config=tmp_path / "c.yaml")
        assert cfg2.train.max_steps == 123


class TestCliOverrides:
    def _args(self, **kw):
        parser = add_eval_hyperparams_to_parser(argparse.ArgumentParser())
        args = parser.parse_args([])
        for key, value in kw.items():
            setattr(args, key, value)
        return args

    def test_negative_means_keep(self):
        cfg = Config()
        apply_cli_overrides(cfg, self._args())
        assert cfg.train.loss_speech_unit_weight == 1.0
        assert cfg.train.batch_size == C.BATCH_SIZE

    def test_positive_overrides(self):
        cfg = Config()
        apply_cli_overrides(cfg, self._args(weight_td=3.5, batch_size=8,
                                            max_steps=42))
        assert cfg.train.loss_multi_td_weight == 3.5
        assert cfg.train.batch_size == 8
        assert cfg.train.max_steps == 42

    def test_small_weight_disables_loss(self):
        """Reference semantics: weight < 1e-3 turns the loss off
        (ste_gan/train_utils.py:83-89)."""
        cfg = Config()
        apply_cli_overrides(cfg, self._args(weight_su=0.0, weight_phoneme=0.0))
        assert cfg.train.loss_speech_unit_error is False
        assert cfg.train.loss_phoneme_error is False

    def test_speech_feature_type_override(self):
        cfg = Config()
        apply_cli_overrides(cfg, self._args(speech_feature_type="MFCCS"))
        assert cfg.model.speech_feature_type == "MFCCS"


class TestRunNaming:
    def test_encodes_hyperparams(self):
        cfg = Config()
        name = create_ste_gan_model_name(cfg, add_timestamp=False)
        assert "gaddy_voiced_EMGGeneratorGanTTS_SPEECH_UNITS" in name
        assert "small_dis" in name and "chunk_2048" in name
        assert "fmw_7.0" in name and "tdw_15.0" in name

    def test_debug_prefix(self):
        name = create_ste_gan_model_name(Config(), debug=True)
        assert name.startswith("DEBUG_")


class TestCheckpointManager:
    def test_round_trip_and_latest(self, tmp_path):
        mgr = CheckpointManager(tmp_path)
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        mgr.save_periodic(tree, step=10, epoch=1)
        mgr.save_periodic(jax.tree.map(lambda x: x * 2, tree), step=20, epoch=2)
        mgr.save_best(tree, epoch=1)
        assert mgr.latest_periodic_tag() == "checkpoint-00000020"
        restored, epoch = mgr.restore_latest(tree)
        assert epoch == 2
        np.testing.assert_allclose(restored["a"], np.arange(4.0) * 2)

    def test_pytree_helpers(self, tmp_path):
        tree = {"x": jnp.full((3,), 7.0)}
        save_pytree(tmp_path / "t", tree)
        out = load_pytree(tmp_path / "t", tree)
        np.testing.assert_allclose(out["x"], tree["x"])


class TestTrainSettingSingleSource:
    """train_setting is the ONE fallback for duck-typed train configs:
    a field-stripped object must read back exactly the TrainConfig
    dataclass defaults (VERDICT r4 #6 — fused_disc_passes drifted when a
    call site carried its own literal default)."""

    def test_stripped_object_reads_dataclass_defaults(self):
        import dataclasses
        from types import SimpleNamespace

        empty = SimpleNamespace()  # the fully stripped legacy snapshot
        defaults = TrainConfig()
        for f in dataclasses.fields(TrainConfig):
            assert train_setting(empty, f.name) == getattr(defaults, f.name), f.name

    def test_present_field_wins(self):
        from types import SimpleNamespace

        t = SimpleNamespace(fused_disc_passes=False, grad_accum=4)
        assert train_setting(t, "fused_disc_passes") is False
        assert train_setting(t, "grad_accum") == 4

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            train_setting(TrainConfig(), "not_a_train_field")
