"""Tests for the standalone evaluation CLI (`ste_gan_tpu/evaluate.py`).

The reference has no offline evaluation entry point (metrics only exist
inside its train loops); these tests pin the CLI's two modes — the GAN
reference-protocol metrics + full-utterance round trip, and the encoder
decode metrics with the labeled confusion matrix — on fabricated tiny runs
over the synthetic corpus.
"""
import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ste_gan_tpu import constants as C
from ste_gan_tpu import evaluate as ev
from ste_gan_tpu.config import Config, load_config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.models.emg_encoder import init_emg_encoder
from ste_gan_tpu.train.checkpoint import CheckpointManager, save_pytree
from ste_gan_tpu.train.gan import build_models, init_state

TINY_ENC_PARAMS = {"model_size": 32, "num_extra_res_blocks": 3,
                   "num_transformer_layers": 1, "dropout": 0.0}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    generate_synthetic_corpus(root, num_train=6, num_valid=2, num_test=2,
                              num_sessions=3, min_frames=34, max_frames=40,
                              seed=0)
    return root


def tiny_cfg(corpus) -> Config:
    cfg = Config()
    cfg.data.dataset_root = str(corpus)
    cfg.data.num_emg_sessions = 3
    cfg.train.chunk_size = 512
    cfg.train.batch_size = 4
    cfg.train.mixed_precision = False
    cfg.model.params = {"channels": 32}
    cfg.model.discriminator_params = {"num_multi_pool": 1,
                                      "num_multi_scale": 1}
    cfg.emg_encoder.params = dict(TINY_ENC_PARAMS)
    return cfg


@pytest.fixture(scope="module")
def gan_run(corpus, tmp_path_factory):
    """Fabricated GAN run dir: config snapshot + vocab JSONs + a 'best'
    checkpoint of a freshly initialised state (eval plumbing does not need
    a trained model), plus a saved frozen-encoder checkpoint."""
    run_dir = tmp_path_factory.mktemp("gan_run")
    cfg = tiny_cfg(corpus)
    models = build_models(cfg)
    state = init_state(cfg, models, jax.random.PRNGKey(0))
    CheckpointManager(run_dir).save("best", state, epoch=0)
    cfg.save(run_dir / "config.yaml")
    train_ds = EMGDataset(corpus, partition="train",
                          train_emg_length=cfg.train.chunk_size)
    train_ds.save_session_and_speaking_mode_mapping_json(run_dir)

    enc_vars = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, 8)), train=False)
    )(jax.random.PRNGKey(1))
    enc_ckpt = run_dir / "enc_ckpt"
    save_pytree(enc_ckpt, enc_vars)
    return run_dir, enc_ckpt


def test_evaluate_gan_chunked_and_full(gan_run):
    run_dir, enc_ckpt = gan_run
    report = ev.evaluate_gan(run_dir, enc_ckpt, partition="valid",
                             full=True, bucket_frames=16)
    ch = report["chunked"]
    for key in ("val/waveform", "val/multi_td", "val/speech_unit",
                "val/phoneme"):
        assert np.isfinite(ch[key]), key
    # Accuracies are PERCENTAGES (reference train_utils semantics).
    assert 0.0 <= ch["val/phoneme_accuracy_avg"] <= 100.0
    assert 0.0 <= ch["val/phoneme_accuracy_avg_no_sil"] <= 100.0
    assert ch["num_batches"] >= 1

    full = report["full_utterance"]
    assert full["num_utterances"] == 2
    assert full["total_frames"] == sum(u["frames"]
                                       for u in full["per_utterance"])
    conf = np.asarray(full["confusion"])
    assert conf.shape == (C.NUM_PHONEMES, C.NUM_PHONEMES)
    # Aggregate accuracy must equal the confusion diagonal mass.
    assert conf.sum() == full["total_frames"]
    assert abs(np.trace(conf) / conf.sum()
               - full["phoneme_accuracy"]) < 1e-9
    assert full["confusion_labels"] == list(C.PHONEME_INVENTORY)


def test_evaluate_gan_cli_writes_report(gan_run, tmp_path):
    run_dir, enc_ckpt = gan_run
    out = tmp_path / "report.json"
    report = ev.main(["gan", "--run_dir", str(run_dir),
                      "--emg_enc_ckpt", str(enc_ckpt), "--out", str(out)])
    on_disk = json.loads(out.read_text())
    assert on_disk["mode"] == "gan"
    assert on_disk["partition"] == "valid"
    assert on_disk["chunked"] == report["chunked"]
    assert "full_utterance" not in on_disk  # --full not requested


def test_evaluate_encoder(corpus, tmp_path):
    yaml_path = tmp_path / "enc.yaml"
    yaml_path.write_text(
        'type: "EMGEncoderTransformer"\nparams:\n'
        + "".join(f"  {k}: {v}\n" for k, v in TINY_ENC_PARAMS.items()))
    cfg = load_config(emg_enc_cfg=str(yaml_path))
    model = init_emg_encoder(cfg)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 1600, 8)), train=False))(jax.random.PRNGKey(2))
    ckpt = tmp_path / "enc"
    save_pytree(ckpt, variables)

    report = ev.evaluate_encoder(ckpt, corpus, emg_enc_cfg=str(yaml_path),
                                 partition="valid", batch_size=2)
    assert np.isfinite(report["loss"])
    assert 0.0 <= report["phoneme_accuracy"] <= 1.0
    conf = np.asarray(report["confusion"])
    assert conf.shape == (C.NUM_PHONEMES, C.NUM_PHONEMES)
    # Every scored frame lands in the confusion matrix.
    assert conf.sum() > 0
    assert abs(np.trace(conf) / conf.sum()
               - report["phoneme_accuracy"]) < 1e-9
    # top_confusions is sorted off-diagonal mass.
    counts = [c["count"] for c in report["top_confusions"]]
    assert counts == sorted(counts, reverse=True)


def test_top_confusions_labeling():
    conf = np.zeros((C.NUM_PHONEMES, C.NUM_PHONEMES), np.int64)
    conf[3, 5] = 7
    conf[2, 2] = 100  # diagonal: excluded
    conf[1, 0] = 4
    top = ev.top_confusions(conf, k=5)
    assert top[0] == {"predicted": C.PHONEME_INVENTORY[3],
                      "target": C.PHONEME_INVENTORY[5], "count": 7}
    assert top[1]["count"] == 4
    assert len(top) == 2
