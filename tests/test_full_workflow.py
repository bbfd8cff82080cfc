"""Raw-to-trained dress rehearsal (VERDICT r3 #2).

Chains the ENTIRE reference workflow (/root/reference/README.md:26-156)
inside this framework, starting from a synthetic RAW Gaddy&Klein session
tree — NOT from the synthetic fixture corpus:

    raw sessions -> clean_audio.py -> prep_data_gaddy_and_klein.py
    (stub HuBERT) -> encoder pre-training (voiced-only, from the prep
    output) -> frozen-encoder GAN training -> evaluate (reference
    protocol + full round trip + realism)

Every stage consumes exactly what the previous stage wrote to disk — the
seams between individually-tested components are what this file tests.
Models are tiny (the plumbing is the subject, not quality); the chain
runs on the virtual CPU mesh like every other test.
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.train import train_gan
from ste_gan_tpu.train.encoder import (init_voiced_datasets,
                                       train_encoder_model)

from tests.test_etl_scripts import SR, HubertStub, _write_session

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import clean_audio  # noqa: E402
import prep_data_gaddy_and_klein as prep  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """A raw tree big enough to TRAIN on: 6 voiced utts (2 routed to
    valid/test as silent references), 2 silent, 1 nonparallel."""
    root = tmp_path_factory.mktemp("raw_full")
    src = root / "emg_data"
    align = root / "text_alignments"
    rng = np.random.default_rng(11)

    _write_session(src / "voiced_parallel_data" / "v_sess", align, rng, [
        (0, "", "book1", -1, 1.0),
        (1, "dev reference", "book1", 10, 2.56),
        (2, "test reference", "book1", 11, 2.56),
        (3, "third utterance", "book1", 12, 2.56),
        (4, "fourth utterance", "book1", 13, 2.2),
        (5, "fifth utterance", "book1", 14, 2.56),
        (6, "sixth utterance", "book1", 15, 2.4),
    ])
    _write_session(src / "silent_parallel_data" / "s_sess", align, rng, [
        (0, "", "book1", -1, 1.0),
        (1, "dev reference", "book1", 10, 2.3),
        (2, "test reference", "book1", 11, 2.56),
    ])
    _write_session(src / "nonparallel_data" / "n_sess", align, rng, [
        (0, "", "book2", -1, 1.0),
        (1, "nonparallel utterance", "book2", 50, 2.56),
    ])
    (root / "testset_largedev.json").write_text(json.dumps({
        "dev": [["book1", 10]], "test": [["book1", 11]]}))
    return root


@pytest.fixture(scope="module")
def prepared_corpus(raw_tree, tmp_path_factory):
    """Stages 1+2: audio cleaning, then feature extraction with the
    deterministic HuBERT stub, producing the training corpus layout."""
    target = tmp_path_factory.mktemp("workflow") / "corpus"
    old_argv, old_hubert = sys.argv, prep.load_hubert
    try:
        sys.argv = ["clean_audio.py",
                    "--source_data_dir", str(raw_tree / "emg_data")]
        clean_audio.main()
        prep.load_hubert = lambda *a, **k: HubertStub()
        sys.argv = [
            "prep_data_gaddy_and_klein.py",
            "--source_data_dir", str(raw_tree / "emg_data"),
            "--text_alignment_dir", str(raw_tree / "text_alignments"),
            "--testset_file", str(raw_tree / "testset_largedev.json"),
            "--target_dir", str(target),
        ]
        prep.main()
    finally:
        sys.argv, prep.load_hubert = old_argv, old_hubert
    return target


def _tiny_cfg(corpus) -> Config:
    cfg = Config()
    cfg.data.dataset_root = str(corpus)
    cfg.data.num_emg_sessions = 3
    cfg.train.chunk_size = 512
    cfg.train.batch_size = 4
    cfg.train.mixed_precision = False
    cfg.train.max_steps = 4
    cfg.train.interval_log = 1
    cfg.train.interval_valid = 2
    cfg.train.interval_sample = 10_000
    cfg.train.interval_save = 4
    cfg.model.params = {"channels": 32}
    cfg.model.discriminator_params = {"num_multi_pool": 1,
                                      "num_multi_scale": 1}
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
    }
    return cfg


def test_raw_to_trained_dress_rehearsal(prepared_corpus, tmp_path):
    corpus = prepared_corpus

    # ---- Stage 3: encoder pre-training from the prep output ----------
    cfg = _tiny_cfg(corpus)
    trainset, devset, _ = init_voiced_datasets(corpus)
    assert len(trainset) == 5 and len(devset) == 1  # split routing held
    enc_dir = tmp_path / "emg_encoder"
    train_encoder_model(cfg, trainset, devset, enc_dir, num_epochs=2,
                        max_len=8192, warmup_steps=4,
                        transfer_dtype="float32")
    enc_ckpt = enc_dir / "best_val_loss_model"
    assert enc_ckpt.exists()
    enc_metrics = [json.loads(line) for line in
                   (enc_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(m["tag"] == "val/loss" for m in enc_metrics)

    # ---- Stage 4: GAN training with the frozen encoder ---------------
    run_dir = tmp_path / "gan_run"
    final_val = train_gan.train(cfg, run_dir, resume=False, debug=False,
                                emg_enc_ckpt=enc_ckpt)
    cfg.save(run_dir / "config.yaml")
    assert (run_dir / ".done").exists()
    assert (run_dir / "session_idx_to_id.json").exists()
    assert np.isfinite(final_val["val/speech_unit"])

    # ---- Stage 5: offline evaluation (protocol + round trip + realism)
    from ste_gan_tpu import evaluate as ev

    report = ev.evaluate_gan(run_dir, enc_ckpt, partition="valid",
                             tag="best", full=True, realism=True,
                             bucket_frames=16)
    ch = report["chunked"]
    for key in ("val/waveform", "val/multi_td", "val/speech_unit",
                "val/phoneme"):
        assert np.isfinite(ch[key]), key
    full = report["full_utterance"]
    assert full["num_utterances"] == 1  # the voiced dev reference
    assert full["total_frames"] > 0
    rl = report["realism"]
    assert np.isfinite(rl["fed"]) and rl["fed"] >= 0
    assert np.isfinite(rl["log_spectral_distance"]["mean_db"])

    # ---- Stage 6: batch synthesis from the trained run ---------------
    from ste_gan_tpu.infer import EMGSynthesizer
    from ste_gan_tpu.train.gan import eval_generator_params, load_trained_state

    cfg_loaded, models, state = load_trained_state(run_dir, "best")
    synth = EMGSynthesizer.from_config(
        cfg_loaded, eval_generator_params(state), bucket=16)
    feats = np.asarray(devset[0][C.DataType.SPEECH_UNITS])
    emg = synth.synthesize(feats, 0, 0)
    assert emg.shape == (C.HOPSIZE * len(feats), 8)
    assert np.all(np.abs(emg) <= 1.0)  # tanh-bounded output
