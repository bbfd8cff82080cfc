"""End-to-end: the CLI trainer with ``train.model_parallel = 2`` (a 2-D
(data, model) mesh, train state sharded into output-channel slabs) produces
the same training run as the 1-D data-parallel trainer — through BOTH input
pipelines (host collate and device-resident corpus). Composition proof for
parallel/tensor_parallel.py at the product surface, on the virtual
8-device CPU mesh."""
import json

import numpy as np
import pytest

from ste_gan_tpu.train import train_gan

from tests.test_train_loop import corpus, tiny_cfg  # noqa: F401 (fixture)


def _run(corpus_root, tmp_path, name, model_parallel, resident):
    cfg = tiny_cfg(corpus_root)
    cfg.train.model_parallel = model_parallel
    cfg.train.device_resident_data = resident
    # f32 wire/storage so host and resident pipelines are bit-comparable.
    cfg.train.transfer_dtype = "float32"
    if model_parallel > 1 and not resident:
        # Exercise the sample-plot inference path (EMGSynthesizer driven
        # with model-sharded gen_params) under tensor parallelism too.
        cfg.train.interval_sample = 2
        cfg.train.num_test_samples = 0
    run_dir = tmp_path / name
    val = train_gan.train(cfg, run_dir, resume=False, debug=False)
    assert (run_dir / ".done").exists()
    records = (json.loads(line) for line in
               (run_dir / "metrics.jsonl").read_text().splitlines())
    train_loss = [r for r in records if r["tag"] == "train_loss/generator"]
    return val, train_loss


def test_model_parallel_trainer_matches_1d(corpus, tmp_path):  # noqa: F811
    val_1d, loss_1d = _run(corpus, tmp_path, "mp1", 1, resident=False)
    val_tp, loss_tp = _run(corpus, tmp_path, "mp2", 2, resident=False)
    val_tr, loss_tr = _run(corpus, tmp_path, "mp2r", 2, resident=True)

    assert set(val_1d) == set(val_tp) == set(val_tr)
    for key in val_1d:
        np.testing.assert_allclose(val_1d[key], val_tp[key],
                                   rtol=2e-3, atol=1e-4, err_msg=key)
        np.testing.assert_allclose(val_1d[key], val_tr[key],
                                   rtol=2e-3, atol=1e-4, err_msg=key)

    # Same per-step generator-loss trajectory (same data order, same math —
    # GSPMD partitions the identical program).
    assert len(loss_1d) == len(loss_tp) == len(loss_tr) > 0
    for a, b, c in zip(loss_1d, loss_tp, loss_tr):
        assert a["step"] == b["step"] == c["step"]
        np.testing.assert_allclose(a["value"], b["value"],
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(a["value"], c["value"],
                                   rtol=2e-3, atol=1e-4)
