"""End-to-end: the CLI trainer with ``train.fsdp = True`` (persistent state
stored sharded over ``data``, gather-at-step-entry via shard_map) produces
the same training run as replicated data parallelism, and its checkpoints
resume — on the virtual 8-device CPU mesh."""
import json

import numpy as np

from ste_gan_tpu.train import train_gan
from ste_gan_tpu.train.checkpoint import CheckpointManager

from tests.test_train_loop import corpus, tiny_cfg  # noqa: F401 (fixture)


def _run(corpus_root, tmp_path, name, fsdp, resident=False):
    cfg = tiny_cfg(corpus_root)
    cfg.train.fsdp = fsdp
    cfg.train.device_resident_data = resident
    cfg.train.transfer_dtype = "float32"
    if fsdp and not resident:
        # Exercise the sample-plot inference path (EMGSynthesizer driven
        # from FSDP-sharded gen_params) too.
        cfg.train.interval_sample = 2
        cfg.train.num_test_samples = 0
    run_dir = tmp_path / name
    val = train_gan.train(cfg, run_dir, resume=False, debug=False)
    assert (run_dir / ".done").exists()
    records = (json.loads(line) for line in
               (run_dir / "metrics.jsonl").read_text().splitlines())
    train_loss = [r for r in records if r["tag"] == "train_loss/generator"]
    return val, train_loss, run_dir


def test_fsdp_trainer_matches_replicated(corpus, tmp_path):  # noqa: F811
    val_dp, loss_dp, _ = _run(corpus, tmp_path, "dp", fsdp=False)
    val_fs, loss_fs, run_fs = _run(corpus, tmp_path, "fsdp", fsdp=True)
    val_fr, loss_fr, _ = _run(corpus, tmp_path, "fsdp_res", fsdp=True,
                              resident=True)

    assert set(val_dp) == set(val_fs) == set(val_fr)
    for key in val_dp:
        np.testing.assert_allclose(val_dp[key], val_fs[key],
                                   rtol=2e-3, atol=1e-4, err_msg=key)
        np.testing.assert_allclose(val_dp[key], val_fr[key],
                                   rtol=2e-3, atol=1e-4, err_msg=key)

    # Same per-step generator-loss trajectory: the gather/slice movement
    # must not change the math.
    assert len(loss_dp) == len(loss_fs) == len(loss_fr) > 0
    for a, b, c in zip(loss_dp, loss_fs, loss_fr):
        assert a["step"] == b["step"] == c["step"]
        np.testing.assert_allclose(a["value"], b["value"],
                                   rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(a["value"], c["value"],
                                   rtol=2e-3, atol=1e-4)

    # FSDP checkpoints restore into a host template (topology-elastic,
    # like the TP checkpoints; tests/test_tp_checkpoint.py).
    import jax
    import ste_gan_tpu.train.gan as gan_mod
    cfg = tiny_cfg(corpus)
    models = gan_mod.build_models(cfg)
    template = gan_mod.init_state(cfg, models, jax.random.PRNGKey(0))
    restored, _ = CheckpointManager(run_fs).restore_latest(template)
    assert int(restored.step) > 0


def test_fsdp_resume(corpus, tmp_path):  # noqa: F811
    cfg = tiny_cfg(corpus)
    cfg.train.fsdp = True
    cfg.train.max_steps = 2
    run_dir = tmp_path / "fsdp_resume"
    train_gan.train(cfg, run_dir, resume=False, debug=False)
    (run_dir / ".done").unlink()
    cfg.train.max_steps = 4
    train_gan.train(cfg, run_dir, resume=True, debug=False)
    assert (run_dir / ".done").exists()
    records = [json.loads(line) for line in
               (run_dir / "metrics.jsonl").read_text().splitlines()]
    steps = {r["step"] for r in records if r["tag"] == "train_loss/generator"}
    assert 3 in steps  # continued past the restored step
