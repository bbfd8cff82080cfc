"""End-to-end smoke test of the GAN training runtime on a synthetic corpus:
run dir protocol (.done, config.yaml, vocab JSONs), checkpointing, resume."""
import json
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu.config import Config
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.train import train_gan
from ste_gan_tpu.train.checkpoint import CheckpointManager


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    generate_synthetic_corpus(root, num_train=8, num_valid=2, num_test=2,
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
    cfg.train.max_steps = 3
    cfg.train.interval_log = 1
    cfg.train.interval_valid = 2
    cfg.train.interval_sample = 10_000  # skip plotting in the smoke test
    cfg.train.interval_save = 2
    cfg.model.params = {"channels": 32}
    cfg.model.discriminator_params = {"num_multi_pool": 1, "num_multi_scale": 1}
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
    }
    return cfg


def test_training_loop_end_to_end(corpus, tmp_path):
    cfg = tiny_cfg(corpus)
    run_dir = tmp_path / "run"
    val = train_gan.train(cfg, run_dir, resume=False, debug=False)

    # Run-dir protocol.
    assert (run_dir / ".done").exists()
    assert (run_dir / "session_idx_to_id.json").exists()
    assert (run_dir / "speaking_mode_idx_to_id.json").exists()
    assert (run_dir / "metrics.jsonl").exists()
    # Checkpoints: periodic at step 2 + final; best saved at validation.
    ckpt = CheckpointManager(run_dir)
    assert ckpt.latest_periodic_tag() == "checkpoint-00000002"
    assert (run_dir / "checkpoint-final").is_dir()
    assert (run_dir / "best").is_dir()
    # Validation metrics sane.
    assert np.isfinite(val["val/speech_unit"])
    assert np.isfinite(val["val/multi_td"])


def test_resume_from_checkpoint(corpus, tmp_path):
    cfg = tiny_cfg(corpus)
    cfg.train.max_steps = 2
    run_dir = tmp_path / "run_resume"
    train_gan.train(cfg, run_dir, resume=False, debug=False)
    (run_dir / ".done").unlink()

    # Resume: state restores from checkpoint-00000002 and continues.
    cfg.train.max_steps = 4
    import ste_gan_tpu.train.gan as gan_mod
    import jax

    models = gan_mod.build_models(cfg)
    template = gan_mod.init_state(cfg, models, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(run_dir)
    restored, epoch = ckpt.restore_latest(template)
    # Saved at pre-increment step index 2 (reference cadence,
    # ste_gan/train.py:421-468) after 3 executed steps — state.step counts
    # executed steps.
    assert int(restored.step) == 3
    # The restored tree has the same structure and finite values.
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(restored.gen_params))


def test_explicit_checkpoint_path(corpus, tmp_path):
    """--checkpoint restores from the GIVEN path into a fresh run dir
    (VERDICT r1: the flag used to silently fall back to the run dir)."""
    from ste_gan_tpu.train.checkpoint import restore_from_path
    import ste_gan_tpu.train.gan as gan_mod
    import jax

    cfg = tiny_cfg(corpus)
    cfg.train.max_steps = 2
    src_dir = tmp_path / "src_run"
    train_gan.train(cfg, src_dir, resume=False, debug=False)

    models = gan_mod.build_models(cfg)
    template = gan_mod.init_state(cfg, models, jax.random.PRNGKey(0))
    # Explicit checkpoint dir and run dir both resolve.
    state, _ = restore_from_path(src_dir / "checkpoint-00000002", template)
    assert int(state.step) == 3
    state2, _ = restore_from_path(src_dir, template)
    assert int(state2.step) == 3
    with pytest.raises(FileNotFoundError):
        restore_from_path(src_dir / "nope", template)

    # A fresh run dir continues from the explicit checkpoint.
    dst_dir = tmp_path / "dst_run"
    cfg.train.max_steps = 4
    train_gan.train(cfg, dst_dir, resume=False, debug=False,
                    init_checkpoint=src_dir / "checkpoint-00000002")
    ckpt = CheckpointManager(dst_dir)
    assert ckpt.latest_periodic_tag() == "checkpoint-00000004"
    restored, _ = ckpt.restore(ckpt.latest_periodic_tag(), template)
    assert int(restored.step) == 5


def test_preemption_checkpoint_and_resume(corpus, tmp_path):
    """Failure detection e2e: SIGTERM mid-training saves a resumable
    checkpoint and exits without .done; a resume run restores from it and
    completes (SURVEY §5 — the reference can only resume from its last
    periodic save)."""
    import os
    import signal as sig
    import threading
    import time as time_mod

    cfg = tiny_cfg(corpus)
    cfg.train.max_steps = 200            # far away: only SIGTERM ends run 1
    cfg.train.interval_save = 10_000
    cfg.train.interval_valid = 10_000
    cfg.train.interval_log = 1
    run_dir = tmp_path / "run"

    def killer():
        metrics = run_dir / "metrics.jsonl"
        deadline = time_mod.time() + 600
        while time_mod.time() < deadline:
            if metrics.exists() and len(metrics.read_text().splitlines()) >= 10:
                os.kill(os.getpid(), sig.SIGTERM)
                return
            time_mod.sleep(0.5)

    thread = threading.Thread(target=killer)
    thread.start()
    train_gan.train(cfg, run_dir, resume=False, debug=False)
    thread.join()

    ckpt = CheckpointManager(run_dir)
    tag = ckpt.latest_periodic_tag()
    assert tag is not None, "no preemption checkpoint written"
    assert not (run_dir / ".done").exists()
    saved_step = int(tag.rsplit("-", 1)[1])

    cfg2 = tiny_cfg(corpus)
    cfg2.train.interval_valid = 10_000
    cfg2.train.max_steps = saved_step + 2
    train_gan.train(cfg2, run_dir, resume=True, debug=False)
    assert (run_dir / ".done").exists()
    assert (run_dir / "checkpoint-final").is_dir()


def test_host_rss_watchdog_saves_and_raises(corpus, tmp_path):
    """The host-RSS watchdog (TrainConfig.host_rss_restart_gb): when
    process RSS exceeds the threshold after at least one validation
    interval of progress, train() writes a blocking resumable checkpoint
    and raises HostMemoryRestart (the CLI turns it into an exec-restart
    with --continue_run); a resume run then completes normally. Guards the
    25k-step production runs against the remote-tunnel client's per-
    transfer host memory leak."""
    cfg = tiny_cfg(corpus)
    cfg.train.max_steps = 200          # far away: only the watchdog ends run 1
    cfg.train.interval_save = 10_000
    cfg.train.interval_valid = 2       # progress guard: >=2 steps
    cfg.train.host_rss_restart_gb = 0.001  # any real process exceeds this
    run_dir = tmp_path / "run"

    with pytest.raises(train_gan.HostMemoryRestart) as exc_info:
        train_gan.train(cfg, run_dir, resume=False, debug=False)
    assert exc_info.value.step >= 2
    assert exc_info.value.rss_gb > 0.001

    ckpt = CheckpointManager(run_dir)
    tag = ckpt.latest_periodic_tag()
    assert tag is not None, "watchdog did not write a resumable checkpoint"
    assert not (run_dir / ".done").exists()
    saved_step = int(tag.rsplit("-", 1)[1])
    assert saved_step == exc_info.value.step

    # Historical best survives the restart: best.meta.json records the SU
    # error, so the resumed run's best-so-far is not +inf.
    assert np.isfinite(ckpt.best_su_error())

    cfg2 = tiny_cfg(corpus)
    cfg2.train.interval_valid = 10_000
    cfg2.train.max_steps = saved_step + 2
    train_gan.train(cfg2, run_dir, resume=True, debug=False)
    assert (run_dir / ".done").exists()


def test_steps_per_dispatch_matches_single_step(corpus, tmp_path):
    """K-step dispatch (train.steps_per_dispatch: lax.scan over K stacked
    batches, one device dispatch per K steps) produces the same training
    trajectory as single-step mode: same data order, same step math, same
    run-dir protocol. Epochs on this corpus are 2 steps (8 utts / batch 4),
    so K=2 exercises full groups AND the epoch-boundary flush; max_steps=5
    exercises the no-group-past-max_steps tail singles."""
    import jax

    base = tiny_cfg(corpus)
    base.train.max_steps = 5
    base.train.interval_valid = 4
    base.train.interval_save = 4

    runs = {}
    for k in (1, 2):
        cfg = tiny_cfg(corpus)
        cfg.train.max_steps = 5
        cfg.train.interval_valid = 4
        cfg.train.interval_save = 4
        cfg.train.steps_per_dispatch = k
        run_dir = tmp_path / f"run_k{k}"
        val = train_gan.train(cfg, run_dir, resume=False, debug=False)
        assert (run_dir / ".done").exists()
        ckpt = CheckpointManager(run_dir)
        assert ckpt.latest_periodic_tag() is not None
        runs[k] = val

    for key in runs[1]:
        np.testing.assert_allclose(
            runs[2][key], runs[1][key], rtol=2e-3, atol=1e-4,
            err_msg=f"{key} diverged between K=2 and K=1 dispatch")


def test_td_only_configuration_trains_through_the_loop(corpus, tmp_path):
    """The TD-only loss configuration (encoder losses AND adversarial
    pathway disabled — the ablation's td_only arm) must run through the
    FULL trainer loop: with all phoneme counters zero, the interval-log
    path previously read an unbound ph_acc (crashed the round-5 ablation
    campaign at td_only's first logged step)."""
    cfg = tiny_cfg(corpus)
    cfg.train.loss_adversarial = ""
    cfg.train.loss_feat_match_error = False
    cfg.train.loss_feat_match_weight = 0.0
    cfg.train.loss_speech_unit_error = False
    cfg.train.loss_speech_unit_weight = 0.0
    cfg.train.loss_phoneme_error = False
    cfg.train.loss_phoneme_weight = 0.0
    run_dir = tmp_path / "run_td_only"
    val = train_gan.train(cfg, run_dir, resume=False, debug=False)
    assert (run_dir / ".done").exists()
    assert np.isfinite(val["val/multi_td"])
    # No phoneme-accuracy train scalars were logged (0/0 is skipped).
    tags = {json.loads(line)["tag"]
            for line in (run_dir / "metrics.jsonl").read_text().splitlines()}
    assert "train_loss/phoneme_accuracy_avg" not in tags
    assert "train_loss/multi_td" in tags
