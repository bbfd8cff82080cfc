"""EMG-encoder pre-training (EMG -> Soft speech units + phonemes).

The TPU-native equivalent of ``python ste_gan/emg_encoder/train.py``
(reference ste_gan/emg_encoder/train.py:37-360), preserving semantics:

* size-aware packed batches (<=128k EMG samples), window folding to
  1600-sample windows;
* voiced loss = 0.5 * mean pairwise speech-unit distance + 0.5 * phoneme CE,
  averaged per sample then over the batch
  (speech_unit_loss_combined, :91-118,146);
* silent loss = DTW-aligned cost (:120-134) — kept off the hot path exactly
  like the reference (voiced-only training is the default);
* AdamW(wd=1e-5) with 500-step linear warmup to 3e-4 and
  ReduceLROnPlateau(0.5, patience 5) on validation loss; early stop after 10
  epochs without improvement; best + last checkpoints; 160 epochs max.

TPU-native redesign: the reference's per-sample Python loss loop (:91-144)
becomes masked segment reductions over a fixed-shape folded batch, so the
whole update is a single jit-compiled program with static shapes; BatchNorm
statistics and dropout/shift RNG thread explicitly.
"""
from __future__ import annotations

import argparse
import logging
import sys
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ste_gan_tpu import constants as C
from ste_gan_tpu import emg_encoder_constants as EC
from ste_gan_tpu.config import Config, load_config
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.losses.encoder_loss import PAIRWISE_EPS
from ste_gan_tpu.models.emg_encoder import init_emg_encoder
from ste_gan_tpu.ops.dtw import dtw_alignment
from jax.sharding import NamedSharding, PartitionSpec as P

from ste_gan_tpu.parallel.mesh import (
    DATA_AXIS, constrain_batch, create_mesh, largest_divisor_mesh_size,
    place_batch_leaves, replicate, replicate_sharding, shard_batch)
from ste_gan_tpu.parallel.tensor_parallel import (
    create_mesh_2d, shard_batch_2d, shard_state)
from ste_gan_tpu.train.checkpoint import save_pytree
from ste_gan_tpu.train.encoder_data import (
    EncoderDeviceCorpus, SizeAwareSampler, fold_encoder_batch,
    windows_needed)
from ste_gan_tpu.utils.logging_utils import MetricLogger, setup_run_logging


class EncoderTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def voiced_batch_loss(su_pred_flat, ph_pred_flat, batch: Dict[str, jnp.ndarray],
                      max_samples: int):
    """Vectorised equivalent of the reference's per-sample voiced loss loop
    (ste_gan/emg_encoder/train.py:99-118,146): per-frame speech-unit
    distances and CE -> per-sample means via segment sums -> 0.5/0.5 mix ->
    sum over voiced samples / total samples."""
    sample_id = batch["frame_sample_id"]
    valid = sample_id >= 0
    seg = jnp.where(valid, sample_id, 0)

    su_t = batch["su_targets"].astype(jnp.float32)
    diff = su_t - su_pred_flat.astype(jnp.float32) + PAIRWISE_EPS
    dists = jnp.sqrt(jnp.sum(jnp.square(diff), axis=-1))

    logp = jax.nn.log_softmax(ph_pred_flat.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, batch["ph_targets"][:, None], axis=-1)[:, 0]

    weights = valid.astype(jnp.float32)
    counts = jax.ops.segment_sum(weights, seg, num_segments=max_samples)
    su_mean = jax.ops.segment_sum(dists * weights, seg, max_samples) / jnp.maximum(counts, 1)
    ce_mean = jax.ops.segment_sum(ce * weights, seg, max_samples) / jnp.maximum(counts, 1)

    num_samples = batch["num_samples"].astype(jnp.float32)
    sample_ids = jnp.arange(max_samples)
    is_real = sample_ids < batch["num_samples"]
    is_voiced = is_real & ~batch["silent"]
    per_sample = (EC.LOSS_WEIGHT_SPEECH_UNITS * su_mean
                  + EC.LOSS_WEIGHT_PHONEMES * ce_mean)
    loss = jnp.sum(jnp.where(is_voiced, per_sample, 0.0)) / jnp.maximum(num_samples, 1)

    # Phoneme accuracy counters over voiced frames.
    frame_voiced = valid & ~batch["silent"][seg]
    pred = jnp.argmax(ph_pred_flat, axis=-1)
    correct = (pred == batch["ph_targets"]) & frame_voiced
    counters = {
        "num_correct": jnp.sum(correct).astype(jnp.int32),
        "num_frames": jnp.sum(frame_voiced).astype(jnp.int32),
    }
    # Phoneme confusion counts [pred, target] (reference test();
    # ste_gan/emg_encoder/train.py:48,117-118).
    confusion = jnp.zeros((C.NUM_PHONEMES, C.NUM_PHONEMES), jnp.int32)
    confusion = confusion.at[pred, batch["ph_targets"]].add(
        frame_voiced.astype(jnp.int32))
    return loss, counters, confusion


def silent_sample_loss(su_pred, ph_pred, su_target, ph_target,
                       w_su: float = EC.LOSS_WEIGHT_SPEECH_UNITS,
                       w_ph: float = EC.LOSS_WEIGHT_PHONEMES):
    """DTW-aligned loss for one silent utterance
    (reference: ste_gan/emg_encoder/train.py:120-134). Differentiable in the
    costs; the alignment indices are gradient-stopped (the reference computes
    them on detached numpy)."""
    su_pred = su_pred.astype(jnp.float32)
    su_target = su_target.astype(jnp.float32)
    dists = jnp.sqrt(jnp.sum(jnp.square(
        su_pred[:, None, :] - su_target[None, :, :]), axis=-1) + 1e-12)
    logp = jax.nn.log_softmax(ph_pred.astype(jnp.float32), axis=-1)
    phone_lp = logp[:, ph_target]  # [T_pred, T_target]
    costs = w_su * dists + w_ph * (-phone_lp)
    alignment = jax.lax.stop_gradient(dtw_alignment(costs.T))
    t_target = su_target.shape[0]
    picked = costs[alignment, jnp.arange(t_target)]
    return jnp.sum(picked) / t_target, alignment


def silent_batch_loss(su_pred_flat, ph_pred_flat, batch,
                      silent_pred_frames: int):
    """Vectorised DTW-aligned loss over a folded batch's silent slots
    (reference silent branch of speech_unit_loss_combined;
    ste_gan/emg_encoder/train.py:120-144), fully inside jit.

    Each slot slices its prediction frames from the flattened 50 Hz frame
    axis (fixed-size dynamic slice), builds the padded cost matrix
    ``0.5*cdist + 0.5*(-log p_phoneme)``, and runs the anti-diagonal
    wavefront DTW with the backtrace started at the slot's valid corner —
    exact unpadded semantics on padded static shapes. Alignment indices are
    gradient-stopped (the reference aligns detached numpy); gradients flow
    through the picked costs.

    Returns (sum_of_silent_sample_losses, aligned-phoneme counters).
    """
    w_su, w_ph = EC.LOSS_WEIGHT_SPEECH_UNITS, EC.LOSS_WEIGHT_PHONEMES
    t_pred = silent_pred_frames
    # Pad the flat frame axis so the fixed-size slices never clamp.
    su_flat = jnp.pad(su_pred_flat.astype(jnp.float32), ((0, t_pred), (0, 0)))
    ph_flat = jnp.pad(ph_pred_flat.astype(jnp.float32), ((0, t_pred), (0, 0)))

    def one(start, lp, su_t, ph_t, lt):
        su_p = jax.lax.dynamic_slice_in_dim(su_flat, start, t_pred)
        ph_p = jax.lax.dynamic_slice_in_dim(ph_flat, start, t_pred)
        dists = jnp.sqrt(jnp.sum(jnp.square(
            su_p[:, None, :] - su_t[None, :, :].astype(jnp.float32)), -1)
            + 1e-12)
        logp = jax.nn.log_softmax(ph_p, axis=-1)
        costs = w_su * dists + w_ph * (-logp[:, ph_t])  # [t_pred, t_target]
        alignment = jax.lax.stop_gradient(
            dtw_alignment(costs.T, end=(lt - 1, lp - 1)))  # [t_target]
        t_idx = jnp.arange(su_t.shape[0])
        mask = t_idx < lt
        picked = costs[alignment, t_idx]
        loss = jnp.sum(jnp.where(mask, picked, 0.0)) / jnp.maximum(lt, 1)
        pred_phone = jnp.argmax(logp, axis=-1)[alignment]
        correct = jnp.sum(((pred_phone == ph_t) & mask).astype(jnp.int32))
        return loss, correct, jnp.sum(mask.astype(jnp.int32))

    losses, correct, totals = jax.vmap(one)(
        batch["silent_pred_start"], batch["silent_pred_len"],
        batch["silent_su_targets"], batch["silent_ph_targets"],
        batch["silent_target_len"])
    active = batch["silent_target_len"] > 0
    loss_sum = jnp.sum(jnp.where(active, losses, 0.0))
    counters = {
        "num_correct_silent": jnp.sum(jnp.where(active, correct, 0)),
        "num_frames_silent": jnp.sum(jnp.where(active, totals, 0)),
    }
    return loss_sum, counters


def silent_losses_host(su_pred_flat: np.ndarray, ph_pred_flat: np.ndarray,
                       items, confusion: Optional[np.ndarray] = None):
    """Host-side DTW losses + aligned phoneme counts for the silent samples
    of a folded batch (the eval analogue of the reference's silent branch in
    speech_unit_loss_combined; ste_gan/emg_encoder/train.py:120-144).

    Predictions are sliced per utterance from the flattened 50 Hz frame axis
    (same ordering as the fold); alignment uses the native C++ DTW kernel
    when built.

    Returns (sum_of_silent_losses, num_correct, num_total).
    """
    from ste_gan_tpu.ops.dtw import align_from_distances

    w_su = EC.LOSS_WEIGHT_SPEECH_UNITS
    w_ph = EC.LOSS_WEIGHT_PHONEMES
    total_loss, correct, total = 0.0, 0, 0
    offset = 0
    for item in items:
        # Prediction frames derive from the EMG length (16:1); silent
        # samples' targets (from the parallel voiced recording) are shorter
        # or longer — DTW aligns them.
        frames = len(item[C.DataType.REAL_EMG]) // EC.EMG_SIGNAL_TO_SPEECH_UNITS
        su_pred = su_pred_flat[offset:offset + frames]
        ph_pred = ph_pred_flat[offset:offset + frames]
        offset += frames
        if item[C.DataType.SPEAKING_MODE_ID] == C.SpeakingMode.NORMAL:
            continue
        su_target = np.asarray(item[C.DataType.SPEECH_UNITS], np.float32)
        ph_target = np.asarray(item[C.DataType.PHONEMES], np.int64)
        dists = np.sqrt(np.sum(np.square(
            su_pred[:, None, :] - su_target[None, :, :]), axis=-1) + 1e-12)
        logits = ph_pred - ph_pred.max(axis=-1, keepdims=True)
        logp = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
        costs = w_su * dists + w_ph * (-logp[:, ph_target])
        alignment = np.asarray(align_from_distances(
            np.ascontiguousarray(costs.T, np.float32)))
        total_loss += float(costs[alignment, np.arange(len(ph_target))].sum()
                            / len(su_target))
        pred_phone = logp.argmax(-1)[alignment]
        correct += int((pred_phone == ph_target).sum())
        total += len(ph_target)
        if confusion is not None:
            np.add.at(confusion, (pred_phone, ph_target), 1)
    return total_loss, correct, total


# ---------------------------------------------------------------------------
# Train/eval steps
# ---------------------------------------------------------------------------


def make_optimizer() -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=EC.LEARNING_RATE, weight_decay=EC.WEIGHT_DECAY)


def make_encoder_train_step(model, max_samples: int,
                            silent_pred_frames: int = 0,
                            moe_aux_weight: float = 0.01,
                            pipeline: Optional[Tuple[Any, int]] = None
                            ) -> Callable:
    """``silent_pred_frames > 0`` enables the mixed-batch silent path: the
    batch must carry the silent DTW-target fields from
    :func:`fold_encoder_batch`. The combined loss preserves the reference's
    per-sample normalisation (sum of per-sample losses / batch size;
    ste_gan/emg_encoder/train.py:146).

    When the encoder uses mixture-of-experts FFNs (``moe_experts > 0``),
    each MoE block sows a Switch-style load-balancing loss into the
    ``"losses"`` collection; their sum is added with ``moe_aux_weight``.
    Dense encoders sow nothing, so the default path is unchanged.

    ``pipeline = (mesh, num_microbatches)`` executes the transformer stack
    as a GPipe pipeline over the mesh's 'stage' axis
    (EMGEncoderTransformer.pipelined; parallel/pipeline_parallel.py) — the
    forward/backward math is the sequential stack's, scheduled across
    stage devices."""
    optimizer = make_optimizer()

    def train_step(state: EncoderTrainState, batch, rng):
        # ``rng`` may be a PRNGKey (typed key or legacy uint32[2]) or a
        # host integer seed. The seed form keeps all key derivation
        # in-graph — a host-side jax.random.split per step is a
        # standalone device dispatch (expensive through a remote-TPU
        # tunnel). Legacy uint32[2] keys are integer-dtyped but ndim>0,
        # so dispatch on (scalar AND integer), not dtype alone.
        rng = jnp.asarray(rng)
        if (not jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                and rng.ndim == 0 and jnp.issubdtype(rng.dtype, jnp.integer)):
            rng = jax.random.fold_in(jax.random.PRNGKey(C.RANDOM_SEED), rng)
        rng_shift, rng_drop = jax.random.split(rng)

        def loss_fn(params):
            if pipeline is not None:
                p_mesh, p_microbatches = pipeline
                (su_pred, ph_pred), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["emg_windows"], p_mesh, p_microbatches,
                    train=True,
                    rngs={"shift": rng_shift, "dropout": rng_drop},
                    mutable=["batch_stats", "losses"],
                    method="pipelined")
            else:
                (su_pred, ph_pred), mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["emg_windows"], train=True,
                    rngs={"shift": rng_shift, "dropout": rng_drop},
                    mutable=["batch_stats", "losses"])
            n, f, d = su_pred.shape
            su_flat = su_pred.reshape(n * f, d)
            ph_flat = ph_pred.reshape(n * f, -1)
            loss, counters, _ = voiced_batch_loss(
                su_flat, ph_flat, batch, max_samples)
            if silent_pred_frames > 0:
                silent_sum, _ = silent_batch_loss(
                    su_flat, ph_flat, batch, silent_pred_frames)
                loss = loss + silent_sum / jnp.maximum(
                    batch["num_samples"].astype(jnp.float32), 1)
            # MoE load-balancing losses (empty dict for dense encoders).
            aux_leaves = jax.tree.leaves(mutated.get("losses", {}))
            if aux_leaves:
                loss = loss + moe_aux_weight * sum(aux_leaves)
            return loss, (counters, mutated["batch_stats"])

        (loss, (counters, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = EncoderTrainState(
            step=state.step + 1, params=params, batch_stats=batch_stats,
            opt_state=opt_state)
        metrics = {"loss": loss, **counters}
        return new_state, metrics

    return train_step


def make_encoder_eval_step(model, max_samples: int) -> Callable:
    def eval_step(params, batch_stats, batch):
        su_pred, ph_pred = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["emg_windows"], train=False)
        n, f, d = su_pred.shape
        loss, counters, confusion = voiced_batch_loss(
            su_pred.reshape(n * f, d), ph_pred.reshape(n * f, -1),
            batch, max_samples)
        return {"loss": loss, **counters, "confusion": confusion}

    return eval_step


# ---------------------------------------------------------------------------
# LR schedule (warmup + plateau)
# ---------------------------------------------------------------------------


class ReduceLROnPlateau:
    """torch-semantics plateau scheduler (mode=min, rel threshold 1e-4)."""

    def __init__(self, factor: float = 0.5, patience: int = EC.LEARNING_RATE_PATIENCE,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.multiplier = 1.0
        self.best = float("inf")
        self.num_bad = 0

    def step(self, value: float) -> None:
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.multiplier *= self.factor
                self.num_bad = 0


def warmup_lr(batch_idx: int, target: float = EC.LEARNING_RATE,
              warmup: int = EC.LEARNING_RATE_WARMUP) -> float:
    """Linear warmup over the first ``warmup`` batches
    (reference schedule_lr; ste_gan/emg_encoder/train.py:177-180)."""
    iteration = batch_idx + 1
    if iteration <= warmup:
        return iteration * target / warmup
    return target


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------


def evaluate(model, eval_step, state: EncoderTrainState, dataset: EMGDataset,
             n_win: int, max_samples: int,
             batch_size: int = EC.BATCH_SIZE,
             place_batch: Callable = jax.device_put,
             ) -> Tuple[float, float, np.ndarray]:
    """Mean loss + phoneme accuracy + confusion over the dev set (reference
    test(); ste_gan/emg_encoder/train.py:37-63). Voiced samples use the
    vectorised jit path; silent samples (if present in the dataset) use the
    host-side DTW-aligned path, combined exactly like the reference
    (sum over samples / total samples)."""
    losses, correct, total = [], 0, 0
    confusion = np.zeros((C.NUM_PHONEMES, C.NUM_PHONEMES), np.int64)
    has_silent = any(mode != C.SpeakingMode.NORMAL
                     for mode in dataset.speaking_mode_ids)
    for start in range(0, len(dataset), batch_size):
        items = [dataset[i] for i in range(start, min(start + batch_size,
                                                      len(dataset)))]
        batch = place_batch(fold_encoder_batch(
            items, n_win=n_win, max_samples=max_samples).as_dict())
        out = eval_step(state.params, state.batch_stats, batch)
        batch_loss = float(out["loss"])
        correct += int(out["num_correct"])
        total += int(out["num_frames"])
        confusion += np.asarray(out["confusion"], np.int64)
        if has_silent:
            su_pred, ph_pred = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["emg_windows"], train=False)
            n, f, d = su_pred.shape
            silent_loss, silent_correct, silent_total = silent_losses_host(
                np.asarray(su_pred.reshape(n * f, d)),
                np.asarray(ph_pred.reshape(n * f, -1)),
                items, confusion=confusion)
            batch_loss += silent_loss / len(items)
            correct += silent_correct
            total += silent_total
        losses.append(batch_loss)
    acc = correct / max(total, 1)
    return float(np.mean(losses)), acc, confusion


def train_encoder_model(cfg: Config, trainset: EMGDataset, devset: EMGDataset,
                        output_directory: Path, debug: bool = False,
                        max_len: int = EC.TRAIN_BATCH_MAX_LEN,
                        num_epochs: int = EC.NUM_EPOCHS,
                        warmup_steps: int = EC.LEARNING_RATE_WARMUP,
                        save_interval_epochs: int = 1,
                        device_resident_data: bool = True,
                        transfer_dtype: str = "float16",
                        data_parallel: int = 1,
                        model_parallel: int = 1,
                        pipeline_stages: int = 1,
                        pipeline_microbatches: int = 0,
                        ) -> EncoderTrainState:
    """``device_resident_data`` keeps the train split in device memory and
    folds batches on-device from {rows, num_samples} descriptors
    (EncoderDeviceCorpus) — the encoder-trainer counterpart of the GAN
    trainer's TrainConfig.device_resident_data. ``transfer_dtype``
    ("float16" | "float32") sets the float precision of training inputs on
    either path (f16 = the validated wire/storage default).

    ``data_parallel``/``model_parallel`` place the step over a device mesh
    exactly like the GAN trainer: the folded batch's window/frame axes
    shard over 'data', and model_parallel > 1 shards parameters + AdamW
    moments into output-channel slabs over a 2-D (data, model) mesh
    (parallel/tensor_parallel.py). data_parallel <= 0 means "all devices
    (/ model_parallel)". The library default stays 1 (single-device) so
    reference-parity harnesses keep bit-stable reduction order; the CLI
    defaults to all devices.

    ``pipeline_stages > 1`` instead builds a 2-D (data, stage) mesh and
    executes the transformer stack as a GPipe pipeline over 'stage'
    (EMGEncoderTransformer.pipelined): per-layer params stack and shard by
    stage, microbatches ride a ppermute ring; the conv frontend/heads/loss
    run data-parallel over 'data'. Requires num_transformer_layers %
    pipeline_stages == 0 and is mutually exclusive with model_parallel.
    ``pipeline_microbatches`` (0 = the fold's window count) must divide
    the window count; utilisation is M/(M+S-1), so more microbatches =
    smaller bubble."""
    output_directory = Path(output_directory)
    writer = MetricLogger(output_directory)
    model = init_emg_encoder(cfg)

    if len(trainset) == 0 or len(devset) == 0:
        # Fail fast: an empty partition would spin through epochs with no
        # batches (same guard as the GAN trainer's loaders()).
        raise ValueError(
            f"empty dataset: train={len(trainset)} dev={len(devset)} "
            "utterances. If this is the synthetic development corpus, "
            "(re)generate it with: python -m ste_gan_tpu.data.synthetic "
            "--root data/synthetic")

    seq_len = EC.SEQ_LEN
    window = seq_len * 8
    n_win = max(1, -(-max_len // window))
    # Eval batches can need more windows than the training budget.
    eval_lengths = sorted(devset.emg_lengths, reverse=True)[:EC.BATCH_SIZE]
    n_win_eval = max(n_win, windows_needed(eval_lengths, seq_len))
    max_samples = max(64, 2 * n_win, EC.BATCH_SIZE)

    # Mixed-batch (silent) training: static DTW dims from the train set's
    # silent utterances (reference trains silent samples through DTW
    # alignment; ste_gan/emg_encoder/train.py:120-146).
    silent_idx = [i for i, m in enumerate(trainset.speaking_mode_ids)
                  if m != C.SpeakingMode.NORMAL]
    silent_pred_frames = silent_target_frames = max_silent = 0
    if silent_idx:
        pred_lens = [trainset.emg_lengths[i] // EC.EMG_SIGNAL_TO_SPEECH_UNITS
                     for i in silent_idx]
        target_lens = [len(trainset[i][C.DataType.SPEECH_UNITS])
                       for i in silent_idx]
        silent_pred_frames = max(pred_lens)
        silent_target_frames = max(target_lens)
        min_silent_emg = min(trainset.emg_lengths[i] for i in silent_idx)
        max_silent = min(len(silent_idx),
                         max_len // max(min_silent_emg, 1) + 1)
        logging.info(
            "Mixed training: %d silent utterances (<=%d per batch, "
            "pred<=%d frames, target<=%d frames)", len(silent_idx),
            max_silent, silent_pred_frames, silent_target_frames)

    rng = jax.random.PRNGKey(C.RANDOM_SEED)
    rng, init_rng = jax.random.split(rng)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, window, trainset.num_emg_channels)),
        train=False))(init_rng)
    optimizer = make_optimizer()
    state = EncoderTrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]))

    # Device mesh (GSPMD partitions the unchanged step, so semantics are
    # identical to single-device — BatchNorm statistics stay global-batch
    # exact). The fold's window axis is the data-sharding unit.
    mp = max(1, int(model_parallel))
    stages = max(1, int(pipeline_stages))
    if stages > 1 and mp > 1:
        raise ValueError("pipeline_stages and model_parallel are mutually "
                         "exclusive parallelism axes for the encoder "
                         "trainer (compose either with data_parallel)")
    requested = (data_parallel if data_parallel > 0
                 else len(jax.devices()) // (mp * stages))
    data_size = largest_divisor_mesh_size(n_win, max(1, requested))
    pipeline = None
    if stages > 1:
        # (data, stage) mesh: the GPipe ring runs over 'stage'; the folded
        # batch (and the frontend/loss) shard over 'data'. Microbatches
        # split the fold's window axis — default to one window per
        # microbatch (maximum M = smallest bubble: M/(M+S-1) utilisation).
        from ste_gan_tpu.parallel.pipeline_parallel import (
            create_stage_mesh_2d)
        mesh = create_stage_mesh_2d(data_size, stages)
        # Default: the most microbatches the data axis allows (microbatch
        # rows shard over 'data', so each must hold >= data_size windows).
        microbatches = (pipeline_microbatches if pipeline_microbatches > 0
                        else max(1, n_win // data_size))
        if n_win % microbatches or (n_win // microbatches) % data_size:
            raise ValueError(
                f"pipeline_microbatches {microbatches} must divide the "
                f"fold's window count {n_win} into microbatches divisible "
                f"by the data axis ({data_size})")
        pipeline = (mesh, microbatches)
        place_tree = lambda t: replicate(mesh, t)
        place_batch = lambda b: place_batch_leaves(
            b, NamedSharding(mesh, P(DATA_AXIS)), replicate_sharding(mesh),
            data_size)
    elif mp > 1:
        mesh = create_mesh_2d(data_size, mp)
        place_tree = lambda t: shard_state(mesh, t)
        place_batch = lambda b: shard_batch_2d(mesh, b)
    elif data_size > 1:
        mesh = create_mesh(data_size)
        place_tree = lambda t: replicate(mesh, t)
        place_batch = lambda b: shard_batch(mesh, b)
    else:
        mesh = None
        place_tree = lambda t: t
        place_batch = jax.device_put
    if mesh is not None:
        logging.info("Mesh: %s %s over %d device(s)", mesh.axis_names,
                     dict(mesh.shape), mesh.size)
        state = place_tree(state)

    np_float = np.float16 if transfer_dtype == "float16" else np.float32
    base_step = make_encoder_train_step(model, max_samples,
                                        silent_pred_frames=silent_pred_frames,
                                        pipeline=pipeline)
    device_corpus = None
    if device_resident_data:
        device_corpus = EncoderDeviceCorpus(
            trainset, float_dtype=(jnp.float16 if np_float == np.float16
                                   else jnp.float32))
        if mesh is not None:
            # Replicate the corpus across the mesh (it is the gather source
            # for every shard); the folded BATCH is what shards, via the
            # constrain_batch annotation below.
            device_corpus = replicate(mesh, device_corpus)
        logging.info(
            "Device-resident corpus: %d utterances, %.1f MB in device "
            "memory — per-batch H2D reduced to {rows, num_samples}",
            len(trainset), device_corpus.nbytes / 2**20)

        # The corpus rides as a jit ARGUMENT (registered pytree) — closing
        # over it would bake it into the HLO as a constant (fatal at
        # real-corpus scale; see DeviceCorpus docstring).
        def step_with_fold(state, idx, rng, corpus):
            batch = corpus.fold(
                idx["rows"], idx["num_samples"], n_win=n_win,
                max_samples=max_samples, max_silent=max_silent,
                silent_target_frames=silent_target_frames)
            if mesh is not None:
                # The fold is gather-dominated; without an explicit
                # constraint GSPMD inherits the gather's propagated
                # sharding for the whole downstream loss. Pin the folded
                # batch to the same data-axis layout shard_batch gives
                # host-built batches so both paths run one partitioning.
                batch = constrain_batch(mesh, batch)
            return base_step(state, batch, rng)

        jit_fold_step = jax.jit(step_with_fold, donate_argnums=0)
        train_step = lambda state, batch, rng: jit_fold_step(
            state, batch, rng, device_corpus)
    else:
        train_step = jax.jit(base_step, donate_argnums=0)
    eval_step = jax.jit(make_encoder_eval_step(model, max_samples))

    sampler = SizeAwareSampler(trainset.emg_lengths, max_len,
                               seed=C.RANDOM_SEED)
    plateau = ReduceLROnPlateau()
    best_val_loss = float("inf")
    num_no_improvement = 0
    batch_idx = 0
    global_step = 0

    # Checkpoint saves D2H-transfer the whole param tree, which through the
    # TPU tunnel costs ~14 s — far more than an epoch of compute on the dev
    # corpus. Best params are therefore snapshotted ON DEVICE (one jitted
    # copy dispatch) on every improvement, and flushed to disk only every
    # ``save_interval_epochs`` epochs and at the end of training.
    snap = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    best_snapshot = None       # device-side {"params", "batch_stats"}
    best_dirty = False         # snapshot newer than what's on disk
    last_dirty = False

    def flush_checkpoints(force: bool = False):
        nonlocal best_dirty, last_dirty
        if best_dirty and best_snapshot is not None:
            save_pytree(output_directory / "best_val_loss_model",
                        best_snapshot)
            best_dirty = False
        if last_dirty and (force or save_interval_epochs > 0):
            save_pytree(output_directory / "last_model",
                        {"params": state.params,
                         "batch_stats": state.batch_stats})
            last_dirty = False

    from ste_gan_tpu.data.loader import Prefetcher

    for epoch_idx in range(num_epochs):
        logging.info("Starting encoder epoch %d", epoch_idx + 1)
        epoch_start = time.time()

        def _batches():
            # Fold + host->device transfer in a background thread so batch
            # k+1 overlaps step k's compute (floats ship as transfer_dtype;
            # every loss upcasts on device). In device-resident mode the
            # fold happens on-device: only {rows, num_samples} descriptors
            # (~260 bytes) cross the wire per batch.
            for index_batch in sampler:
                if device_corpus is not None:
                    rows = np.zeros(max_samples, np.int32)
                    rows[:len(index_batch)] = index_batch
                    desc = {"rows": rows,
                            "num_samples": np.int32(len(index_batch))}
                    # Descriptors feed a cumsum over ALL rows — replicate
                    # them (sharding [max_samples] ints saves nothing and
                    # costs an all-gather before the fold).
                    yield (replicate(mesh, desc) if mesh is not None
                           else jax.device_put(desc))
                    continue
                items = [trainset[i] for i in index_batch]
                batch = fold_encoder_batch(
                    items, n_win=n_win, max_samples=max_samples,
                    max_silent=max_silent,
                    silent_target_frames=silent_target_frames,
                    silent_pred_frames=silent_pred_frames).as_dict()
                batch = {k: (v.astype(np_float)
                             if getattr(v, "dtype", None) == np.float32 else v)
                         for k, v in batch.items()}
                yield place_batch(batch)

        # Per-step metrics stay on device; host conversion happens once at
        # epoch end (a float() per step would serialize every dispatch).
        pending = []
        for batch in Prefetcher(_batches, 2):
            lr = warmup_lr(batch_idx, warmup=warmup_steps) * plateau.multiplier
            state.opt_state.hyperparams["learning_rate"] = np.float32(lr)
            state, metrics = train_step(state, batch, batch_idx)
            pending.append((global_step + 1, metrics))
            batch_idx += 1
            global_step += 1
            if debug:
                logging.warning("debug: breaking train loop after one batch")
                break

        losses = []
        for step_i, metrics in pending:
            loss_val = float(metrics["loss"])
            losses.append(loss_val)
            phon_acc = (int(metrics["num_correct"])
                        / max(int(metrics["num_frames"]), 1))
            writer.scalar("train/loss", loss_val, step_i)
            writer.scalar("train_loss/phon_acc", phon_acc, step_i)

        val, phoneme_acc, _ = evaluate(model, eval_step, state, devset,
                                       n_win_eval, max_samples,
                                       place_batch=place_batch)
        writer.scalar("val/loss", val, global_step)
        writer.scalar("val/phon_acc", phoneme_acc, global_step)
        plateau.step(val)
        logging.info(
            "epoch %d: train loss %.4f | val loss %.4f | val phon acc %.2f%% "
            "(%.1fs)", epoch_idx + 1, float(np.mean(losses)), val,
            phoneme_acc * 100, time.time() - epoch_start)

        if val < best_val_loss:
            logging.info("Snapshotting best encoder (val loss improved)")
            best_snapshot = snap({"params": state.params,
                                  "batch_stats": state.batch_stats})
            best_dirty = True
            best_val_loss = float(val)
            num_no_improvement = 0
        else:
            num_no_improvement += 1
        last_dirty = True

        if save_interval_epochs > 0 and (epoch_idx + 1) % save_interval_epochs == 0:
            flush_checkpoints()

        if debug:
            logging.warning("debug: breaking epoch loop")
            break
        if num_no_improvement > EC.EARLY_STOP_PATIENCE:
            logging.warning("early stop: no improvement for %d epochs",
                            num_no_improvement)
            break

    flush_checkpoints(force=True)
    writer.close()
    return state


def init_voiced_datasets(emg_dataset_root: Path):
    """Voiced-only train/dev/test datasets with train-derived vocabularies
    (reference init_voiced_datasets_emg_encoder_training;
    ste_gan/emg_encoder/utils.py:118-146)."""
    trainset = EMGDataset(emg_dataset_root, partition="train",
                          only_include_voiced=True, return_mfccs=False,
                          return_emg_feats=False, filter_by_length=False)

    def eval_set(partition):
        return EMGDataset(emg_dataset_root, partition, filter_by_length=False,
                          return_mfccs=False, return_emg_feats=False,
                          only_include_voiced=True,
                          session_id_to_idx=trainset.session_id_to_idx,
                          speaking_mode_id_to_idx=trainset.speaking_mode_id_to_idx)

    devset, testset = eval_set("valid"), eval_set("test")
    EMGDataset.check_no_data_overlap([trainset, devset, testset])
    return trainset, devset, testset


def init_mixed_datasets(emg_dataset_root: Path):
    """Voiced + silent train/dev/test datasets for mixed-batch encoder
    training. The reference *intends* this via
    init_datasets_for_emg_encoder_train but that function is broken (passes
    kwargs EMGDataset doesn't accept; ste_gan/emg_encoder/utils.py:149-180)
    — this is the working equivalent. ``strict`` stays on; silent samples
    skip the 16x EMG-length invariant (their targets come from the parallel
    voiced recording)."""
    trainset = EMGDataset(emg_dataset_root, partition="train",
                          only_include_voiced=False, return_mfccs=False,
                          return_emg_feats=False, filter_by_length=False)

    def eval_set(partition):
        return EMGDataset(emg_dataset_root, partition, filter_by_length=False,
                          return_mfccs=False, return_emg_feats=False,
                          only_include_voiced=False,
                          session_id_to_idx=trainset.session_id_to_idx,
                          speaking_mode_id_to_idx=trainset.speaking_mode_id_to_idx)

    devset, testset = eval_set("valid"), eval_set("test")
    EMGDataset.check_no_data_overlap([trainset, devset, testset])
    return trainset, devset, testset


def create_output_dir_name(data_root: Path, emg_enc_name: str,
                           seq_len: int = EC.SEQ_LEN, debug: bool = False) -> str:
    debug_str = "DEBUG_" if debug else ""
    return f"{debug_str}{emg_enc_name}__seq_len__{seq_len}__data_{Path(data_root).name}"


def main(args: argparse.Namespace) -> None:
    cfg = load_config(args=args, override_with_eval_args=False)
    emg_dataset_root = Path(cfg.data.dataset_root)
    mode_name = "_mixed" if args.include_silent else "_voiced_only"
    output_directory = Path(args.exp_dir) / create_output_dir_name(
        emg_dataset_root, cfg.emg_encoder.type + mode_name,
        debug=args.debug)
    output_directory.mkdir(exist_ok=True, parents=True)
    print(f"Output directory: {output_directory}")

    done_file = output_directory / ".done"
    if done_file.exists():
        logging.warning("Exiting: '.done' exists: %s", done_file.resolve())
        sys.exit()

    setup_run_logging(output_directory)
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    config_file = output_directory / "config.yaml"
    if not config_file.exists():
        cfg.save(config_file)

    init_fn = init_mixed_datasets if args.include_silent else init_voiced_datasets
    trainset, devset, _ = init_fn(emg_dataset_root)
    logging.info("train/dev: %d / %d utterances", len(trainset), len(devset))

    train_encoder_model(cfg, trainset, devset, output_directory,
                        debug=args.debug, max_len=args.max_batch_len,
                        num_epochs=args.num_epochs,
                        warmup_steps=args.warmup_steps,
                        save_interval_epochs=args.save_interval_epochs,
                        device_resident_data=args.device_resident_data,
                        transfer_dtype=args.transfer_dtype,
                        data_parallel=args.data_parallel,
                        model_parallel=args.model_parallel,
                        pipeline_stages=args.pipeline_stages,
                        pipeline_microbatches=args.pipeline_microbatches)
    done_file.write_text("Done training.\n")


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default="configs/ste_gan_base_gantts.yaml")
    parser.add_argument("--exp_dir", type=Path, default=Path("exp/emg_encoder"))
    parser.add_argument("--data", type=str, default="configs/data/gaddy_and_klein_corpus.yaml")
    parser.add_argument("--emg_enc_cfg", type=str,
                        default="configs/emg_encoder/conv_transformer.yaml")
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--include_silent", action="store_true", default=False,
                        help="Train on mixed voiced+silent batches (silent "
                             "samples use the DTW-aligned loss).")
    parser.add_argument("--num_epochs", type=int, default=EC.NUM_EPOCHS)
    parser.add_argument("--max_batch_len", type=int, default=EC.TRAIN_BATCH_MAX_LEN,
                        help="Total EMG samples per packed batch.")
    parser.add_argument("--warmup_steps", type=int,
                        default=EC.LEARNING_RATE_WARMUP,
                        help="Linear LR warmup batches (reference: 500; "
                             "emg_encoder/constants.py:20).")
    parser.add_argument("--device_resident_data",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="Keep the train split in device memory and fold "
                             "batches on-device from {rows, num_samples} "
                             "descriptors (--no-device_resident_data for the "
                             "host fold+transfer pipeline, e.g. when the "
                             "split exceeds device memory).")
    parser.add_argument("--transfer_dtype", type=str, default="float16",
                        choices=("float16", "float32"),
                        help="Float precision of training inputs (wire "
                             "format on the host path, storage on the "
                             "device-resident path).")
    parser.add_argument("--data_parallel", type=int, default=-1,
                        help="Data-parallel mesh size (<=0 = all devices / "
                             "model_parallel; clamped to a divisor of the "
                             "fold's window count). Parameters replicate, "
                             "the folded batch shards over 'data'.")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="Tensor-parallel mesh size: >1 shards "
                             "parameters + AdamW moments into output-channel "
                             "slabs over a 2-D (data, model) mesh "
                             "(parallel/tensor_parallel.py).")
    parser.add_argument("--pipeline_stages", type=int, default=1,
                        help="GPipe pipeline depth: >1 executes the "
                             "transformer stack over a (data, stage) mesh "
                             "— stage s owns layers [s*L/S, (s+1)*L/S), "
                             "microbatches ride a ppermute ring "
                             "(parallel/pipeline_parallel.py). Requires "
                             "num_transformer_layers %% stages == 0; "
                             "mutually exclusive with --model_parallel.")
    parser.add_argument("--pipeline_microbatches", type=int, default=0,
                        help="Microbatches per pipelined step (0 = one per "
                             "fold window, the smallest bubble); must "
                             "divide the fold's window count.")
    parser.add_argument("--save_interval_epochs", type=int, default=1,
                        help="Flush best/last checkpoints to disk every N "
                             "epochs (best params are snapshotted on device "
                             "each improvement regardless; the end of "
                             "training always flushes). Through the TPU "
                             "tunnel a disk save D2H-transfers the full "
                             "tree (~14 s) — raise this for long runs.")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
