"""GAN training runtime (CLI).

The TPU-native equivalent of ``python ste_gan/train.py`` (reference
ste_gan/train.py:39-581), preserving its training semantics and run-dir
protocol:

* hyperparameter-encoding run directory under ``model_base_dir``;
* ``.done`` sentinel makes finished runs idempotent; ``--continue_run``
  resumes from the newest checkpoint in the run dir;
* ``config.yaml`` snapshot + ``log.txt`` + TensorBoard scalars;
* per-epoch exponential LR decay (gamma 0.999) for both optimizers;
* validation every ``interval_valid`` steps (TD / speech-unit / phoneme /
  waveform errors + phoneme accuracy incl./excl. silence), best checkpoint
  by validation speech-unit error;
* envelope sample plots every ``interval_sample`` steps;
* periodic / final / last checkpoints (single Orbax pytree each).

The execution model differs where TPU-native wins: one fused jit step per
iteration over a data-parallel mesh, host-side prefetch, device-resident
metric accumulation (host syncs only at logging boundaries).
"""
from __future__ import annotations

import argparse
import itertools
from functools import partial
import logging
import signal
import sys
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import (
    Config, add_eval_hyperparams_to_parser, create_ste_gan_model_name,
    load_config, train_setting)
from ste_gan_tpu.data.loader import Prefetcher, loaders_via_config
from ste_gan_tpu.infer import EMGSynthesizer
from ste_gan_tpu.parallel.fsdp import (
    fsdp_shard_state, fsdp_wrap_eval_step, fsdp_wrap_gan_step)
from ste_gan_tpu.parallel.mesh import (
    create_mesh, largest_divisor_mesh_size, replicate, shard_batch)
from ste_gan_tpu.parallel.tensor_parallel import (
    create_mesh_2d, shard_batch_2d, shard_state)
from ste_gan_tpu.train.checkpoint import (
    CheckpointManager, load_pytree, restore_from_path)
from ste_gan_tpu.train.gan import (
    GANModels, build_models, epoch_lr, eval_generator_params, init_state,
    make_eval_step, make_train_step, set_learning_rate)
from ste_gan_tpu.utils.logging_utils import MetricLogger, setup_run_logging
from ste_gan_tpu.utils.metrics import (
    mean_error, phoneme_accuracy, phoneme_accuracy_no_silence)
from ste_gan_tpu.utils.profiling import StepTimer
from ste_gan_tpu.utils.plotting import plot_real_vs_fake_emg_signal_with_envelope


class HostMemoryRestart(RuntimeError):
    """Raised by :func:`train` when the host-RSS watchdog trips: a blocking
    resumable checkpoint has already been written; the caller should
    restart the process and resume (``main`` exec-restarts with
    ``--continue_run``). Exists as an exception (rather than an in-place
    exec) so in-process callers — tests, notebooks — regain control."""

    def __init__(self, step: int, rss_gb: float):
        super().__init__(
            f"host RSS {rss_gb:.1f} GiB over threshold at step {step}; "
            "resumable checkpoint saved")
        self.step = step
        self.rss_gb = rss_gb


# Re-exported for callers/tests that import it from here; the shared
# definition (and the rationale for why long-lived processes must bound
# their own RSS) lives in utils/hostmem.py. See
# ``TrainConfig.host_rss_restart_gb``.
from ste_gan_tpu.utils.hostmem import host_rss_gb  # noqa: E402


def load_frozen_encoder(cfg: Config, models: GANModels,
                        emg_enc_ckpt: Optional[Path], rng: jax.Array):
    """Initialise the frozen perceptual encoder; restore from an Orbax
    checkpoint when given (reference load_emg_encoder;
    ste_gan/models/emg_encoder.py:117-127)."""
    template = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels)),
        train=False))(rng)
    if emg_enc_ckpt:
        logging.info("Loading EMG encoder checkpoint: %s", emg_enc_ckpt)
        return load_pytree(Path(emg_enc_ckpt), template)
    logging.warning(
        "No EMG encoder checkpoint given — using a RANDOM frozen encoder. "
        "Perceptual losses will be meaningless; pre-train one with "
        "ste_gan_tpu.train.train_encoder.")
    return template


def train(cfg: Config, model_directory: Path, resume: bool, debug: bool,
          emg_enc_ckpt: Optional[Path] = None,
          profile_steps: int = 0,
          init_checkpoint: Optional[Path] = None) -> Dict[str, float]:
    """Run adversarial training. Returns the final validation metrics.

    ``profile_steps > 0`` captures a jax.profiler trace of that many steps
    (written under <run_dir>/profile, viewable in TensorBoard/Perfetto).
    ``init_checkpoint`` restores the full train state from an explicit
    checkpoint (or run) directory instead of the run dir's latest."""
    model_directory = Path(model_directory)
    writer = MetricLogger(model_directory)
    model_parallel = max(1, int(train_setting(cfg.train, "model_parallel")))
    fsdp = bool(train_setting(cfg.train, "fsdp"))
    requested = (cfg.train.data_parallel if cfg.train.data_parallel > 0
                 else len(jax.devices()) // model_parallel)
    data_size = largest_divisor_mesh_size(cfg.train.batch_size, requested)
    if model_parallel > 1:
        # 2-D (data, model) mesh: state sharded into output-channel slabs
        # over 'model' (parallel/tensor_parallel.py), batch over 'data';
        # the SAME step function — GSPMD partitions it.
        mesh = create_mesh_2d(data_size, model_parallel)
        place_tree = partial(shard_state, mesh)
        place_batch = partial(shard_batch_2d, mesh)
    else:
        mesh = create_mesh(data_size)
        place_tree = partial(replicate, mesh)
        place_batch = partial(shard_batch, mesh)
    if fsdp:
        # FSDP (parallel/fsdp.py): persistent state STORED sharded over
        # 'data' (hybrid with 'model' when model_parallel > 1); the steps
        # are wrapped below to gather compute trees at entry and re-scatter
        # the updated state.
        place_tree = partial(fsdp_shard_state, mesh)
    logging.info("Mesh: %s %s over %d device(s)%s", mesh.axis_names,
                 dict(mesh.shape), mesh.size, " [FSDP]" if fsdp else "")

    models = build_models(cfg)
    rng = jax.random.PRNGKey(cfg.train.random_seed)
    rng, enc_rng, state_rng = jax.random.split(rng, 3)
    encoder_variables = load_frozen_encoder(cfg, models, emg_enc_ckpt, enc_rng)

    state = init_state(cfg, models, state_rng)
    ckpt = CheckpointManager(model_directory)
    start_epoch = -1
    if init_checkpoint is not None:
        state, start_epoch = restore_from_path(Path(init_checkpoint), state)
    elif resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, start_epoch = restored

    logging.info("Loading data from %s", cfg.data.dataset_root)
    train_loader, valid_loader, _ = loaders_via_config(cfg)
    train_loader.dataset.save_session_and_speaking_mode_mapping_json(model_directory)

    t_cfg = cfg.train
    # float16 wire format for train batches: the host->device transfer is
    # the end-to-end bottleneck (81 ms/batch f32 vs 25 ms f16 through the
    # tunnel; benchmarks/input_pipeline_probe.py) — losses upcast on device.
    transfer_dtype = (np.float16 if t_cfg.transfer_dtype == "float16"
                      else np.float32)

    # Device-resident corpus (TrainConfig.device_resident_data): upload the
    # padded train split to HBM once; per step only [B] int32 crop
    # descriptors cross the wire and the jitted step gathers the crops
    # on-device (data/device_corpus.py).
    device_corpus = None
    if train_setting(t_cfg, "device_resident_data"):
        from ste_gan_tpu.data.device_corpus import DeviceCorpus, IndexLoader
        from ste_gan_tpu.parallel.mesh import replicate_sharding

        device_corpus = DeviceCorpus.from_dataset(
            train_loader.dataset, emg_train_length=t_cfg.chunk_size,
            float_dtype=(jnp.float16 if transfer_dtype == np.float16
                         else jnp.float32),
            sharding=replicate_sharding(mesh))
        train_loader = IndexLoader(train_loader, device_corpus.unit_lengths)
        logging.info(
            "Device-resident corpus: %d utterances, %.1f MB in HBM — "
            "per-step H2D reduced to [B] int32 crop descriptors",
            len(device_corpus.unit_lengths), device_corpus.nbytes / 2**20)

    state = place_tree(state)
    encoder_variables = place_tree(encoder_variables)

    # ``corpus`` is threaded through as a jit ARGUMENT (DeviceCorpus is a
    # registered pytree; None in host-pipeline mode). Closing over it would
    # bake the whole corpus into the lowered HLO as a constant — fatal at
    # real-corpus scale (see DeviceCorpus docstring).
    inner_step = make_train_step(cfg, models)
    if fsdp:
        inner_step = fsdp_wrap_gan_step(inner_step, mesh)
    if device_corpus is not None:
        def raw_train_step(state, batch, encoder_variables, corpus):
            full = corpus.gather(batch["rows"], batch["starts"])
            return inner_step(state, full, encoder_variables)
    else:
        def raw_train_step(state, batch, encoder_variables, corpus):
            return inner_step(state, batch, encoder_variables)
    raw_eval = make_eval_step(cfg, models)
    if fsdp:
        raw_eval = fsdp_wrap_eval_step(raw_eval, mesh)
    eval_step = jax.jit(raw_eval)

    # ONE dispatch per step: the epoch phoneme-counter accumulation rides
    # inside the same jitted program as the train step. A separate jitted
    # call per step pays a second dispatch RPC (severe through a remote-TPU
    # tunnel: measured ~100 ms/step of pure dispatch latency; measurable
    # anywhere).
    @partial(jax.jit, donate_argnums=(0, 3))
    def train_step(state, batch, encoder_variables, acc, corpus):
        state, metrics = raw_train_step(state, batch, encoder_variables,
                                        corpus)
        acc = {k: acc[k] + metrics[f"count/{k}"] for k in acc}
        return state, metrics, acc

    # K-step dispatch (train.steps_per_dispatch): lax.scan the fused step
    # over K batches stacked on a leading axis — ONE transfer+execute RPC
    # per K steps. The scan body compiles once, so compile time matches the
    # single-step program. Per-step metrics come back stacked [K, ...] so
    # interval_log can report the exact step its multiple lands on.
    @partial(jax.jit, donate_argnums=(0, 3))
    def train_step_k(state, stacked_batch, encoder_variables, acc, corpus):
        def body(carry, batch):
            state, acc = carry
            state, metrics = raw_train_step(state, batch, encoder_variables,
                                            corpus)
            acc = {k: acc[k] + metrics[f"count/{k}"] for k in acc}
            return (state, acc), metrics
        (state, acc), metrics_seq = jax.lax.scan(
            body, (state, acc), stacked_batch)
        return state, metrics_seq, acc

    synth = EMGSynthesizer(models.generator, state.gen_params, bucket=64)
    valid_dataset = valid_loader.dataset

    best_su_loss = ckpt.best_su_error()  # survives restarts (+inf if none)
    steps = int(state.step)
    start_steps = steps
    rss_limit = float(train_setting(t_cfg, "host_rss_restart_gb") or 0.0)
    log_start = time.time()
    final_val: Dict[str, float] = {}
    step_timer = StepTimer(
        channel_samples_per_step=(t_cfg.batch_size * t_cfg.chunk_size
                                  * cfg.data.num_emg_channels),
        num_devices=mesh.size)

    def run_validation(gen_params) -> Dict[str, float]:
        errors: Dict[str, list] = {k: [] for k in (
            "val/waveform", "val/envelope_l1", "val/multi_td",
            "val/speech_unit", "val/phoneme")}
        counters = {k: 0 for k in (
            "num_phones", "num_correct", "num_silence", "num_correct_no_silence")}
        for batch in valid_loader:
            batch = place_batch(_drop_none(batch))
            metrics = eval_step(gen_params, batch, encoder_variables)
            for key in errors:
                errors[key].append(float(metrics[key]))
            for key in counters:
                counters[key] += int(metrics[f"count/{key}"])
        out = {key: mean_error(vals) for key, vals in errors.items()}
        out["val/phoneme_accuracy_avg"] = phoneme_accuracy(
            counters["num_phones"], counters["num_correct"])
        out["val/phoneme_accuracy_avg_no_sil"] = phoneme_accuracy_no_silence(
            counters["num_phones"], counters["num_correct_no_silence"],
            counters["num_silence"])
        return out

    def plot_samples(gen_params, step: int) -> None:
        # Under FSDP the live params are stored sharded; the synthesizer's
        # standalone jit needs them replicated (an explicit host-side
        # reshard — cheap at plot cadence).
        synth.params = replicate(mesh, gen_params) if fsdp else gen_params
        for i in range(min(t_cfg.num_test_samples + 1, len(valid_dataset))):
            sample = valid_dataset[i]
            fake = synth.synthesize(
                sample[cfg.model.speech_feature_type],
                int(sample[C.DataType.SESSION_INDEX]),
                int(sample[C.DataType.SPEAKING_MODE_INDEX]))
            plot_real_vs_fake_emg_signal_with_envelope(
                real_emg_signal=np.asarray(sample[C.DataType.REAL_EMG]),
                fake_emg_signal=fake,
                file_id=f"Validation sample {i}",
                metric_logger=writer, global_step=step)

    # Failure detection: on SIGTERM/SIGINT (preemption), save a resumable
    # checkpoint before exiting (the reference can only resume from its last
    # periodic save; see SURVEY.md §5 "failure detection").
    interrupted = {"flag": False}

    def _handle_signal(signum, frame):
        logging.warning("Signal %d received — saving preemption checkpoint", signum)
        interrupted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _handle_signal)
        except ValueError:  # not in main thread
            break

    # ONE continuous prefetched pipeline across epochs: recreating the
    # prefetcher per epoch drains the device-transfer pipeline at every
    # epoch boundary (measured ~2 batch latencies lost per epoch — ruinous
    # on small corpora with 3-step epochs). Batches carry their epoch index
    # so per-epoch semantics stay exact: every step of epoch e runs with
    # lr(e) (applied when the consumer first sees e), counters reset at the
    # boundary, '-last' saves fire on the boundary.
    def _cast_for_transfer(batch: Dict) -> Dict:
        if transfer_dtype == np.float32:
            return batch
        return {k: (v.astype(transfer_dtype)
                    if getattr(v, "dtype", None) == np.float32 else v)
                for k, v in batch.items()}

    dispatch_k = max(1, int(train_setting(t_cfg, "steps_per_dispatch")))

    def _epoch_batches():
        # Bounded production so the prefetch thread terminates with the run.
        # Yields (epoch, k, device_batch): k == dispatch_k items carry K
        # batches stacked on a leading axis for the scan path; k == 1 items
        # are plain single batches (epoch tails whose length isn't a
        # multiple of K, and the final approach to max_steps, so groups
        # never straddle an epoch boundary or overshoot max_steps).
        steps0 = steps  # freeze: the consumer mutates `steps` concurrently
        budget = t_cfg.max_steps - steps0 + cfg.train.prefetch + 4
        produced = 0  # consumer counter of the next batch = steps0 + produced
        group: list = []

        def flush(ep):
            nonlocal group
            pending, group = group, []
            if len(pending) == dispatch_k:
                stacked = {k: np.stack([b[k] for b in pending])
                           for k in pending[0]}
                yield ep, dispatch_k, place_batch(stacked)
            else:
                for b in pending:
                    yield ep, 1, place_batch(b)

        for ep in itertools.count(start_epoch + 1):
            for host_batch in train_loader:
                if produced >= budget:
                    yield from flush(ep)
                    return
                b = _cast_for_transfer(_drop_none(host_batch))
                if dispatch_k == 1:
                    produced += 1
                    # shard_batch (async device_put) runs in the prefetch
                    # thread so transfer of batch k+1 overlaps step k.
                    yield ep, 1, place_batch(b)
                    continue
                # Start a group only if a full one fits before max_steps
                # (an already-started group keeps filling: its start was
                # validated, and interleaving singles would reorder data).
                if group or (steps0 + produced + dispatch_k - 1
                             < t_cfg.max_steps):
                    group.append(b)
                    produced += 1
                    if len(group) == dispatch_k:
                        yield from flush(ep)
                else:
                    produced += 1
                    yield ep, 1, place_batch(b)
            yield from flush(ep)  # epoch tail -> singles

    acc = {}
    epoch = start_epoch
    epoch_start = time.time()

    def _begin_epoch(ep: int):
        nonlocal epoch, epoch_start, acc
        if acc:  # close out the previous epoch
            logging.info("Finished epoch %d in %.1fs", epoch,
                         time.time() - epoch_start)
            if epoch % t_cfg.save_last_epoch_interval == 0:
                ckpt.save_last(state, epoch)
        epoch = ep
        epoch_start = time.time()
        logging.info("Starting epoch %d", epoch)
        lr = epoch_lr(cfg, epoch)
        set_learning_rate(state.opt_g, lr)
        set_learning_rate(state.opt_d, lr)
        writer.scalar("train/lr", lr, steps)
        # Host-side zeros: they ride up with the next step's dispatch
        # (no standalone device allocation RPCs at epoch boundaries).
        acc = {k: np.zeros((), np.int32)
               for k in ("num_phones", "num_correct", "num_silence",
                         "num_correct_no_silence")}

    # Interval checks below use the PRE-increment step index, with
    # ``steps = last + 1`` at the end of the loop body — matching the
    # reference's cadence (ste_gan/train.py:275-468: checks fire on the
    # pre-increment counter, so step-0 logging/validation fires and
    # step-indexed TensorBoard curves align with reference runs). A
    # K-step dispatch covers counters [first, last]; an interval fires
    # when one of its multiples lands in the group (on the post-group
    # state — up to K-1 steps later than single-step mode).
    for batch_epoch, k_steps, batch in Prefetcher(
            _epoch_batches, cfg.train.prefetch):
        if batch_epoch != epoch or not acc:
            _begin_epoch(batch_epoch)
        first, last = steps, steps + k_steps - 1

        def fired(interval: int):
            """Largest multiple of ``interval`` in [first, last]; None if
            the group contains none."""
            multiple = (last // interval) * interval
            return multiple if multiple >= first else None

        if profile_steps and first <= 10 <= last:
            jax.profiler.start_trace(str(model_directory / "profile"))
        if k_steps == 1:
            state, metrics, acc = train_step(
                state, batch, encoder_variables, acc, device_corpus)
            metrics_at = lambda step_i: metrics
        else:
            state, metrics_seq, acc = train_step_k(
                state, batch, encoder_variables, acc, device_corpus)
            metrics_at = lambda step_i: jax.tree.map(
                lambda x: x[step_i - first], metrics_seq)
            metrics = metrics_seq
        if profile_steps and first <= 9 + profile_steps <= last:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            logging.info("Wrote profiler trace to %s",
                         model_directory / "profile")

        if interrupted["flag"]:
            ckpt.save_periodic(state, last, epoch, block=True)
            logging.warning("Preemption checkpoint at step %d; exiting", last)
            writer.close()
            return final_val

        log_step = fired(t_cfg.interval_log)
        if log_step is not None:
            host = {k: float(v) for k, v in metrics_at(log_step).items()
                    if k.startswith("loss/")}
            writer.scalars({f"train_{k}": v for k, v in host.items()},
                           log_step)
            acc_host = {k: int(v) for k, v in acc.items()}
            ph_acc = ph_acc_ns = float("nan")  # encoder losses disabled
            if acc_host["num_phones"] > 0:
                # Counters are all-zero when the encoder losses are
                # disabled (e.g. the TD-only ablation arm) — skip the
                # accuracy scalars instead of logging 0/0 = NaN.
                ph_acc = phoneme_accuracy(acc_host["num_phones"],
                                          acc_host["num_correct"])
                ph_acc_ns = phoneme_accuracy_no_silence(
                    acc_host["num_phones"],
                    acc_host["num_correct_no_silence"],
                    acc_host["num_silence"])
                writer.scalar("train_loss/phoneme_accuracy_avg", ph_acc,
                              log_step)
                writer.scalar("train_loss/phoneme_accuracy_avg_no_sil",
                              ph_acc_ns, log_step)
            writer.scalars(step_timer.update(last), log_step)
            ms_per_batch = 1e3 * (time.time() - log_start) / t_cfg.interval_log
            logging.info(
                "Epoch %d | Steps %d | ms/batch %5.2f | G %.4f | D %.4f | "
                "Ph.Acc %.2f | Ph.Acc(no sil) %.2f",
                epoch, log_step, ms_per_batch, host.get("loss/generator", 0.0),
                host.get("loss/discriminator", 0.0), ph_acc, ph_acc_ns)
            log_start = time.time()

            rss = host_rss_gb()
            writer.scalar("train/host_rss_gb", rss, log_step)

            # Host-RSS watchdog (see HostMemoryRestart / host_rss_gb): a
            # restart only makes sense once this incarnation has advanced
            # at least one validation interval — otherwise an over-budget
            # baseline would thrash restarts forever.
            if rss_limit > 0:
                if rss > rss_limit:
                    if last - start_steps >= t_cfg.interval_valid:
                        ckpt.save_periodic(state, last, epoch, block=True)
                        writer.scalar("train/host_rss_gb", rss, last)
                        writer.close()
                        logging.warning(
                            "Host RSS %.1f GiB > %.1f GiB — saved resumable "
                            "checkpoint at step %d; restarting", rss,
                            rss_limit, last)
                        raise HostMemoryRestart(last, rss)
                    logging.warning(
                        "Host RSS %.1f GiB over the %.1f GiB restart "
                        "threshold at startup — continuing (restart needs "
                        ">=%d steps of progress)", rss, rss_limit,
                        t_cfg.interval_valid)

        val_step = fired(t_cfg.interval_valid)
        if val_step is not None:
            val_start = time.time()
            # With EMA on, validation (and hence best-model selection)
            # scores the EMA weights — the ones inference/exports ship.
            val = run_validation(eval_generator_params(state))
            final_val = val
            writer.scalars(val, val_step)
            logging.info("Validation @ %d: %s (%.2fs)", val_step,
                         {k: round(v, 4) for k, v in val.items()},
                         time.time() - val_start)
            if val["val/speech_unit"] < best_su_loss:
                best_su_loss = val["val/speech_unit"]
                logging.info("New best val SU error %.4f — saving best",
                             best_su_loss)
                ckpt.save_best(state, epoch, su_error=best_su_loss)

        sample_step = fired(t_cfg.interval_sample)
        if sample_step is not None:
            plot_samples(eval_generator_params(state), sample_step)

        # The tag carries the step the STATE is at (`last`); in single-step
        # mode that equals the fired multiple, in group mode it may sit up
        # to K-1 past it (resume reads the true counter from state.step).
        save_step = fired(t_cfg.interval_save)
        if save_step is not None and save_step > 0:
            ckpt.save_periodic(state, last, epoch)

        if last >= t_cfg.max_steps or debug:
            ckpt.save_final(state, epoch)
            done_file = model_directory / ".done"
            done_file.write_text(f"done: {time.time()}")
            logging.info("Training finished at step %d (.done written)", last)
            writer.close()
            return final_val

        steps = last + 1

    # Only reachable if the batch budget was exhausted before max_steps
    # (cannot happen with a correct budget) — save and exit cleanly.
    logging.warning("Batch pipeline exhausted at step %d before "
                    "max_steps %d", steps, t_cfg.max_steps)
    ckpt.save_final(state, epoch)
    writer.close()
    return final_val


def _drop_none(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if v is not None}


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(args: argparse.Namespace) -> None:
    cfg = load_config(args=args)

    debug = args.debug or cfg.train.debug
    output_directory = Path(cfg.model_base_dir) / create_ste_gan_model_name(
        cfg, add_timestamp=False, debug=debug)
    resume = bool(args.continue_run and output_directory.exists())
    output_directory.mkdir(exist_ok=True, parents=True)
    print(f"Output directory: {output_directory}")

    done_file = output_directory / ".done"
    if done_file.exists():
        logging.warning("Exiting: '.done' exists: %s", done_file.resolve())
        sys.exit()

    config_file = output_directory / "config.yaml"
    if not config_file.exists():
        cfg.save(config_file)

    setup_run_logging(output_directory)
    logging.info("Config:\n%s", cfg.to_yaml())

    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    try:
        train(cfg, output_directory, resume=resume, debug=debug,
              emg_enc_ckpt=args.emg_enc_ckpt or None,
              profile_steps=args.profile_steps,
              init_checkpoint=args.checkpoint)
    except HostMemoryRestart as restart:
        # The resumable checkpoint is already on disk; replace this leaked
        # process with a fresh one that resumes from it (persistent compile
        # cache makes the restart ~a restore + cache-hit compile).
        import os

        argv = [sys.executable, "-m", "ste_gan_tpu.train.train_gan",
                *sys.argv[1:]]
        if "--continue_run" not in argv:
            argv.append("--continue_run")
        if args.checkpoint is not None:
            # Resume from the run dir's own latest checkpoint, not the
            # original warm-start checkpoint, on subsequent incarnations.
            if "--checkpoint" in argv:
                idx = argv.index("--checkpoint")
                del argv[idx:idx + 2]
            else:
                argv = [a for a in argv
                        if not a.startswith("--checkpoint=")]
        logging.warning("exec-restart after step %d: %s", restart.step,
                        " ".join(argv))
        os.execv(sys.executable, argv)


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=str, default="configs/ste_gan_base_gantts.yaml")
    parser.add_argument("--data", type=str, default="configs/data/gaddy_and_klein_corpus.yaml")
    parser.add_argument("--emg_enc_cfg", type=str,
                        default="configs/emg_encoder/conv_transformer.yaml")
    parser.add_argument("--emg_enc_ckpt", type=str, default="",
                        help="Orbax checkpoint dir of a pre-trained EMG encoder.")
    parser.add_argument("--checkpoint", type=Path, default=None,
                        help="Explicit checkpoint (or run) directory to "
                             "restore the train state from.")
    parser.add_argument("--continue_run", action="store_true")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="Capture a jax.profiler trace of N steps.")
    return add_eval_hyperparams_to_parser(parser).parse_args()


if __name__ == "__main__":
    main(parse_args())
