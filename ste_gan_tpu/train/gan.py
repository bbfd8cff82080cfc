"""The fused adversarial train step.

The reference executes, per iteration (ste_gan/train.py:165-268): generator
forward; discriminator forward on detached fake + real; D backward + AdamW
step; discriminator forward on fake + real again *with the updated D*;
generator loss (adversarial MSE + 15x multi-TD + 1x speech-unit + 1x phoneme
+ 7x feature-matching [+ optional waveform MSE]); G backward + AdamW step —
with dozens of host syncs (``.item()``) along the way.

Here the whole sequence is ONE jit-compiled, data-parallel XLA program:

* the generator forward runs once, through ``jax.vjp`` — the D step uses the
  (gradient-stopped) fake, and the G gradients are pulled back through the
  saved VJP, exactly matching the reference's single-G-forward autograd
  graph;
* the D update happens *inside* the step, and the G loss is evaluated
  through the freshly updated discriminator, replicating the reference's
  update ordering;
* spectral-norm power-iteration state threads through all four
  discriminator forwards per step, like the reference's train-mode hooks;
* all metrics (including phoneme counters) come back as device arrays —
  zero host syncs inside the step;
* both AdamW optimizers use ``optax.inject_hyperparams`` so the per-epoch
  exponential LR decay (gamma=0.999; reference :98-104,470-472) is a host-side
  scalar write, not a recompile.

bf16 policy: parameters and optimizer states stay f32; module compute runs
in bf16 when ``cfg.train.mixed_precision`` (the TPU replacement for fp16 AMP
+ GradScaler — bf16's range needs no loss scaling); losses reduce in f32.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config, train_setting
from ste_gan_tpu.losses.encoder_loss import emg_encoder_loss
from ste_gan_tpu.losses.gan_loss import (
    discriminator_loss, feature_matching_loss, generator_adversarial_loss)
from ste_gan_tpu.losses.td_loss import multi_time_domain_loss
from ste_gan_tpu.models.discriminator import init_emg_discriminators
from ste_gan_tpu.models.emg_encoder import init_emg_encoder
from ste_gan_tpu.models.generator import init_emg_generator


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    disc_spectral: Any
    opt_g: Any
    opt_d: Any
    # Exponential moving average of gen_params (train.generator_ema > 0;
    # a quality extension beyond the reference — the EMA weights are what
    # validation/plots/inference/exports consume when present, via
    # eval_generator_params). None (the default) = off: the field
    # contributes no pytree leaves, so states, checkpoints and sharding
    # rules are unchanged for every EMA-off run.
    gen_ema: Any = None


def eval_generator_params(state: GANTrainState):
    """The generator parameters downstream consumers should evaluate:
    the EMA weights when EMA training is on, the live weights otherwise.

    ``getattr`` (not attribute access) so pre-EMA duck-typed states —
    restored legacy pytrees, test fakes carrying only ``gen_params`` —
    keep working everywhere this is called (serving reload, eval, export)."""
    ema = getattr(state, "gen_ema", None)
    return state.gen_params if ema is None else ema


class _OptaxAdapter:
    """(init, apply_gradients) facade over an optax GradientTransformation."""

    def __init__(self, gt: optax.GradientTransformation):
        self._gt = gt

    def init(self, params):
        return self._gt.init(params)

    def apply_gradients(self, params, grads, opt_state):
        updates, opt_state = self._gt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state


class _FlatAdamW:
    """Flat single-buffer AdamW (ste_gan_tpu/ops/flat_adamw.py): identical
    math to optax.adamw, but ONE fused elementwise chain over all ~230
    parameter leaves instead of thousands of tiny per-leaf kernels —
    measured 4.6 vs 11.4 ms per dual-net update in isolation on v5e, but
    NEUTRAL inside the fused step (benchmarks/opt_probe.py; PARITY.md).
    NOTE: its optimizer-state layout differs from optax's, so checkpoints
    written with one optimizer flavour resume only under the same
    flavour."""

    def __init__(self, lr, b1, b2, eps=1e-8, weight_decay=1e-2):
        self._hp = dict(lr=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)

    def init(self, params):
        from ste_gan_tpu.ops.flat_adamw import flat_adamw_init

        return flat_adamw_init(params, learning_rate=self._hp["lr"])

    def apply_gradients(self, params, grads, opt_state):
        from ste_gan_tpu.ops.flat_adamw import flat_adamw_apply

        return flat_adamw_apply(
            params, grads, opt_state, b1=self._hp["b1"], b2=self._hp["b2"],
            eps=self._hp["eps"], weight_decay=self._hp["weight_decay"])


def make_optimizer(cfg: Config):
    """AdamW(lr=2e-4, betas=(.8,.99), wd=1e-2) with an injectable learning
    rate (reference optimizer: ste_gan/constants.py:57; torch AdamW default
    weight decay is 1e-2). Backends, all with identical update math:

    * default: plain ``optax.inject_hyperparams(optax.adamw)`` — inside
      the fused step XLA fuses the per-leaf chains into the backward
      program, and no alternative measured faster end-to-end;
    * ``flat_optimizer``: flat single-buffer chain (_FlatAdamW) — 2.5x
      faster in isolation, neutral in-step (benchmarks/opt_probe.py);
    * ``fused_optimizer``: per-leaf Pallas kernel (slowest; kept for A/B).
    """
    if train_setting(cfg.train, "fused_optimizer"):
        from ste_gan_tpu.ops.fused_adamw import fused_adamw

        return _OptaxAdapter(fused_adamw(
            cfg.train.learning_rate, b1=cfg.train.adam_b1,
            b2=cfg.train.adam_b2, eps=1e-8, weight_decay=1e-2))
    if train_setting(cfg.train, "flat_optimizer"):
        return _FlatAdamW(cfg.train.learning_rate, cfg.train.adam_b1,
                          cfg.train.adam_b2)
    return _OptaxAdapter(optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.train.learning_rate,
        b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
        eps=1e-8, weight_decay=1e-2,
    ))


def set_learning_rate(opt_state, lr: float):
    """Host-side LR write into an inject_hyperparams-style state (the
    per-epoch ExponentialLR analogue; no recompilation). The value is a
    HOST scalar: it rides up with the next step's dispatch instead of
    paying a standalone device-transfer RPC at every epoch boundary."""
    opt_state.hyperparams["learning_rate"] = np.float32(lr)
    return opt_state


def epoch_lr(cfg: Config, epoch: int) -> float:
    """lr * gamma^epoch, stepped per epoch like the reference scheduler."""
    return float(cfg.train.learning_rate) * float(cfg.train.lr_decay_gamma) ** max(0, epoch)


@dataclasses.dataclass
class GANModels:
    """Bundled model definitions. The frozen encoder's variables are passed
    into the step explicitly (a jit argument, not a baked-in constant)."""

    generator: Any
    discriminator: Any
    encoder: Any

    def encoder_apply(self, encoder_variables, emg):
        return self.encoder.apply(encoder_variables, emg, train=False)


def build_models(cfg: Config) -> GANModels:
    dtype = jnp.bfloat16 if cfg.train.mixed_precision else jnp.float32
    generator = init_emg_generator(cfg, dtype=dtype)
    discriminator = init_emg_discriminators(cfg, dtype=dtype)
    encoder = init_emg_encoder(cfg, dtype=dtype)
    return GANModels(generator, discriminator, encoder)


def init_state(cfg: Config, models: GANModels, rng: jax.Array) -> GANTrainState:
    feat_dim = (C.SPEECH_UNITS_FEAT_SIZE
                if cfg.model.speech_feature_type == C.DataType.SPEECH_UNITS
                else C.NUM_MFCCS)
    frames = cfg.train.chunk_size // C.HOPSIZE
    if cfg.model.speech_feature_type == C.DataType.MFCCS:
        # MFCCs run at 2x the speech-unit rate (100 Hz vs 50 Hz).
        frames *= 2
    rng_g, rng_d = jax.random.split(rng)
    feats = jnp.zeros((1, frames, feat_dim))
    ids = jnp.zeros((1,), jnp.int32)
    # jit the inits: eager op-by-op initialisation is pathologically slow
    # through a remote-TPU tunnel (thousands of tiny dispatches).
    gen_vars = jax.jit(models.generator.init)(rng_g, feats, ids, ids)
    emg = jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels))
    disc_vars = jax.jit(partial(models.discriminator.init, train=False))(rng_d, emg)

    opt = make_optimizer(cfg)
    ema_decay = float(train_setting(cfg.train, "generator_ema"))
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_vars["params"],
        disc_params=disc_vars["params"],
        disc_spectral=disc_vars["spectral"],
        opt_g=opt.init(gen_vars["params"]),
        opt_d=opt.init(disc_vars["params"]),
        # Distinct buffers: gen_params and gen_ema must not alias under
        # jit buffer donation.
        gen_ema=(jax.tree.map(jnp.copy, gen_vars["params"])
                 if ema_decay > 0 else None),
    )


def make_train_step(cfg: Config, models: GANModels) -> Callable:
    """Returns the jit-able fused step:
    (state, batch) -> (new_state, metrics)."""
    t = cfg.train
    use_adv = bool(t.loss_adversarial)
    use_fm = bool(t.loss_feat_match_error)
    use_td = bool(t.loss_multi_td_error)
    use_su = bool(t.loss_speech_unit_error)
    use_ph = bool(t.loss_phoneme_error)
    use_wave = bool(t.loss_waveform_error)
    optimizer = make_optimizer(cfg)
    feature_key = cfg.model.speech_feature_type
    ema_decay = float(train_setting(t, "generator_ema"))

    def ema_update(old_ema, new_params, step):
        """EMA of the generator weights (state-driven: a state without the
        gen_ema tree — the default — costs nothing).

        The decay RAMPS: ``d_t = min(decay, (1+t)/(10+t))`` with ``t`` the
        completed-update count. A constant decay seeded from the init
        parameters carries a ~1/(1-decay)-step startup lag (the round-4
        A/B measured exactly that textbook artifact and nothing else —
        VERDICT r4 #2); the ramp keeps the average tracking the live
        weights until ~1/(1-decay) steps, then converges to the constant-
        decay estimator — equivalent to zero-debiasing, but ``gen_ema``
        stays directly consumable (no decay/step bookkeeping for serving,
        eval, or export)."""
        if old_ema is None:
            return None
        t = step.astype(jnp.float32)
        d = jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))
        return jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, old_ema, new_params)

    def disc_apply(params, spectral, x):
        fmaps, mutated = models.discriminator.apply(
            {"params": params, "spectral": spectral}, x, train=True,
            mutable=["spectral"])
        return fmaps, mutated["spectral"]

    fused_passes = bool(train_setting(t, "fused_disc_passes"))

    def disc_apply_pair(params, spectral, fake_x, real_x):
        """One (fake, real) discriminator evaluation pair.

        With ``train.fused_disc_passes`` (default) the two inputs evaluate
        in ONE traced ensemble pass: the stateless weight-normed
        sub-discriminators run on the stacked batch-2B input (bit-identical
        to two calls), and the spectrally-normalised scale discriminator
        runs on fake then real separately inside the pass, so its power
        iteration advances exactly like the reference's two forwards
        (ste_gan/train.py:189-207) — semantics-exact, ~10% faster step.
        """
        if fused_passes:
            (fmaps_fake, fmaps_real), mutated = models.discriminator.apply(
                {"params": params, "spectral": spectral}, fake_x, train=True,
                pair=real_x, mutable=["spectral"])
            return fmaps_fake, fmaps_real, mutated["spectral"]
        fmaps_fake, spectral = disc_apply(params, spectral, fake_x)
        fmaps_real, spectral = disc_apply(params, spectral, real_x)
        return fmaps_fake, fmaps_real, spectral

    def gen_fwd(gen_params, batch):
        return models.generator.apply(
            {"params": gen_params}, batch[feature_key],
            batch[C.DataType.SESSION_INDEX],
            batch[C.DataType.SPEAKING_MODE_INDEX])

    def d_loss_fn(disc_params, spectral, fake, real):
        fmaps_fake, fmaps_real, spectral = disc_apply_pair(
            disc_params, spectral, jax.lax.stop_gradient(fake), real)
        return discriminator_loss(fmaps_fake, fmaps_real), spectral

    def g_loss_fn(fake_in, spectral, disc_params, batch, encoder_variables):
        real = batch[C.DataType.REAL_EMG].astype(jnp.float32)
        loss = jnp.zeros((), jnp.float32)
        aux: Dict[str, jnp.ndarray] = {}
        if use_adv or use_fm:
            fmaps_fake, fmaps_real, spectral = disc_apply_pair(
                disc_params, spectral, fake_in, real)
        if use_adv:
            adv = generator_adversarial_loss(fmaps_fake)
            loss += adv
            aux["loss/adversarial"] = adv
        if use_td:
            td = multi_time_domain_loss(real, fake_in)
            loss += t.loss_multi_td_weight * td
            aux["loss/multi_td"] = td
        if use_su or use_ph:
            su_loss, ph_loss, counts = emg_encoder_loss(
                lambda emg: models.encoder_apply(encoder_variables, emg),
                fake_in, batch[C.DataType.SPEECH_UNITS],
                batch[C.DataType.PHONEMES])
            if use_su:
                loss += t.loss_speech_unit_weight * su_loss
                aux["loss/speech_unit"] = su_loss
            if use_ph:
                loss += t.loss_phoneme_weight * ph_loss
                aux["loss/phoneme"] = ph_loss
            aux.update({f"count/{k}": v for k, v in counts.items()})
        else:
            # Zero phoneme counters keep the trainer's in-step epoch
            # accumulation uniform when the encoder losses are disabled
            # (e.g. the TD-only ablation arm) — no encoder forward runs.
            aux.update({f"count/{k}": jnp.zeros((), jnp.int32)
                        for k in ("num_phones", "num_correct",
                                  "num_silence", "num_correct_no_silence")})
        if use_wave:
            wave = jnp.mean(jnp.square(fake_in - real))
            loss += t.loss_waveform_weight * wave
            aux["loss/waveform"] = wave
        if use_fm:
            fm = feature_matching_loss(fmaps_fake, fmaps_real)
            loss += t.loss_feat_match_weight * fm
            aux["loss/feature_matching"] = fm
        return loss, (aux, spectral)

    if bool(train_setting(t, "remat")):
        # Rematerialisation: wrap the step's three activation producers in
        # jax.checkpoint so XLA saves nothing across their forward/backward
        # boundaries and recomputes during the pullback. Identical math
        # (remat changes scheduling, not values — tests/test_remat.py);
        # peak activation HBM drops for ~one extra forward of FLOPs
        # (benchmarks/memory_probe.py measures the compiled reservations).
        # The generator's saved VJP is the big win: without remat its
        # residuals stay live across the entire D phase.
        gen_fwd = jax.checkpoint(gen_fwd)
        d_loss_fn = jax.checkpoint(d_loss_fn)
        g_loss_fn = jax.checkpoint(g_loss_fn)

    def g_micro(gen_params, spectral, disc_params, batch, encoder_variables):
        """Generator forward (VJP saved) + all G losses + pullback for one
        (micro)batch. Returns (loss, aux, advanced spectral, G grads)."""
        fake, gen_vjp = jax.vjp(lambda p: gen_fwd(p, batch), gen_params)
        (loss_g, (aux, spectral)), fake_grad = jax.value_and_grad(
            g_loss_fn, has_aux=True)(fake, spectral, disc_params, batch,
                                     encoder_variables)
        (grads_g,) = gen_vjp(fake_grad)
        return loss_g, aux, spectral, grads_g

    def train_step(state: GANTrainState, batch: Dict[str, jnp.ndarray],
                   encoder_variables: Any,
                   ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        real = batch[C.DataType.REAL_EMG].astype(jnp.float32)
        metrics: Dict[str, jnp.ndarray] = {}

        # ---- Generator forward, once, VJP saved for the G update. ----
        fake, gen_vjp = jax.vjp(lambda p: gen_fwd(p, batch), state.gen_params)

        # ---- Discriminator update (on detached fake). ----
        if use_adv:
            (loss_d, spectral), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.disc_params,
                                         state.disc_spectral, fake, real)
            disc_params, opt_d = optimizer.apply_gradients(
                state.disc_params, grads_d, state.opt_d)
            metrics["loss/discriminator"] = loss_d
        else:
            disc_params, spectral, opt_d = (
                state.disc_params, state.disc_spectral, state.opt_d)

        # ---- Generator losses through the *updated* discriminator. ----
        (loss_g, (aux, spectral)), fake_grad = jax.value_and_grad(
            g_loss_fn, has_aux=True)(fake, spectral, disc_params, batch,
                                     encoder_variables)
        (grads_g,) = gen_vjp(fake_grad)
        gen_params, opt_g = optimizer.apply_gradients(
            state.gen_params, grads_g, state.opt_g)

        metrics["loss/generator"] = loss_g
        metrics.update(aux)

        new_state = GANTrainState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            disc_spectral=spectral,
            opt_g=opt_g,
            opt_d=opt_d,
            gen_ema=ema_update(state.gen_ema, gen_params, state.step),
        )
        return new_state, metrics

    accum = max(1, int(train_setting(t, "grad_accum")))
    if accum == 1:
        return train_step
    if t.batch_size % accum:
        raise ValueError(
            f"train.grad_accum={accum} must divide train.batch_size="
            f"{t.batch_size}")

    def train_step_accum(state: GANTrainState, batch: Dict[str, jnp.ndarray],
                         encoder_variables: Any,
                         ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """Gradient accumulation (train.grad_accum = K): the global batch
        splits into K equal microbatches scanned sequentially, ONE dual
        AdamW update per step — activation memory scales with B/K while
        the update math equals the full-batch step.

        Equality is exact (up to f32 summation order), not approximate:
        every loss term is a mean over the batch axis, so the average of
        equal-size microbatch gradients IS the full-batch gradient; and
        spectral-norm power iteration depends only on the kernel (never
        the batch), so every microbatch advances u/v to the same values —
        the kept state matches the full-batch pass
        (tests/test_grad_accum.py asserts multi-step trajectory equality).
        The D phase re-runs the generator forward per microbatch (its VJP
        is only saved in the G phase) — the standard remat trade of
        accumulation."""
        metrics: Dict[str, jnp.ndarray] = {}
        micro = jax.tree.map(
            lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
            batch)

        # ---- D phase: average grads over microbatches, update once. ----
        if use_adv:
            def d_scan(carry, mb):
                loss_acc, grad_acc, _ = carry
                fake = gen_fwd(state.gen_params, mb)
                real = mb[C.DataType.REAL_EMG].astype(jnp.float32)
                (loss_d, spectral), grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(state.disc_params,
                                             state.disc_spectral, fake, real)
                return (loss_acc + loss_d,
                        jax.tree.map(jnp.add, grad_acc, grads),
                        spectral), None

            (loss_d_sum, grads_d_sum, spectral), _ = jax.lax.scan(
                d_scan,
                (jnp.zeros((), jnp.float32),
                 jax.tree.map(jnp.zeros_like, state.disc_params),
                 state.disc_spectral),
                micro)
            disc_params, opt_d = optimizer.apply_gradients(
                state.disc_params,
                jax.tree.map(lambda g: g / accum, grads_d_sum), state.opt_d)
            metrics["loss/discriminator"] = loss_d_sum / accum
        else:
            disc_params, spectral, opt_d = (
                state.disc_params, state.disc_spectral, state.opt_d)

        # ---- G phase through the updated D: average grads, update once.
        def g_scan(carry, mb):
            loss_acc, aux_acc, _, grad_acc = carry
            loss_g, aux, spec, grads_g = g_micro(
                state.gen_params, spectral, disc_params, mb,
                encoder_variables)
            return (loss_acc + loss_g, jax.tree.map(jnp.add, aux_acc, aux),
                    spec,
                    jax.tree.map(jnp.add, grad_acc, grads_g)), None

        # One traced microbatch seeds the aux accumulator's structure.
        aux0 = jax.eval_shape(
            lambda mb: g_micro(state.gen_params, spectral, disc_params, mb,
                               encoder_variables)[1],
            jax.tree.map(lambda x: x[0], micro))
        aux0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), aux0)
        (loss_g_sum, aux_sum, spectral, grads_g_sum), _ = jax.lax.scan(
            g_scan,
            (jnp.zeros((), jnp.float32), aux0, spectral,
             jax.tree.map(jnp.zeros_like, state.gen_params)),
            micro)
        gen_params, opt_g = optimizer.apply_gradients(
            state.gen_params,
            jax.tree.map(lambda g: g / accum, grads_g_sum), state.opt_g)

        metrics["loss/generator"] = loss_g_sum / accum
        # Loss terms are per-microbatch means -> average; counters are
        # totals -> keep the sums.
        metrics.update({
            k: (v if k.startswith("count/") else v / accum)
            for k, v in aux_sum.items()})

        new_state = GANTrainState(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            disc_spectral=spectral,
            opt_g=opt_g,
            opt_d=opt_d,
            gen_ema=ema_update(state.gen_ema, gen_params, state.step),
        )
        return new_state, metrics

    return train_step_accum


def make_eval_step(cfg: Config, models: GANModels) -> Callable:
    """Validation metrics for one batch (reference: ste_gan/train.py:311-341):
    waveform MSE, multi-TD error, speech-unit / phoneme losses, and phoneme
    counters — all device arrays, jit-able, no parameter updates.

    ``val/envelope_l1`` extends the reference set with a PHASE-INVARIANT
    waveform metric: mean L1 between 40-point rectified-average envelopes
    (the plotting definition, utils/plotting.py::get_envelope). Raw
    ``val/waveform`` MSE is phase-sensitive — the waveform loss defaults
    off, so the GAN is free to drift carrier phase while amplitude
    tracking improves, and the MSE of two equal-amplitude sinusoids with
    drifting phase RISES with no loss of signal quality. The envelope L1
    is what should (and does — benchmarks/stability_r*/) improve."""
    feature_key = cfg.model.speech_feature_type

    def eval_step(gen_params, batch, encoder_variables) -> Dict[str, jnp.ndarray]:
        from ste_gan_tpu.ops.conv import moving_average

        real = batch[C.DataType.REAL_EMG].astype(jnp.float32)
        fake = models.generator.apply(
            {"params": gen_params}, batch[feature_key],
            batch[C.DataType.SESSION_INDEX], batch[C.DataType.SPEAKING_MODE_INDEX])
        su_loss, ph_loss, counts = emg_encoder_loss(
            lambda emg: models.encoder_apply(encoder_variables, emg), fake,
            batch[C.DataType.SPEECH_UNITS], batch[C.DataType.PHONEMES])
        env = lambda x: moving_average(jnp.abs(x), 40)
        out = {
            "val/waveform": jnp.mean(jnp.square(fake - real)),
            "val/envelope_l1": jnp.mean(jnp.abs(env(fake) - env(real))),
            "val/multi_td": multi_time_domain_loss(real, fake),
            "val/speech_unit": su_loss,
            "val/phoneme": ph_loss,
        }
        out.update({f"count/{k}": v for k, v in counts.items()})
        return out

    return eval_step


def load_trained_state(run_dir, tag: str = "best"
                       ) -> Tuple[Config, GANModels, GANTrainState]:
    """Config snapshot + models + restored train state from a training run
    directory (the layout every downstream tool consumes:
    scripts/generate_emg.py, the export CLIs, serve.py).

    ``tag``: ``best`` | ``latest`` | ``checkpoint-XXXXXXXX``.
    """
    from pathlib import Path

    from ste_gan_tpu.config import load_config
    from ste_gan_tpu.train.checkpoint import CheckpointManager

    run_dir = Path(run_dir)
    cfg = load_config(config=run_dir / "config.yaml")
    models = build_models(cfg)
    template = init_state(cfg, models, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(run_dir)
    if tag == "latest":
        restored = ckpt.restore_latest(template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoints in {run_dir}")
        state, _ = restored
    else:
        state, _ = ckpt.restore(tag, template)
    return cfg, models, state
