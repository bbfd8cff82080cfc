"""Typed configuration system.

Replaces the reference's three-file OmegaConf merge
(reference: ste_gan/train_utils.py:204-235) with plain dataclasses + PyYAML:
a base training config, a data config, and an EMG-encoder config merge into a
single :class:`Config`. CLI overrides keep the reference semantics
(reference: ste_gan/train_utils.py:48-91): negative numeric / blank string
means "keep the config value", and a loss weight below 1e-3 disables that
loss term entirely.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from ste_gan_tpu import constants as C


def _asdict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


@dataclass
class ModelConfig:
    type: str = "EMGGeneratorGanTTS"
    #: DataType.SPEECH_UNITS (50 Hz x 256) or DataType.MFCCS (100 Hz x 25).
    speech_feature_type: str = C.DataType.SPEECH_UNITS
    discriminator_small: bool = True
    #: Extra kwargs forwarded to the generator constructor.
    params: Dict[str, Any] = field(default_factory=dict)
    #: Extra kwargs forwarded to the discriminator ensemble (e.g.
    #: num_multi_pool / num_multi_scale; no reference analogue).
    discriminator_params: Dict[str, Any] = field(default_factory=dict)


@dataclass
class DataConfig:
    dataset_root: str = "data/gaddy_complete"
    name: str = "gaddy_voiced"
    num_emg_sessions: int = C.NUM_EMG_SESSIONS
    num_emg_channels: int = C.NUM_EMG_CHANNELS
    requires_activation: str = "tanh"
    strict: bool = False


@dataclass
class EMGEncoderConfig:
    type: str = "EMGEncoderTransformer"
    params: Dict[str, Any] = field(default_factory=lambda: dict(
        model_size=768,
        num_extra_res_blocks=3,
        dropout=0.2,
        num_transformer_layers=6,
    ))


@dataclass
class TrainConfig:
    random_seed: int = 0
    debug: bool = False

    # Adversarial loss type: "mse" | "" (disabled).
    loss_adversarial: str = C.LOSS_ADVERSARIAL

    # bf16 compute inside the fused step (the TPU analogue of the
    # reference's fp16 AMP + GradScaler; no loss scaling is needed).
    mixed_precision: bool = True

    loss_speech_unit_error: bool = C.LOSS_SPEECH_UNIT_ERROR
    loss_speech_unit_weight: float = C.LOSS_SPEECH_UNIT_WEIGHT
    loss_phoneme_error: bool = C.LOSS_PHONEMES_ERROR
    loss_phoneme_weight: float = C.LOSS_PHONEMES_WEIGHT
    loss_multi_td_error: bool = C.LOSS_MULTI_TD_ERROR
    loss_multi_td_weight: float = C.LOSS_MULTI_TD_ERROR_WEIGHT
    loss_feat_match_error: bool = C.LOSS_FEAT_MATCH
    loss_feat_match_weight: float = C.LOSS_FEAT_MATCH_WEIGHT
    loss_waveform_error: bool = C.LOSS_WAVEFORM_ERROR
    loss_waveform_weight: float = 0.0

    batch_size: int = C.BATCH_SIZE
    chunk_size: int = C.CHUNK_SIZE
    max_steps: int = 25_000

    interval_log: int = C.INTERVAL_LOG
    interval_sample: int = C.INTERVAL_SAMPLE
    interval_save: int = 10_000
    interval_valid: int = C.INTERVAL_VALID
    interval_waveform: int = C.INTERVAL_WAVEFORM
    interval_plot: int = C.INTERVAL_PLOT
    # '-last' checkpoint cadence in epochs (reference hardcodes 5;
    # ste_gan/train.py:478-494 — configurable here because epoch length
    # varies wildly with corpus size).
    save_last_epoch_interval: int = 5
    num_test_samples: int = C.NUM_TEST_SAMPLES

    # --- TPU-native additions (no reference analogue) ---
    #: Learning rate (AdamW); reference hard-codes 2e-4.
    learning_rate: float = C.OPTIMIZER_LR
    adam_b1: float = C.OPTIMIZER_BETAS[0]
    adam_b2: float = C.OPTIMIZER_BETAS[1]
    lr_decay_gamma: float = C.LR_DECAY_GAMMA
    #: Size of the data-parallel mesh axis; <=0 means "all local devices".
    data_parallel: int = -1
    #: Size of the tensor-parallel ("model") mesh axis (1 = off). When >1
    #: the trainer builds a 2-D (data, model) mesh and places the train
    #: state under the output-channel sharding rule
    #: (parallel/tensor_parallel.py) — parameters and AdamW moments split
    #: into per-device slabs, the batch shards over 'data' only, and GSPMD
    #: partitions the unchanged fused step (trajectory-equal to 1-D mode;
    #: tests/test_tensor_parallel.py). Requires data_parallel*model_parallel
    #: devices. Useful when per-device memory, not throughput, binds.
    model_parallel: int = 1
    #: Fully-sharded data parallelism (ZeRO-3 analogue; parallel/fsdp.py).
    #: When True the persistent train state — parameters, BOTH AdamW moment
    #: trees, spectral-norm vectors — is stored sharded over the ``data``
    #: mesh axis (largest evenly-divisible dimension per leaf); the fused
    #: step all-gathers the compute trees at entry and re-scatters the
    #: updated state, so between steps per-device state memory is ~1/data
    #: of the replicated layout. Trajectory-equal to replicated DP
    #: (tests/test_fsdp.py); composes with model_parallel > 1 (hybrid
    #: FSDP x TP). Useful when model+optimizer state, not batch math,
    #: binds per-device memory.
    fsdp: bool = False
    #: Gradient accumulation (1 = off). K > 1 splits each global batch
    #: into K equal microbatches scanned sequentially with ONE dual AdamW
    #: update per step — activation memory scales with batch/K while the
    #: update math equals the full-batch step exactly (every loss term is
    #: a batch mean; spectral-norm power iteration is batch-independent;
    #: tests/test_grad_accum.py). Must divide batch_size. The D phase
    #: re-runs the generator forward per microbatch (remat trade).
    grad_accum: int = 1
    #: Exponential moving average of the generator weights (0 = off, the
    #: reference-parity default; typical 0.999). When on, the train state
    #: carries a gen_ema tree updated in-step (ema = d*ema + (1-d)*params,
    #: one fused elementwise chain — negligible cost) with a RAMPED decay
    #: d_t = min(decay, (1+t)/(10+t)) — the zero-debias equivalent that
    #: removes the constant-decay estimator's ~1/(1-decay)-step startup
    #: lag (VERDICT r4 #2) — and validation, best-model selection, plots,
    #: inference and exports consume the EMA weights
    #: (train.gan.eval_generator_params). A quality extension beyond the
    #: reference (standard GAN practice); enable it from step 0 — a
    #: checkpoint written without EMA cannot restore into an EMA template
    #: (loud structural error). The debiased A/B (benchmarks/ema_ab.json)
    #: decides the shipped-config setting.
    generator_ema: float = 0.0
    #: Rematerialisation (jax.checkpoint) of the step's three activation
    #: producers — the generator forward, the D-phase loss, and the G-phase
    #: loss (discriminator pair passes + frozen encoder). With it on, XLA
    #: saves no intermediate activations across the forward/backward
    #: boundary and recomputes them during the pullback: peak activation
    #: HBM drops (benchmarks/memory_probe.py measures the compiled
    #: programs' actual HBM reservations) for roughly one extra forward of
    #: FLOPs. Identical math — remat changes scheduling, not values
    #: (tests/test_remat.py asserts trajectory equality). Composes with
    #: grad_accum (microbatching shrinks the batch axis; remat shrinks the
    #: per-microbatch residuals).
    remat: bool = False
    #: Flat single-buffer AdamW (ops/flat_adamw.py): identical math to
    #: optax.adamw but ONE fused elementwise chain over all parameter
    #: leaves — 4.6 vs 11.4 ms per dual-net update in isolation on v5e
    #: (~230 leaves; benchmarks/opt_probe.py). Inside the fused step it
    #: measures NEUTRAL (57.9 vs 57.1 ms): XLA already fuses the per-leaf
    #: optimizer chains into the backward program, so the launch overhead
    #: the flat layout removes was never on the critical path. Default off;
    #: resume checkpoints under the same flavour they were saved.
    flat_optimizer: bool = False
    #: Use the per-leaf fused Pallas AdamW kernel instead (measured no
    #: faster than optax in-step — per-leaf launches dominate; kept for
    #: A/B). Takes precedence over flat_optimizer when set.
    fused_optimizer: bool = False
    #: Evaluate each (fake, real) discriminator pair in ONE traced ensemble
    #: pass: weight-normed sub-discriminators run on the stacked batch-2B
    #: input (bit-identical — they are stateless), and the spectral-normed
    #: scale discriminator runs fake-then-real inside the pass so its power
    #: iteration advances exactly like two reference forwards. Semantics-
    #: exact and ~10% faster (57 vs 63 ms/step on v5e), hence on by
    #: default; set False to trace each pass separately.
    fused_disc_passes: bool = True
    #: Route the scale discriminators' grouped convs through the Pallas
    #: slab block-diagonal kernel (ste_gan_tpu/ops/pallas_conv.py) instead
    #: of XLA's feature_group_count lowering. TPU-only perf knob; identical
    #: math (same conv semantics, f32 accumulation).
    pallas_grouped_conv: bool = False
    #: Grouped-conv lowering override: "xla" (feature_group_count, default),
    #: "pallas" (slab kernel), "vmap" (groups as a vmapped leading axis
    #: of dense convs), or "padded" (per-group in-channels zero-padded to
    #: full 128-lane tiles). Takes precedence over pallas_grouped_conv when
    #: set; identical math for all four. A/B perf knob.
    grouped_conv_impl: Optional[str] = None
    #: Host prefetch depth for the input pipeline.
    prefetch: int = 2
    #: Train K steps per device dispatch via lax.scan over K stacked
    #: batches (1 = off). Each dispatch through a remote-TPU tunnel pays
    #: ~fixed RPC latency; grouping K steps amortises it K-fold (same
    #: bytes transferred, K-fold fewer transfer+execute round trips).
    #: Semantics: identical step math and counter cadence; groups never
    #: span an epoch boundary (LR decay stays per-epoch-exact) nor
    #: max_steps (runs still stop at exactly max_steps); interval_*
    #: actions whose multiple falls inside a group run on the post-group
    #: state, i.e. up to K-1 steps later than single-step mode. Prefer K
    #: dividing the interval_* values and the corpus' steps-per-epoch.
    #: Measured on the chip: ~207 -> ~140 ms/step end-to-end at K=10
    #: (1.5x; PARITY.md). Under bf16 the scan schedule makes trajectories
    #: statistically equivalent, not bit-identical, over long horizons.
    steps_per_dispatch: int = 1
    #: Wire format for float training-batch features on the host->device
    #: path ("float16" | "float32"). f16 halves transfer bytes — measured
    #: 143 -> 70 ms/step end-to-end through the remote-TPU tunnel
    #: (benchmarks/input_pipeline_probe.py) — and matches the data
    #: precision the reference's fp16 AMP already computes with; all losses
    #: upcast to f32 on device. Validation batches stay f32 (metric
    #: fidelity). Set "float32" for bit-exact input parity runs.
    transfer_dtype: str = "float16"
    #: Device-resident training corpus (data/device_corpus.py): upload the
    #: whole padded train split to HBM once at startup, then per step ship
    #: only [B] int32 crop descriptors (rows + starts) and gather the
    #: static-shape crops INSIDE the jitted step. Removes the per-step
    #: ~10 MB H2D transfer entirely — the end-to-end bottleneck AND the
    #: host-RSS leak source through the remote-TPU tunnel (see
    #: host_rss_restart_gb). Crop/shuffle semantics are example-identical
    #: to the host pipeline (IndexLoader reuses the loader's seeded state);
    #: float data is stored at transfer_dtype, so trajectories match the
    #: host pipeline at equal transfer_dtype. Requires the train split to
    #: fit in HBM (a few GB for the full Gaddy & Klein voiced subset).
    device_resident_data: bool = False
    #: Host-RSS watchdog (GiB; <=0 disables). Some PJRT transports retain a
    #: host copy of every H2D transfer for the life of the process (the
    #: remote-TPU tunnel client in this image leaks ~the full batch per
    #: step — measured 4 MB per 4 MB device_put, unreclaimable by
    #: jax.clear_caches). When process RSS exceeds this threshold the
    #: trainer saves a blocking resumable checkpoint and exec-restarts
    #: itself with --continue_run; the persistent compile cache makes the
    #: restart cost ~a restore + cache-hit compile, and training continues
    #: from the exact step. A long-horizon run survives infra-level host
    #: leaks instead of OOMing at an unbounded step count.
    host_rss_restart_gb: float = 48.0


#: The TrainConfig dataclass defaults, by field name — the single source of
#: truth that ``train_setting`` falls back to.
_TRAIN_DEFAULTS: Dict[str, Any] = {
    f.name: (f.default_factory() if f.default is dataclasses.MISSING
             else f.default)
    for f in dataclasses.fields(TrainConfig)
}


def train_setting(train_cfg: Any, name: str) -> Any:
    """Read a train-config field, falling back to the ``TrainConfig``
    dataclass default when the object lacks it.

    Step builders accept duck-typed train configs (legacy snapshots
    restored from old runs, test fakes): a plain ``getattr(t, name,
    literal)`` read would put a SECOND copy of the default at every call
    site, free to drift from the dataclass — ``fused_disc_passes`` did
    exactly that in round 4 (``config.py`` said True, ``train/gan.py``
    said False, silently flipping the discriminator pairing path for any
    field-stripped config). Unknown names raise instead of guessing.
    """
    return getattr(train_cfg, name, _TRAIN_DEFAULTS[name])


@dataclass
class Config:
    model_base_dir: str = "exp/ste-gan"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    emg_encoder: EMGEncoderConfig = field(default_factory=EMGEncoderConfig)

    def to_dict(self) -> Dict[str, Any]:
        return _asdict(self)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def save(self, path: Path) -> None:
        Path(path).write_text(self.to_yaml())

    @property
    def speech_input_dim(self) -> int:
        if self.model.speech_feature_type == C.DataType.SPEECH_UNITS:
            return C.SPEECH_UNITS_FEAT_SIZE
        if self.model.speech_feature_type == C.DataType.MFCCS:
            return C.NUM_MFCCS
        raise ValueError(
            f"Unrecognized speech feature type: {self.model.speech_feature_type}")


def _update_dataclass(dc, data: Dict[str, Any]):
    """Recursively overlay a dict onto a dataclass instance (unknown keys kept
    only for dict-typed fields; unknown scalar keys raise)."""
    names = {f.name for f in dataclasses.fields(dc)}
    for key, value in (data or {}).items():
        if key not in names:
            raise KeyError(f"Unknown config key '{key}' for {type(dc).__name__}")
        current = getattr(dc, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _update_dataclass(current, value)
        else:
            setattr(dc, key, value)
    return dc


def config_from_dict(data: Dict[str, Any]) -> Config:
    cfg = Config()
    _update_dataclass(cfg, data)
    return cfg


def load_yaml(path) -> Dict[str, Any]:
    with open(path) as fp:
        return yaml.safe_load(fp) or {}


def load_config(
    config: Optional[str] = None,
    data: Optional[str] = None,
    emg_enc_cfg: Optional[str] = None,
    args: Optional[argparse.Namespace] = None,
    override_with_eval_args: bool = True,
) -> Config:
    """Three-file YAML merge + optional CLI overrides.

    Mirrors reference load_config (ste_gan/train_utils.py:204-235): the base
    config supplies ``model``/``train``/``model_base_dir``, the data config
    becomes ``data``, and the encoder config becomes ``emg_encoder``.
    """
    if args is not None:
        config = config or getattr(args, "config", None)
        data = data or getattr(args, "data", None)
        emg_enc_cfg = emg_enc_cfg or getattr(args, "emg_enc_cfg", None)

    merged: Dict[str, Any] = {}
    if config:
        merged.update(load_yaml(config))
    if data:
        merged["data"] = load_yaml(data)
    if emg_enc_cfg:
        merged["emg_encoder"] = load_yaml(emg_enc_cfg)

    cfg = config_from_dict(merged)
    if args is not None and override_with_eval_args:
        apply_cli_overrides(cfg, args)
    return cfg


def apply_cli_overrides(cfg: Config, args: argparse.Namespace) -> Config:
    """Apply CLI overrides with reference semantics
    (reference: ste_gan/train_utils.py:48-91)."""
    t = cfg.train

    def _maybe(name, attr, pred):
        val = getattr(args, name, None)
        if val is not None and pred(val):
            setattr(t, attr, val)

    _maybe("weight_su", "loss_speech_unit_weight", lambda v: v >= 0.0)
    _maybe("weight_phoneme", "loss_phoneme_weight", lambda v: v >= 0.0)
    _maybe("weight_td", "loss_multi_td_weight", lambda v: v >= 0.0)
    _maybe("weight_feat_match", "loss_feat_match_weight", lambda v: v >= 0.0)
    _maybe("chunk_size", "chunk_size", lambda v: v > 0)
    _maybe("batch_size", "batch_size", lambda v: v > 0)
    _maybe("max_steps", "max_steps", lambda v: v > 0)
    _maybe("model_parallel", "model_parallel", lambda v: v > 0)
    _maybe("grad_accum", "grad_accum", lambda v: v > 0)
    remat = getattr(args, "remat", None)
    if remat is not None and remat >= 0:
        t.remat = bool(remat)
    fsdp = getattr(args, "fsdp", None)
    if fsdp is not None and fsdp >= 0:
        t.fsdp = bool(fsdp)

    sft = getattr(args, "speech_feature_type", "") or ""
    if sft.strip():
        cfg.model.speech_feature_type = sft.strip()

    # A weight below 1e-3 disables the corresponding loss term.
    if t.loss_speech_unit_weight < 0.001:
        t.loss_speech_unit_error = False
    if t.loss_phoneme_weight < 0.001:
        t.loss_phoneme_error = False
    return cfg


def add_eval_hyperparams_to_parser(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """CLI flags mirroring the reference's override surface
    (reference: ste_gan/train_utils.py:140-190)."""
    parser.add_argument("--weight_su", type=float, default=-1.0,
                        help="Speech-unit loss weight (<0 keeps config value).")
    parser.add_argument("--weight_phoneme", type=float, default=-1.0,
                        help="Phoneme loss weight (<0 keeps config value).")
    parser.add_argument("--weight_td", type=float, default=-1.0,
                        help="Multi-time-domain loss weight (<0 keeps config value).")
    parser.add_argument("--weight_feat_match", type=float, default=-1.0,
                        help="Feature-matching loss weight (<0 keeps config value).")
    parser.add_argument("--speech_feature_type", type=str, default="",
                        help="Generator input feature DataType (blank keeps config).")
    parser.add_argument("--chunk_size", type=int, default=-1,
                        help="EMG samples per training chunk (<0 keeps config value).")
    parser.add_argument("--batch_size", type=int, default=-1,
                        help="Global batch size (<0 keeps config value).")
    parser.add_argument("--max_steps", type=int, default=-1,
                        help="Maximum training steps (<0 keeps config value).")
    parser.add_argument("--model_parallel", type=int, default=-1,
                        help="Tensor-parallel mesh axis size; >1 shards the "
                             "train state over a 2-D (data, model) mesh "
                             "(<=0 keeps config value; TPU-native extension).")
    parser.add_argument("--grad_accum", type=int, default=-1,
                        help="Split each batch into K sequential "
                             "microbatches with one optimizer update — "
                             "trades compute for activation memory, math "
                             "identical to the full batch (<=0 keeps the "
                             "config value; TPU-native extension).")
    parser.add_argument("--remat", type=int, default=-1,
                        help="1 = rematerialise activations (jax.checkpoint "
                             "around the generator forward and both loss "
                             "phases): peak activation HBM drops for ~one "
                             "extra forward of FLOPs, identical math (<0 "
                             "keeps the config value; TPU-native "
                             "extension).")
    parser.add_argument("--fsdp", type=int, default=-1,
                        help="1 = store the train state fully sharded over "
                             "the data axis (ZeRO-3 analogue, "
                             "parallel/fsdp.py); 0 = replicated; <0 keeps "
                             "the config value (TPU-native extension).")
    return parser


def create_ste_gan_model_name(cfg: Config, add_timestamp: bool = True,
                              debug: bool = False, note: str = "") -> str:
    """Hyperparameter-encoding run-directory name
    (reference: ste_gan/train_utils.py:107-137)."""
    import time as _time

    if note:
        note += "_"
    t = cfg.train
    use_adv_str = "with_adv_loss" if t.loss_adversarial else "no_adv_loss"
    debug_str = "DEBUG_" if debug else ""
    timestamp_str = "" if (debug or not add_timestamp) else _time.strftime("%Y%m%d-%H%M%S") + "_"
    small_dis = "small_dis" if cfg.model.discriminator_small else "full_dis"
    return (
        f"{note}{debug_str}{timestamp_str}{cfg.data.name}_{cfg.model.type}_"
        f"{cfg.model.speech_feature_type}_{small_dis}_chunk_{t.chunk_size}_"
        f"{use_adv_str}_fmw_{t.loss_feat_match_weight}_tdw_{t.loss_multi_td_weight}_"
        f"suw_{t.loss_speech_unit_weight}_phw_{t.loss_phoneme_weight}_"
        f"wv_{t.loss_waveform_weight}"
    )


def save_json(obj: Any, path: Path) -> None:
    Path(path).write_text(json.dumps(obj, indent=2))
