"""Multi-period + multi-scale discriminator ensemble (HiFi-GAN / CarGAN
style) over 8-channel EMG.

Parity with the reference (ste_gan/models/discriminator.py): five period
discriminators (prime periods 2/3/5/7/11) fold time into a 2-D view and apply
(k, 1) convs; three scale discriminators apply grouped 1-D convs with average
pooling between scales; the first scale discriminator is spectrally
normalised, everything else weight-normalised. "Small" variants (the config
default) shrink the layer stacks. Every sub-discriminator returns its list of
post-activation feature maps with the raw logits map appended last — the
ensemble output is a list of such lists, reused for the feature-matching
loss.

TPU-native design: channel-last layouts ([B, T, C] / [B, T//p, p, C]); the
period fold is a single reshape; all eight sub-discriminators trace into one
fused XLA program, so the whole ensemble runs as one kernel launch per train
step. ``train`` toggles the spectral-norm power-iteration update.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import train_setting
from ste_gan_tpu.ops.conv import SNConv, WNConv, avg_pool1d, reflect_pad_time

LEAKY_SLOPE = 0.1


def _normed_conv(norm: str, features, kernel_size, **kw):
    if norm == "weight_norm":
        return WNConv(features, kernel_size, **kw)
    if norm == "spectral_norm":
        return SNConv(features, kernel_size, **kw)
    raise ValueError(f"unknown norm: {norm}")


def _apply(layer, x, train: bool, dual_batch=None):
    if isinstance(layer, SNConv):
        return layer(x, update_stats=train, dual_batch=dual_batch)
    return layer(x)


class _FmapDiscriminator(nn.Module):
    """Shared conv-stack runner: LeakyReLU(0.1) after every layer, feature
    maps collected post-activation, raw output conv appended last
    (reference: ste_gan/models/discriminator.py:38-43,61-67)."""

    def run_layers(self, layers, output_layer, x, train: bool,
                   dual_batch=None) -> List[jnp.ndarray]:
        fmaps = []
        for layer in layers:
            x = nn.leaky_relu(_apply(layer, x, train, dual_batch), LEAKY_SLOPE)
            fmaps.append(x)
        fmaps.append(_apply(output_layer, x, train, dual_batch))
        return fmaps


class PeriodDiscriminator(_FmapDiscriminator):
    """Folds [B, T, C] into [B, T//p, p, C] and applies (k, 1) 2-D convs.

    ``layer_spec`` rows: (features, kernel_h, stride_h, pad_h).
    Full variant: 5 layers 32->1024 k(5,1) s(3,1) (reference :19-43);
    small variant: 3 layers 32->512 k(3,1) (reference :70-93).
    """

    period: int = 2
    norm: str = "weight_norm"
    layer_spec: Sequence = ((32, 5, 3, 2), (128, 5, 3, 2), (512, 5, 3, 2),
                            (1024, 5, 3, 2), (1024, 5, 1, 2))
    output_pad: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> List[jnp.ndarray]:
        p = self.period
        # Reflect-pad the tail up to the next multiple of the period. The
        # reference always pads by `p - T % p` (a full extra period when T is
        # already divisible; reference :36) — replicated for parity.
        pad = p - (x.shape[1] % p)
        x = reflect_pad_time(x, (0, pad))
        b, t, c = x.shape
        x = x.reshape(b, t // p, p, c)

        layers = [
            _normed_conv(self.norm, feats, (k, 1), strides=(s, 1),
                         padding=((pad_h, pad_h), (0, 0)), dtype=self.dtype,
                         name=f"layer_{i}")
            for i, (feats, k, s, pad_h) in enumerate(self.layer_spec)
        ]
        output = _normed_conv("weight_norm", 1, (3, 1),
                              padding=((self.output_pad, self.output_pad), (0, 0)),
                              dtype=self.dtype, name="output")
        return self.run_layers(layers, output, x, train)


class ScaleDiscriminator(_FmapDiscriminator):
    """Grouped 1-D conv stack over raw EMG.

    ``layer_spec`` rows: (features, kernel, stride, groups, pad).
    Full variant: 7 layers k15/41/5 (reference :96-119);
    small variant: 4 layers k15/37/5 (reference :47-67).
    """

    norm: str = "weight_norm"
    layer_spec: Sequence = ((128, 15, 1, 1, 7), (128, 41, 2, 4, 20),
                            (256, 41, 2, 16, 20), (512, 41, 4, 16, 20),
                            (1024, 41, 4, 16, 20), (1024, 41, 1, 16, 20),
                            (1024, 5, 1, 1, 2))
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True,
                 dual_batch=None) -> List[jnp.ndarray]:
        layers = [
            _normed_conv(self.norm, feats, (k,), strides=s, groups=g, padding=pad,
                         dtype=self.dtype, conv_impl=self.conv_impl,
                         name=f"layer_{i}")
            for i, (feats, k, s, g, pad) in enumerate(self.layer_spec)
        ]
        output = _normed_conv("weight_norm", 1, (3,), padding=1,
                              dtype=self.dtype, name="output")
        return self.run_layers(layers, output, x, train, dual_batch)


SMALL_PERIOD_SPEC = ((32, 3, 1, 2), (256, 3, 3, 2), (512, 3, 3, 2))
SMALL_SCALE_SPEC = ((128, 15, 1, 1, 7), (256, 37, 2, 4, 18),
                    (512, 37, 2, 16, 18), (1024, 5, 1, 1, 2))

FULL_PERIOD_SPEC = PeriodDiscriminator.layer_spec
FULL_SCALE_SPEC = ScaleDiscriminator.layer_spec

PRIME_PERIODS = (2, 3, 5, 7, 11)


class DiscriminatorEnsemble(nn.Module):
    """5 period + 3 scale discriminators; AvgPool1d(4, 2, 1) between scales;
    first scale discriminator spectrally normalised
    (reference: ste_gan/models/discriminator.py:122-191).

    Returns a list (one entry per sub-discriminator) of feature-map lists,
    each ending with the logits map.
    """

    num_emg_channels: int = C.NUM_EMG_CHANNELS
    small: bool = True
    num_multi_pool: int = 5
    num_multi_scale: int = 3
    dtype: Any = jnp.float32
    #: Optional layer-spec overrides (tiny configs for tests / ablations).
    period_spec_override: Any = None
    scale_spec_override: Any = None
    #: "pallas" routes the scale discriminators' grouped convs through the
    #: slab block-diagonal MXU kernel (ste_gan_tpu/ops/pallas_conv.py).
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True, pair=None):
        """Single input: returns the list of fmap lists (reference
        semantics).

        ``pair``: evaluate the ensemble on ``(x, pair)`` — e.g. (fake,
        real) — in ONE traced pass, returning ``(results_x, results_pair)``.
        Stateless (weight-normed) sub-discriminators run on the
        concatenated batch (bit-identical to two separate calls); the
        spectrally-normalised first scale discriminator uses dual-sigma
        SNConvs — one stacked conv whose power iteration advances twice,
        scaling the halves by their respective sigmas — exactly like two
        reference forwards (torch spectral_norm iterates once per forward;
        ste_gan/train.py:189-207). The pair mode is therefore
        semantics-exact, not an approximation.
        """
        x = x.astype(self.dtype)
        period_spec = self.period_spec_override or (
            SMALL_PERIOD_SPEC if self.small else FULL_PERIOD_SPEC)
        scale_spec = self.scale_spec_override or (
            SMALL_SCALE_SPEC if self.small else FULL_SCALE_SPEC)
        paired = pair is not None
        if paired:
            pair = pair.astype(self.dtype)
            b = x.shape[0]
            xin = jnp.concatenate([x, pair], axis=0)
        else:
            xin = x

        results, results_pair = [], []

        def emit(fmaps_concat):
            if paired:
                results.append([fm[:b] for fm in fmaps_concat])
                results_pair.append([fm[b:] for fm in fmaps_concat])
            else:
                results.append(fmaps_concat)

        for i in range(self.num_multi_pool):
            disc = PeriodDiscriminator(
                period=PRIME_PERIODS[i], layer_spec=period_spec,
                dtype=self.dtype, name=f"period_{PRIME_PERIODS[i]}")
            emit(disc(xin, train))

        for i in range(self.num_multi_scale):
            disc = ScaleDiscriminator(
                norm="spectral_norm" if i == 0 else "weight_norm",
                layer_spec=scale_spec, dtype=self.dtype,
                conv_impl=self.conv_impl, name=f"scale_{i}")
            if paired and i == 0 and train:
                # Dual-sigma SNConv: one stacked conv, power iteration
                # advances twice, halves scaled by their own sigma — exactly
                # two sequential reference forwards (see SNConv.__call__).
                emit(disc(xin, train, dual_batch=b))
            else:
                emit(disc(xin, train))
            xin = avg_pool1d(xin, window=4, stride=2, padding=1)
        if paired:
            return results, results_pair
        return results


def init_emg_discriminators(cfg, dtype=jnp.float32) -> DiscriminatorEnsemble:
    """Factory from config (reference init_emg_discriminators;
    ste_gan/models/discriminator.py:194-203)."""
    return DiscriminatorEnsemble(
        num_emg_channels=cfg.data.num_emg_channels,
        small=bool(cfg.model.discriminator_small),
        dtype=dtype,
        conv_impl=(train_setting(cfg.train, "grouped_conv_impl")
                   or ("pallas"
                       if train_setting(cfg.train, "pallas_grouped_conv")
                       # Gradient accumulation reshapes microbatches onto
                       # part of the data mesh — the sharding where XLA's
                       # native grouped kernel-grad miscompiles (exactly
                       # 2x; ops/conv.py::_grouped_conv1d_safe_grad), so
                       # accumulating configs take the safe formulation.
                       else ("safe_grad"
                             if int(train_setting(cfg.train, "grad_accum")) > 1
                             else "xla"))),
        **(getattr(cfg.model, "discriminator_params", None) or {}),
    )
