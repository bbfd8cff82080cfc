"""Golden parity tests for the loss suite against the reference."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ste_gan_tpu.losses.encoder_loss import (
    phoneme_count_metrics, phoneme_cross_entropy, speech_unit_distance)
from ste_gan_tpu.losses.gan_loss import (
    discriminator_loss, feature_matching_loss, generator_adversarial_loss)
from ste_gan_tpu.losses.td_loss import multi_time_domain_loss, time_domain_features

from ref_loader import import_reference


def test_multi_td_loss_matches_reference():
    ref_td = import_reference("ste_gan.losses.time_domain_loss")
    torch.manual_seed(0)
    real = torch.randn(4, 2048, 8)
    fake = torch.randn(4, 2048, 8) * 0.5
    loss_mod = ref_td.MultiTimeDomainFeatureLoss(8)
    want = loss_mod(real, fake).item()
    got = multi_time_domain_loss(jnp.asarray(real.numpy().copy()),
                                 jnp.asarray(fake.numpy().copy()))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_td_features_match_reference_single_window():
    ref_td = import_reference("ste_gan.losses.time_domain_loss")
    torch.manual_seed(1)
    x = torch.randn(2, 512, 8)
    loss_mod = ref_td.TimeDomainFeatureLoss(8, win_size_samples=20,
                                            win_shift_samples=8)
    want = loss_mod.calculate_time_domain_features(x).numpy()
    got = time_domain_features(jnp.asarray(x.numpy().copy()), 20, 8)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_speech_unit_distance_matches_pairwise_distance():
    torch.manual_seed(0)
    target = torch.randn(3, 64, 256)
    pred = torch.randn(3, 64, 256)
    tflat = target.reshape(-1, 256)
    pflat = pred.reshape(-1, 256)
    want = F.pairwise_distance(tflat, pflat).mean().item()
    got = speech_unit_distance(jnp.asarray(target.numpy().copy()),
                               jnp.asarray(pred.numpy().copy()))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_phoneme_cross_entropy_matches_torch():
    torch.manual_seed(0)
    logits = torch.randn(3, 64, 48)
    targets = torch.randint(0, 48, (3, 64))
    want = F.cross_entropy(logits.permute(0, 2, 1), targets).item()
    got = phoneme_cross_entropy(jnp.asarray(logits.numpy().copy()),
                                jnp.asarray(targets.numpy().copy()))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_phoneme_count_metrics_match_reference_properties():
    ref_loss = import_reference("ste_gan.losses.emg_encoder_loss")
    torch.manual_seed(0)
    logits = torch.randn(3, 64, 48)
    targets = torch.randint(0, 48, (3, 64))
    out = ref_loss.EMGEncoderLossOutput(
        speech_unit_pred=None, phoneme_pred=logits,
        speech_unit_loss=None, phoneme_loss=None, phoneme_targets=targets)
    got = phoneme_count_metrics(jnp.asarray(logits.numpy().copy()),
                                jnp.asarray(targets.numpy().copy()))
    assert int(got["num_phones"]) == out.num_phones
    assert int(got["num_correct"]) == out.num_correct_phones
    assert int(got["num_silence"]) == out.num_silence_phones
    assert int(got["num_correct_no_silence"]) == out.num_correct_phones_no_silence


def _random_fmaps(rng, num_discs=3, num_layers=4):
    fake, real = [], []
    for _ in range(num_discs):
        shapes = [(2, 16, 8) for _ in range(num_layers)] + [(2, 16, 1)]
        fake.append([torch.randn(s) for s in shapes])
        real.append([torch.randn(s) for s in shapes])
    return fake, real


def test_gan_losses_match_reference_formulas():
    torch.manual_seed(0)
    fake, real = _random_fmaps(None)

    # Reference discriminator loss (ste_gan/train.py:192-196).
    want_d = 0.0
    for scale in fake:
        want_d += F.mse_loss(scale[-1], torch.zeros_like(scale[-1])).item()
    for scale in real:
        want_d += F.mse_loss(scale[-1], torch.ones_like(scale[-1])).item()
    # Reference generator adversarial loss (ste_gan/train.py:209-211).
    want_g = sum(F.mse_loss(s[-1], torch.ones_like(s[-1])).item() for s in fake)
    # Reference feature-matching loss (ste_gan/train.py:257-264).
    want_fm = 0.0
    for i in range(len(fake)):
        for j in range(len(fake[i]) - 1):
            want_fm += F.l1_loss(fake[i][j], real[i][j]).item()

    to_j = lambda fmaps: [[jnp.asarray(t.numpy().copy()) for t in fl] for fl in fmaps]
    fake_j, real_j = to_j(fake), to_j(real)
    np.testing.assert_allclose(float(discriminator_loss(fake_j, real_j)), want_d, rtol=1e-5)
    np.testing.assert_allclose(float(generator_adversarial_loss(fake_j)), want_g, rtol=1e-5)
    np.testing.assert_allclose(float(feature_matching_loss(fake_j, real_j)), want_fm, rtol=1e-5)
