"""End-to-end train-step parity: two optimization steps of our fused jit
step vs the reference's actual training logic (reference modules + torch
AdamW), starting from identical parameters and data.

This pins down not just the forward losses but the gradients, the dual-AdamW
updates, the D-before-G ordering, and the updated-D G-loss pass. Step 2's
losses only match if step 1's parameter updates matched.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.train.gan import GANModels, init_state, make_train_step
from ste_gan_tpu.models.discriminator import DiscriminatorEnsemble
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS

import param_convert as pc
from ref_loader import import_reference

B, CHUNK, FRAMES = 2, 512, 32


@pytest.fixture(scope="module")
def ref_setup():
    ref_gen = import_reference("ste_gan.models.generator")
    ref_disc = import_reference("ste_gan.models.discriminator")
    ref_enc = import_reference("ste_gan.models.emg_encoder")
    ref_td = import_reference("ste_gan.losses.time_domain_loss")
    ref_enc_loss = import_reference("ste_gan.losses.emg_encoder_loss")

    torch.manual_seed(0)
    netG = ref_gen.EMGGeneratorGanTTS(
        speech_feature_type=C.DataType.SPEECH_UNITS, speech_input_dim=256,
        num_sessions=4, num_emg_channels=8)
    netD = ref_disc.DiscriminatorSmall(num_emg_channels=8)
    encoder = ref_enc.EMGEncoderTransformer(
        num_ins=8, num_outs=256, num_aux_outs=48, model_size=64,
        num_extra_res_blocks=3, num_transformer_layers=1, dropout=0.0)
    for layer in encoder.transformer.layers:
        layer.self_attn.batch_first = False
        layer.norm_first = False
    encoder.eval()
    return netG, netD, encoder, ref_td, ref_enc_loss


def reference_two_steps(netG, netD, encoder, ref_td, ref_enc_loss, data):
    """The reference hot loop (ste_gan/train.py:165-268), two iterations."""
    multi_td = ref_td.MultiTimeDomainFeatureLoss(8)
    enc_loss = ref_enc_loss.EMGEncoderLoss(encoder)
    optG = torch.optim.AdamW(netG.parameters(), lr=2e-4, betas=(.8, .99))
    optD = torch.optim.AdamW(netD.parameters(), lr=2e-4, betas=(.8, .99))
    x_t, s_t, sess, mode, phonemes = data

    history = []
    for _ in range(2):
        netD.zero_grad()
        netG.zero_grad()
        x_pred = netG(s_t, sess, mode)
        d_fake = netD(x_pred.detach())
        d_real = netD(x_t)
        loss_d = sum(F.mse_loss(s[-1], torch.zeros_like(s[-1])) for s in d_fake)
        loss_d = loss_d + sum(F.mse_loss(s[-1], torch.ones_like(s[-1]))
                              for s in d_real)
        loss_d.backward()
        optD.step()

        d_fake = netD(x_pred)
        d_real = netD(x_t)
        loss_g = sum(F.mse_loss(s[-1], torch.ones_like(s[-1])) for s in d_fake)
        td = multi_td(x_t, x_pred)
        loss_g = loss_g + 15.0 * td
        out = enc_loss(x_pred, s_t, phonemes)
        loss_g = loss_g + out.speech_unit_loss + out.phoneme_loss
        fm = sum(F.l1_loss(d_fake[i][j], d_real[i][j].detach())
                 for i in range(len(d_fake)) for j in range(len(d_fake[i]) - 1))
        loss_g = loss_g + 7.0 * fm
        loss_g.backward()
        optG.step()
        history.append({
            "loss_d": float(loss_d), "loss_g": float(loss_g),
            "td": float(td), "su": float(out.speech_unit_loss),
            "ph": float(out.phoneme_loss), "fm": float(fm),
        })
    return history


def test_two_fused_steps_match_reference(ref_setup, rng):
    netG, netD, encoder, ref_td, ref_enc_loss = ref_setup

    x_t = torch.tensor(np.tanh(rng.normal(0, 0.4, (B, CHUNK, 8))).astype(np.float32))
    s_t = torch.tensor(rng.normal(size=(B, FRAMES, 256)).astype(np.float32))
    sess = torch.tensor(rng.integers(0, 4, B))
    mode = torch.zeros(B, dtype=torch.long)
    phonemes = torch.tensor(rng.integers(0, 48, (B, FRAMES)))

    # --- our side: convert parameters BEFORE the torch run mutates them ---
    gen_params = pc.convert_generator(netG)
    disc_params, disc_spectral = pc.convert_discriminator(netD)
    enc_vars = pc.convert_emg_encoder(encoder)

    cfg = Config()
    cfg.train.chunk_size = CHUNK
    cfg.train.batch_size = B
    cfg.train.mixed_precision = False
    cfg.data.num_emg_sessions = 4

    models = GANModels(
        generator=EMGGeneratorGanTTS(num_sessions=4),
        discriminator=DiscriminatorEnsemble(small=True),
        encoder=EMGEncoderTransformer(
            model_size=64, num_extra_res_blocks=3, num_transformer_layers=1,
            num_heads=8, dim_feedforward=3072, dropout=0.0),
    )
    state = init_state(cfg, models, jax.random.PRNGKey(0))
    state = state.replace(gen_params=gen_params, disc_params=disc_params,
                          disc_spectral=disc_spectral)
    # Optimizer moments re-init for the converted trees.
    from ste_gan_tpu.train.gan import make_optimizer
    opt = make_optimizer(cfg)
    state = state.replace(opt_g=opt.init(gen_params), opt_d=opt.init(disc_params))

    batch = {
        C.DataType.REAL_EMG: jnp.asarray(x_t.numpy().copy()),
        C.DataType.SPEECH_UNITS: jnp.asarray(s_t.numpy().copy()),
        C.DataType.PHONEMES: jnp.asarray(phonemes.numpy().copy().astype(np.int32)),
        C.DataType.SESSION_INDEX: jnp.asarray(sess.numpy().copy().astype(np.int32)),
        C.DataType.SPEAKING_MODE_INDEX: jnp.zeros((B,), jnp.int32),
    }
    step = jax.jit(make_train_step(cfg, models))
    ours = []
    for _ in range(2):
        state, metrics = step(state, batch, enc_vars)
        ours.append({k: float(v) for k, v in metrics.items()})

    # --- reference side ---
    want = reference_two_steps(netG, netD, encoder, ref_td, ref_enc_loss,
                               (x_t, s_t, sess, mode, phonemes))

    for step_idx in range(2):
        w, o = want[step_idx], ours[step_idx]
        np.testing.assert_allclose(o["loss/discriminator"], w["loss_d"],
                                   rtol=2e-3, err_msg=f"step {step_idx} D")
        np.testing.assert_allclose(o["loss/multi_td"], w["td"],
                                   rtol=2e-3, err_msg=f"step {step_idx} TD")
        np.testing.assert_allclose(o["loss/speech_unit"], w["su"],
                                   rtol=2e-3, err_msg=f"step {step_idx} SU")
        np.testing.assert_allclose(o["loss/phoneme"], w["ph"],
                                   rtol=2e-3, err_msg=f"step {step_idx} PH")
        np.testing.assert_allclose(o["loss/feature_matching"], w["fm"],
                                   rtol=5e-3, err_msg=f"step {step_idx} FM")
        np.testing.assert_allclose(o["loss/generator"], w["loss_g"],
                                   rtol=2e-3, err_msg=f"step {step_idx} G")
