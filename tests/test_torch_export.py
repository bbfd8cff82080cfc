"""Reverse interop: our trained params export to reference-layout torch
state_dicts that the ACTUAL reference modules load with strict=True and
reproduce our outputs (ste_gan_tpu/interop/torch_export.py — the inverse
of interop/torch_import.py). Train on TPU, hand the checkpoint back to the
torch ecosystem."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ste_gan_tpu import constants as C
from ste_gan_tpu.interop.torch_export import (
    discriminator_params_to_state_dict, encoder_variables_to_state_dict,
    generator_params_to_state_dict, to_torch_tensors)
from ste_gan_tpu.models.discriminator import DiscriminatorEnsemble
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS

from ref_loader import import_reference


class TestGeneratorExport:
    @pytest.mark.parametrize("feature_type,input_dim,factor", [
        (C.DataType.SPEECH_UNITS, 256, 16),
        (C.DataType.MFCCS, 25, 8),
    ])
    def test_reference_loads_and_matches(self, feature_type, input_dim,
                                         factor):
        model = EMGGeneratorGanTTS(
            speech_feature_type=feature_type, speech_input_dim=input_dim,
            num_sessions=17, num_emg_channels=8)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, input_dim)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))["params"]

        sd = to_torch_tensors(
            generator_params_to_state_dict(params, feature_type))
        ref_gen = import_reference("ste_gan.models.generator")
        netg = ref_gen.EMGGeneratorGanTTS(
            speech_feature_type=feature_type, speech_input_dim=input_dim,
            num_sessions=17, num_emg_channels=8)
        netg.load_state_dict(sd, strict=True)
        netg.eval()

        rng = np.random.default_rng(0)
        b, t = 2, 32
        feats = rng.normal(size=(b, t, input_dim)).astype(np.float32)
        sess = np.asarray([3, 11])
        mode = np.zeros(b, np.int64)
        with torch.no_grad():
            want = netg(torch.from_numpy(feats), torch.from_numpy(sess),
                        torch.from_numpy(mode)).numpy()
        got = model.apply({"params": params}, jnp.asarray(feats),
                          jnp.asarray(sess, jnp.int32),
                          jnp.asarray(mode, jnp.int32))
        assert want.shape == (b, factor * t, 8)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=2e-5)


class TestDiscriminatorExport:
    @pytest.mark.parametrize("small", [True, False])
    def test_reference_loads_and_matches(self, small):
        model = DiscriminatorEnsemble(small=small)
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 512, 8)), train=False)
        params, spectral = variables["params"], variables["spectral"]

        sd = to_torch_tensors(
            discriminator_params_to_state_dict(params, spectral))
        ref_disc = import_reference("ste_gan.models.discriminator")
        cls = ref_disc.DiscriminatorSmall if small else ref_disc.Discriminator
        netd = cls(num_emg_channels=8)
        netd.load_state_dict(sd, strict=True)
        netd.eval()  # eval: no power-iteration advance on either side

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 512, 8)).astype(np.float32)
        with torch.no_grad():
            want = netd(torch.from_numpy(x))
        got = model.apply(variables, jnp.asarray(x), train=False)
        assert len(got) == len(want)
        for fmaps_ours, fmaps_ref in zip(got, want):
            assert len(fmaps_ours) == len(fmaps_ref)
            np.testing.assert_allclose(
                np.asarray(fmaps_ours[-1]).squeeze(),
                fmaps_ref[-1].numpy().squeeze(), rtol=1e-3, atol=1e-4)


class TestEncoderExport:
    def test_reference_loads_and_matches(self):
        model = EMGEncoderTransformer()
        variables = model.init(jax.random.PRNGKey(2),
                               jnp.zeros((1, 512, 8)), train=False)

        sd = to_torch_tensors(encoder_variables_to_state_dict(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}))
        ref_enc = import_reference("ste_gan.models.emg_encoder")
        net = ref_enc.EMGEncoderTransformer(
            num_ins=8, num_outs=C.SPEECH_UNITS_FEAT_SIZE,
            num_aux_outs=C.NUM_PHONEMES)
        net.load_state_dict(sd, strict=True)
        net.eval()
        # torch>=2.1's nn.TransformerEncoder fast-path sniffing expects
        # attributes the reference's custom attention doesn't define.
        for layer in net.transformer.layers:
            layer.self_attn.batch_first = False
            layer.norm_first = False

        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 512, 8)).astype(np.float32) * 0.1
        with torch.no_grad():
            want_su, want_ph = net(torch.from_numpy(x))
        got_su, got_ph = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got_su), want_su.numpy(),
                                   rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_ph), want_ph.numpy(),
                                   rtol=1e-3, atol=2e-4)
