"""Round-trip tests for the reference-checkpoint import path: torch
state_dict (.pt) -> convert -> Orbax -> load -> our model forward matches
the reference forward."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ste_gan_tpu import constants as C
from ste_gan_tpu.infer import EMGSynthesizer
from ste_gan_tpu.models.discriminator import DiscriminatorEnsemble
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
from ste_gan_tpu.train.checkpoint import load_pytree

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from import_torch_checkpoint import import_checkpoint  # noqa: E402

from ref_loader import import_reference  # noqa: E402


def _save_sd(module, path: Path, compile_prefix: bool = False) -> Path:
    sd = module.state_dict()
    if compile_prefix:  # simulate a torch.compile'd checkpoint
        sd = {f"_orig_mod.{k}": v for k, v in sd.items()}
    torch.save(sd, path)
    return path


def test_generator_roundtrip(tmp_path):
    ref_gen = import_reference("ste_gan.models.generator")
    torch.manual_seed(1)
    netg = ref_gen.EMGGeneratorGanTTS(
        speech_feature_type=C.DataType.SPEECH_UNITS, speech_input_dim=256,
        num_sessions=17, num_emg_channels=8).eval()
    pt = _save_sd(netg, tmp_path / "netG-00025000.pt", compile_prefix=True)

    out = tmp_path / "netG_orbax"
    tree = import_checkpoint("generator", pt, out)
    # The Orbax write round-trips.
    restored = load_pytree(out, tree)

    b, t = 2, 32
    feats = np.random.default_rng(0).normal(size=(b, t, 256)).astype(np.float32)
    sess = np.array([3, 11])
    mode = np.zeros(b, np.int64)
    with torch.no_grad():
        want = netg(torch.tensor(feats), torch.tensor(sess),
                    torch.tensor(mode)).numpy()

    model = EMGGeneratorGanTTS()
    got = model.apply({"params": restored["params"]}, jnp.asarray(feats),
                      jnp.asarray(sess), jnp.asarray(mode))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)

    # Serving path: the imported tree drives the synthesizer directly.
    synth = EMGSynthesizer(model, restored["params"], bucket=32)
    emg = synth.synthesize(feats[0], int(sess[0]), 0)
    np.testing.assert_allclose(emg, want[0], rtol=2e-3, atol=2e-4)


def test_encoder_roundtrip(tmp_path):
    ref_enc = import_reference("ste_gan.models.emg_encoder")
    torch.manual_seed(2)
    enc = ref_enc.EMGEncoderTransformer(
        num_ins=8, num_outs=256, num_aux_outs=48, model_size=64,
        num_extra_res_blocks=3, dropout=0.0, num_transformer_layers=2).eval()
    for layer in enc.transformer.layers:  # torch>=2.1 fast-path sniffing
        layer.self_attn.batch_first = False
        layer.norm_first = False
    pt = _save_sd(enc, tmp_path / "best_val_loss_model.pt")

    out = tmp_path / "enc_orbax"
    tree = import_checkpoint("encoder", pt, out)
    restored = load_pytree(out, tree)

    x = np.random.default_rng(1).normal(size=(2, 512, 8)).astype(np.float32)
    with torch.no_grad():
        want_units, want_phones = enc(torch.tensor(x))

    model = EMGEncoderTransformer(model_size=64, num_extra_res_blocks=3,
                                  num_transformer_layers=2, dropout=0.0)
    got_units, got_phones = model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_units), want_units.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_phones), want_phones.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_discriminator_roundtrip(tmp_path):
    ref_disc = import_reference("ste_gan.models.discriminator")
    torch.manual_seed(3)
    netd = ref_disc.DiscriminatorSmall(num_emg_channels=8).train()
    pt = _save_sd(netd, tmp_path / "netD-00025000.pt")

    out = tmp_path / "netD_orbax"
    tree = import_checkpoint("discriminator", pt, out)
    restored = load_pytree(out, tree)

    x = np.random.default_rng(2).normal(size=(2, 512, 8)).astype(np.float32)
    with torch.no_grad():
        want = [[f.numpy() for f in fmaps]
                for fmaps in netd(torch.tensor(x))]

    model = DiscriminatorEnsemble(num_emg_channels=8, small=True)
    got, _ = model.apply(
        {"params": restored["params"], "spectral": restored["spectral"]},
        jnp.asarray(x), train=True, mutable=["spectral"])
    assert len(got) == len(want) == 8
    for got_maps, want_maps in zip(got, want):
        assert len(got_maps) == len(want_maps)
        for g, w in zip(got_maps, want_maps):
            if w.ndim == 4:  # torch [B, C, H, W] -> ours [B, H, W, C]
                w = w.transpose(0, 2, 3, 1)
            else:  # torch [B, C, T] -> ours [B, T, C]
                w = w.transpose(0, 2, 1)
            np.testing.assert_allclose(np.asarray(g), w, rtol=2e-3, atol=1e-3)
