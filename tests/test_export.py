"""StableHLO deployment exports (ste_gan_tpu/export.py).

The artifact must be (a) numerically identical to the in-framework
generator, (b) shape-polymorphic — one export serves every batch size and
utterance length, (c) self-contained — a byte-for-byte disk round trip
reloads and runs with no checkpoint/vocab machinery. The reference has no
deployment path at all (synthesis is inline in its train loop;
ste_gan/train.py:383-414)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.export import (export_generator, load_exported,
                                save_exported, speech_feature_dim)
from ste_gan_tpu.models.generator import init_emg_generator


def small_cfg(feature_type=C.DataType.SPEECH_UNITS) -> Config:
    cfg = Config()
    cfg.model.speech_feature_type = feature_type
    cfg.model.params = {"channels": 64}  # test-size generator
    return cfg


@pytest.fixture(scope="module")
def su_setup():
    cfg = small_cfg()
    gen = init_emg_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, speech_feature_dim(cfg)), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    return cfg, gen, params


def test_roundtrip_polymorphic_and_exact(su_setup, tmp_path):
    cfg, gen, params = su_setup
    exported = export_generator(gen, params, speech_feature_dim(cfg))
    path = tmp_path / "generator.jaxexport"
    n_bytes = save_exported(exported, path)
    assert path.stat().st_size == n_bytes > 0
    loaded = load_exported(path)

    rng = np.random.default_rng(0)
    # One artifact, several (batch, length) shapes — symbolic b/t.
    for b, t in [(1, 16), (3, 40), (2, 128)]:
        feats = jnp.asarray(rng.normal(size=(b, t, 256)), jnp.float32)
        sess = jnp.asarray(rng.integers(0, cfg.data.num_emg_sessions, (b,)),
                           jnp.int32)
        out = loaded.call(feats, sess)
        ref = gen.apply({"params": params}, feats, sess)
        assert out.shape == (b, C.HOPSIZE * t, cfg.data.num_emg_channels)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_mfcc_variant_exports_x8(tmp_path):
    cfg = small_cfg(C.DataType.MFCCS)
    gen = init_emg_generator(cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, C.NUM_MFCCS), jnp.float32),
        jnp.zeros((1,), jnp.int32))["params"]
    exported = export_generator(gen, params, speech_feature_dim(cfg))
    loaded = load_exported(save_bytes_roundtrip(exported, tmp_path))
    feats = jnp.ones((2, 32, C.NUM_MFCCS), jnp.float32)
    out = loaded.call(feats, jnp.zeros((2,), jnp.int32))
    assert out.shape == (2, 8 * 32, cfg.data.num_emg_channels)  # x8 upsample


def save_bytes_roundtrip(exported, tmp_path):
    path = tmp_path / "mfcc.jaxexport"
    save_exported(exported, path)
    return path


def test_artifact_needs_no_framework_state(su_setup, tmp_path):
    """Calling the loaded artifact must not touch the module or params —
    delete both references and run from the bytes alone."""
    cfg, gen, params = su_setup
    path = tmp_path / "standalone.jaxexport"
    save_exported(export_generator(gen, params, speech_feature_dim(cfg)),
                  path)
    loaded = load_exported(path)
    del gen, params
    out = loaded.call(jnp.zeros((1, 8, 256), jnp.float32),
                      jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()


def test_serving_export_padded_exactness(su_setup, tmp_path):
    """The serving signature's per-row valid masking must reproduce
    EMGSynthesizer.synthesize_padded exactly: stacked unequal-length rows,
    each exact up to upsample*valid[b] (the micro-batcher contract)."""
    from ste_gan_tpu.export import ExportedSynthesizer, generator_meta
    from ste_gan_tpu.infer import EMGSynthesizer

    cfg, gen, params = su_setup
    exported = export_generator(gen, params, speech_feature_dim(cfg),
                                serving=True)
    path = tmp_path / "generator-serving.jaxexport"
    save_exported(exported, path,
                  meta=generator_meta(gen, speech_feature_dim(cfg),
                                      serving=True))
    art = ExportedSynthesizer(path)
    ref = EMGSynthesizer(gen, params)

    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(3, 48, 256)), jnp.float32)
    sess = jnp.asarray([0, 1, 2], jnp.int32)
    mode = jnp.zeros((3,), jnp.int32)
    valid = jnp.asarray([48, 17, 33], jnp.int32)
    got = np.asarray(art.synthesize_padded(feats, sess, mode, valid))
    want = np.asarray(ref.synthesize_padded(feats, sess, mode, valid))
    up = gen.upsample_factor
    for b, v in enumerate([48, 17, 33]):
        np.testing.assert_allclose(got[b, : up * v], want[b, : up * v],
                                   atol=1e-5)
    assert art.upsample == up
    assert art.generator.speech_input_dim == 256
    assert art.generator.num_emg_channels == cfg.data.num_emg_channels


def test_minimal_artifact_refuses_serving(su_setup, tmp_path):
    from ste_gan_tpu.export import ExportedSynthesizer, generator_meta

    cfg, gen, params = su_setup
    path = tmp_path / "minimal.jaxexport"
    save_exported(export_generator(gen, params, speech_feature_dim(cfg)),
                  path, meta=generator_meta(gen, speech_feature_dim(cfg),
                                            serving=False))
    with pytest.raises(ValueError, match="serving"):
        ExportedSynthesizer(path)


def test_emg_encoder_export_polymorphic(tmp_path):
    """The silent-speech decoding direction exports too: EMG [B, 16*t, C]
    -> (units, phoneme logits), symbolic over batch and length in the
    windowed rel-pos regime (t >= 101; transformer.py max_distance)."""
    from ste_gan_tpu.export import export_emg_encoder
    from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer

    enc = EMGEncoderTransformer(model_size=64, num_transformer_layers=2,
                                num_heads=2)
    variables = jax.jit(lambda r: enc.init(
        r, jnp.zeros((1, 16 * 101, 8), jnp.float32),
        train=False))(jax.random.PRNGKey(3))
    path = tmp_path / "encoder.jaxexport"
    save_exported(export_emg_encoder(enc, variables, 8), path)
    loaded = load_exported(path)

    rng = np.random.default_rng(3)
    for b, t in [(1, 104), (2, 128)]:
        emg = jnp.asarray(rng.normal(size=(b, 16 * t, 8)) * 0.1, jnp.float32)
        su, ph = loaded.call(emg)
        su2, ph2 = enc.apply(variables, emg, train=False)
        assert su.shape == (b, t, 256) and ph.shape == (b, t, 48)
        np.testing.assert_allclose(np.asarray(su), np.asarray(su2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ph), np.asarray(ph2), atol=1e-5)
