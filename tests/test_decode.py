"""EMGDecoder: the decode direction (EMG -> units + phonemes) as a
first-class inference API, including receptive-field-exact streaming.

Exact chunked decoding is possible because the encoder's relative-position
attention is hard-windowed (offsets >= distance get a -1e8 logit), so a
frame's output depends on a bounded input span; the decoder's fixed-length
true-sample windows (shifted inward at signal edges, never zero-padded)
cover that span for every emitted frame.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ste_gan_tpu.infer import EMGDecoder, decoder_receptive_field_frames
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer

DIST = 8
LAYERS = 2


@pytest.fixture(scope="module")
def decoder():
    model = EMGEncoderTransformer(
        model_size=32, num_extra_res_blocks=3, num_transformer_layers=LAYERS,
        num_heads=4, dim_feedforward=64, dropout=0.0,
        relative_positional_distance=DIST)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 16 * 8, 8)), train=False))(jax.random.PRNGKey(0))
    return EMGDecoder(model, variables)


@pytest.fixture(scope="module")
def emg():
    rng = np.random.default_rng(0)
    return np.tanh(rng.normal(0, 0.4, (80 * 16, 8))).astype(np.float32)


def test_receptive_field_bound(decoder):
    assert decoder_receptive_field_frames(decoder.model) \
        == LAYERS * (DIST - 1) + 2


def test_streaming_equals_full_decode(decoder, emg):
    units_full, ph_full = decoder.decode(emg)
    chunks = list(decoder.decode_streaming(emg, chunk_frames=16))
    units = np.concatenate([u for u, _ in chunks])
    ph = np.concatenate([p for _, p in chunks])
    assert units.shape == units_full.shape
    assert ph.shape == ph_full.shape
    np.testing.assert_allclose(units, units_full, atol=2e-5, rtol=0)
    np.testing.assert_allclose(ph, ph_full, atol=2e-5, rtol=0)
    # One compiled shape serves every chunk: all windows are fixed-length.
    # (80 frames, chunk 16, ctx 16 -> target 48 < 80, so the streamed path
    # ran, not the short-utterance fallback.)
    assert len(chunks) == 5


def test_insufficient_context_diverges(decoder, emg):
    """With context below the dependency bound, chunk edges genuinely
    diverge from the full decode — the exactness above is load-bearing,
    not slack tolerance."""
    units_full, _ = decoder.decode(emg)
    chunks = list(decoder.decode_streaming(emg, chunk_frames=16,
                                           context_frames=1))
    units = np.concatenate([u for u, _ in chunks])
    assert np.abs(units - units_full).max() > 1e-4


def test_short_utterance_falls_back_to_exact_full_decode(decoder):
    rng = np.random.default_rng(1)
    short = np.tanh(rng.normal(0, 0.4, (20 * 16, 8))).astype(np.float32)
    units_full, ph_full = decoder.decode(short)
    chunks = list(decoder.decode_streaming(short, chunk_frames=16))
    np.testing.assert_array_equal(
        np.concatenate([u for u, _ in chunks]), units_full)
    np.testing.assert_array_equal(
        np.concatenate([p for _, p in chunks]), ph_full)


def test_decode_rejects_unaligned_length(decoder):
    with pytest.raises(ValueError, match="multiple of 16"):
        decoder.decode(np.zeros((100, 8), np.float32))
    with pytest.raises(ValueError, match="multiple of 16"):
        next(decoder.decode_streaming(np.zeros((100, 8), np.float32)))


def test_from_checkpoint(tmp_path):
    from ste_gan_tpu.config import Config
    from ste_gan_tpu.train.checkpoint import save_pytree

    cfg = Config()
    cfg.emg_encoder.params = {
        "model_size": 32, "num_extra_res_blocks": 3,
        "num_transformer_layers": 1, "dropout": 0.0,
        "relative_positional_distance": DIST,
    }
    from ste_gan_tpu.models.emg_encoder import init_emg_encoder
    model = init_emg_encoder(cfg)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 16 * 8, 8)), train=False))(jax.random.PRNGKey(2))
    save_pytree(tmp_path / "enc", variables)

    dec = EMGDecoder.from_checkpoint(cfg, tmp_path / "enc")
    rng = np.random.default_rng(2)
    emg = np.tanh(rng.normal(0, 0.4, (12 * 16, 8))).astype(np.float32)
    units, ph = dec.decode(emg)
    want_u, want_p = model.apply(variables, jnp.asarray(emg)[None],
                                 train=False)
    np.testing.assert_allclose(units, np.asarray(want_u[0]), atol=1e-6)
    assert ph.shape == (12, 48)
