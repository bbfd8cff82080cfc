"""Weight-only int8 quantization: roundtrip bounds, output fidelity,
artifact-size reduction, serving-path compatibility. (Beyond-reference
deployment machinery — the reference ships no inference artifact at all,
SURVEY §1.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.export import export_generator
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
from ste_gan_tpu.quant import (dequantize_generator_params,
                               dequantize_tensor,
                               export_generator_quantized,
                               quantize_generator_params, quantize_tensor,
                               quantized_param_bytes)


@pytest.fixture(scope="module")
def small_gen():
    gen = EMGGeneratorGanTTS(num_sessions=4, channels=32)
    feats = jnp.zeros((1, 8, 256))
    ids = jnp.zeros((1,), jnp.int32)
    params = gen.init(jax.random.PRNGKey(0), feats, ids, ids)["params"]
    return gen, params


class TestQuantizeTensor:
    def test_roundtrip_error_bound(self, rng):
        """Symmetric per-channel int8: |w - dequant| <= scale/2 =
        max|w|/254 per channel."""
        w = jnp.asarray(rng.normal(size=(5, 16, 24)), jnp.float32)
        q, scale = quantize_tensor(w, channel_axis=2)
        assert q.dtype == jnp.int8 and int(jnp.max(jnp.abs(q))) <= 127
        err = jnp.abs(dequantize_tensor(q, scale) - w)
        bound = jnp.max(jnp.abs(w), axis=(0, 1), keepdims=True) / 254.0
        assert bool(jnp.all(err <= bound + 1e-7))

    def test_zero_channel_safe(self):
        w = jnp.zeros((3, 4, 2), jnp.float32)
        q, scale = quantize_tensor(w, channel_axis=2)
        np.testing.assert_array_equal(np.asarray(q), 0)
        assert bool(jnp.all(jnp.isfinite(scale)))


class TestGeneratorQuantization:
    def test_roundtrip_structure_and_norm_fold(self, small_gen):
        """Dequantised tree has the original structure, and WNConv's
        recomputed kernel equals the dequantised effective kernel exactly
        (g = ||v|| makes the reparameterisation the identity)."""
        gen, params = small_gen
        dq = dequantize_generator_params(quantize_generator_params(params))
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(dq))
        # Effective kernels differ only by quantisation noise.
        from ste_gan_tpu.ops.conv import _norm_per_out_channel

        def eff(tree):
            out = {}
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                out[jax.tree_util.keystr(path)] = leaf
            return out

        flat_p, flat_dq = eff(params), eff(dq)
        for key, v in flat_p.items():
            if not key.endswith("['v']"):
                continue
            g = flat_p[key[: -len("['v']")] + "['g']"]
            w = v * (g / _norm_per_out_channel(v))
            v2 = flat_dq[key]
            g2 = flat_dq[key[: -len("['v']")] + "['g']"]
            w2 = v2 * (g2 / _norm_per_out_channel(v2))
            rel = float(jnp.max(jnp.abs(w2 - w)) / jnp.max(jnp.abs(w)))
            assert rel < 1.0 / 127

    def test_output_fidelity(self, small_gen, rng):
        gen, params = small_gen
        dq = dequantize_generator_params(quantize_generator_params(params))
        feats = jnp.asarray(rng.normal(size=(2, 24, 256)), jnp.float32)
        sess = jnp.asarray([0, 1], jnp.int32)
        mode = jnp.zeros((2,), jnp.int32)
        y = gen.apply({"params": params}, feats, sess, mode)
        yq = gen.apply({"params": dq}, feats, sess, mode)
        dev = float(jnp.max(jnp.abs(y - yq)))
        assert 0 < dev < 5e-3  # tanh-bounded outputs; quantisation is real

    def test_param_bytes_shrink(self, small_gen):
        gen, params = small_gen
        q = quantize_generator_params(params)
        assert quantized_param_bytes(q) < 0.3 * quantized_param_bytes(params)


class TestQuantizedExport:
    def test_artifact_smaller_and_exact_vs_dequant(self, small_gen, rng):
        """The int8 artifact stores int8 constants (< 0.4x the f32
        serialization) and reproduces the dequantised-weights framework
        output exactly."""
        gen, params = small_gen
        e_f32 = export_generator(gen, params, 256)
        e_q = export_generator_quantized(gen, params, 256)
        # Nearly all of the weight-byte savings must reach the serialized
        # artifact (the fixed StableHLO program text is size-invariant, so
        # a pure ratio would be fixture-size-dependent).
        saved = (quantized_param_bytes(params)
                 - quantized_param_bytes(quantize_generator_params(params)))
        assert (len(e_f32.serialize()) - len(e_q.serialize())
                > 0.85 * saved)
        feats = jnp.asarray(rng.normal(size=(1, 16, 256)), jnp.float32)
        sess = jnp.zeros((1,), jnp.int32)
        dq = dequantize_generator_params(quantize_generator_params(params))
        want = gen.apply({"params": dq}, feats, sess)
        got = e_q.call(feats, sess)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_quantized_serving_artifact_via_exported_synthesizer(
            self, small_gen, rng, tmp_path):
        """The serving-signature int8 artifact drops into the same
        ExportedSynthesizer / serve --artifact path as the f32 one."""
        from ste_gan_tpu.export import (ExportedSynthesizer, generator_meta,
                                        save_exported)

        gen, params = small_gen
        e_q = export_generator_quantized(gen, params, 256, serving=True)
        path = tmp_path / "gen-int8-serving.jaxexport"
        meta = generator_meta(gen, 256, serving=True)
        meta["quantize"] = "int8"
        save_exported(e_q, path, meta=meta)
        synth = ExportedSynthesizer(path)
        feats = rng.normal(size=(2, 20, 256)).astype(np.float32)
        out = synth.synthesize_padded(
            jnp.asarray(feats), jnp.zeros((2,), jnp.int32),
            jnp.zeros((2,), jnp.int32), jnp.asarray([20, 13], jnp.int32))
        assert np.asarray(out).shape == (2, 20 * 16, 8)
        dq = dequantize_generator_params(quantize_generator_params(params))
        want = gen.apply({"params": dq}, jnp.asarray(feats),
                         jnp.zeros((2,), jnp.int32),
                         jnp.zeros((2,), jnp.int32),
                         num_valid_frames=jnp.asarray([20, 13], jnp.int32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-6)


class TestEncoderQuantization:
    """Generic-rule int8 quantization of the EMG encoder (the decode-
    direction artifact): conv kernels, attention projections, rel-pos
    tables; BatchNorm affines/statistics stay f32."""

    @pytest.fixture(scope="class")
    def small_enc(self):
        from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer

        enc = EMGEncoderTransformer(model_size=32, num_extra_res_blocks=3,
                                    num_transformer_layers=1, num_heads=4,
                                    dim_feedforward=64, dropout=0.0,
                                    relative_positional_distance=20)
        variables = jax.jit(lambda: enc.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 8)),
            train=False))()
        return enc, variables

    def test_roundtrip_and_fidelity(self, small_enc, rng):
        from ste_gan_tpu.quant import dequantize_params, quantize_params

        enc, variables = small_enc
        q = quantize_params(variables["params"], generic=True)
        # Conv kernels became int8 leaves...
        leaves = {jax.tree_util.keystr(p): l for p, l
                  in jax.tree_util.tree_flatten_with_path(q)[0]}
        assert any(k.endswith("['kernel__q']") and l.dtype == jnp.int8
                   for k, l in leaves.items())
        assert any(k.endswith("['w_q__q']") for k in leaves)
        # ...BatchNorm affines did not.
        assert any(k.endswith("['scale']") and l.dtype == jnp.float32
                   for k, l in leaves.items())
        dq = dequantize_params(q)
        assert (jax.tree_util.tree_structure(variables["params"])
                == jax.tree_util.tree_structure(dq))
        emg = jnp.asarray(rng.normal(size=(2, 512, 8)) * 0.1, jnp.float32)
        su, ph = enc.apply(variables, emg, train=False)
        su2, ph2 = enc.apply(dict(variables, params=dq), emg, train=False)
        assert float(jnp.max(jnp.abs(su - su2))) < 0.05 * float(
            jnp.max(jnp.abs(su)))
        agree = float(jnp.mean(jnp.argmax(ph, -1) == jnp.argmax(ph2, -1)))
        assert agree > 0.95

    def test_quantized_encoder_export(self, small_enc, rng):
        from ste_gan_tpu.export import export_emg_encoder
        from ste_gan_tpu.quant import (dequantize_params,
                                       export_emg_encoder_quantized,
                                       quantize_params)

        enc, variables = small_enc
        e_f32 = export_emg_encoder(enc, variables, 8)
        e_q = export_emg_encoder_quantized(enc, variables, 8)
        assert len(e_q.serialize()) < len(e_f32.serialize())
        emg = jnp.asarray(rng.normal(size=(1, 512, 8)) * 0.1, jnp.float32)
        su, ph = e_q.call(emg)
        dq = dict(variables, params=dequantize_params(
            quantize_params(variables["params"], generic=True)))
        su2, ph2 = enc.apply(dq, emg, train=False)
        np.testing.assert_allclose(np.asarray(su), np.asarray(su2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ph), np.asarray(ph2),
                                   atol=1e-5)
