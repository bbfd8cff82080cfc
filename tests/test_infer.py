"""Inference API tests: bucketed padding exactness, streaming equivalence,
batched dataset conversion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus
from ste_gan_tpu.infer import EMGSynthesizer, convert_dataset
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS


@pytest.fixture(scope="module")
def small_gen():
    gen = EMGGeneratorGanTTS(num_sessions=4, channels=32)
    feats = jnp.zeros((1, 8, 256))
    ids = jnp.zeros((1,), jnp.int32)
    params = gen.init(jax.random.PRNGKey(0), feats, ids, ids)["params"]
    return gen, params


class TestSynthesizer:
    def test_output_shape_and_range(self, small_gen, rng):
        gen, params = small_gen
        synth = EMGSynthesizer(gen, params)
        feats = rng.normal(size=(37, 256)).astype(np.float32)
        emg = synth.synthesize(feats, session_idx=2)
        assert emg.shape == (37 * 16, 8)
        assert np.abs(emg).max() <= 1.0

    def test_bucketing_is_exact(self, small_gen, rng):
        """Padded-then-trimmed output equals the unpadded output everywhere:
        padded frames are masked after every conv inside the generator, so
        explicit right-padding is bit-equivalent to the conv stack's boundary
        zero-padding."""
        gen, params = small_gen
        feats = rng.normal(size=(40, 256)).astype(np.float32)
        exact = EMGSynthesizer(gen, params, bucket=1).synthesize(feats, 0)
        bucketed = EMGSynthesizer(gen, params, bucket=64).synthesize(feats, 0)
        assert exact.shape == bucketed.shape
        np.testing.assert_allclose(bucketed, exact, atol=1e-5)

    def test_streaming_matches_full(self, small_gen, rng):
        gen, params = small_gen
        synth = EMGSynthesizer(gen, params)
        feats = rng.normal(size=(300, 256)).astype(np.float32)
        full = synth.synthesize(feats, session_idx=1)
        chunks = list(synth.synthesize_streaming(feats, session_idx=1,
                                                 chunk_frames=64))
        streamed = np.concatenate(chunks, axis=0)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-4)

    def test_streaming_matches_full_mfcc_variant(self, rng):
        """Receptive-field-exact streaming on the x8-upsample MFCC
        configuration (100 Hz inputs): the halo arithmetic must hold for
        both upsample factors (reference generator.py:116,127)."""
        gen = EMGGeneratorGanTTS(speech_feature_type=C.DataType.MFCCS,
                                 speech_input_dim=C.NUM_MFCCS,
                                 num_sessions=4, channels=32)
        feats0 = jnp.zeros((1, 8, C.NUM_MFCCS))
        ids = jnp.zeros((1,), jnp.int32)
        params = gen.init(jax.random.PRNGKey(3), feats0, ids, ids)["params"]
        synth = EMGSynthesizer(gen, params)
        assert synth.upsample == 8
        feats = rng.normal(size=(300, C.NUM_MFCCS)).astype(np.float32)
        full = synth.synthesize(feats, session_idx=1)
        assert full.shape == (300 * 8, C.NUM_EMG_CHANNELS)
        chunks = list(synth.synthesize_streaming(feats, session_idx=1,
                                                 chunk_frames=64))
        streamed = np.concatenate(chunks, axis=0)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-4)

    def test_convert_dataset_multi_session(self, small_gen, tmp_path):
        gen, params = small_gen
        corpus = tmp_path / "corpus"
        generate_synthetic_corpus(corpus, num_train=4, num_valid=2, num_test=3,
                                  num_sessions=3, min_frames=64, max_frames=80)
        train_ds = EMGDataset(corpus, "train")
        test_ds = EMGDataset(corpus, "test", filter_by_length=False,
                             session_id_to_idx=train_ds.session_id_to_idx,
                             speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx)
        synth = EMGSynthesizer(gen, params)
        results = convert_dataset(synth, test_ds)
        assert len(results) == len(test_ds)
        for idx, res in enumerate(results):
            item = test_ds[idx]
            assert res[C.DataType.FAKE_EMG].shape == (
                16 * len(item[C.DataType.SPEECH_UNITS]), 8)
            assert res[C.DataType.UTT_ID] == item[C.DataType.UTT_ID]
            # Batched (bucketed, per-sample-masked) output equals the
            # single-utterance exact path.
            exact = synth.synthesize(item[C.DataType.SPEECH_UNITS],
                                     int(item[C.DataType.SESSION_INDEX]),
                                     int(item[C.DataType.SPEAKING_MODE_INDEX]))
            np.testing.assert_allclose(res[C.DataType.FAKE_EMG], exact,
                                       atol=1e-5)


class TestMeshInference:
    """Scale-out inference: the batch axis sharded over a 1-D data mesh.
    Rows are independent through the generator, so sharded results must be
    bit-comparable with single-device results; non-divisible batches ride
    masked dummy rows. (Beyond-reference: the reference is single-device,
    SURVEY §2.3.)"""

    @pytest.fixture(scope="class")
    def mesh(self):
        from ste_gan_tpu.parallel.mesh import create_mesh
        return create_mesh(8)

    def test_padded_batch_matches_single_device(self, small_gen, mesh, rng):
        gen, params = small_gen
        plain = EMGSynthesizer(gen, params)
        sharded = EMGSynthesizer(gen, params, mesh=mesh)
        feats = rng.normal(size=(8, 48, 256)).astype(np.float32)
        sess = np.arange(8, dtype=np.int32) % 4
        mode = np.zeros((8,), np.int32)
        valid = np.asarray([48, 40, 33, 48, 17, 25, 48, 1], np.int32)
        want = np.asarray(plain.synthesize_padded(
            jnp.asarray(feats), jnp.asarray(sess), jnp.asarray(mode),
            jnp.asarray(valid)))
        got = np.asarray(sharded.synthesize_padded(
            jnp.asarray(feats), jnp.asarray(sess), jnp.asarray(mode),
            jnp.asarray(valid)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_non_divisible_batch(self, small_gen, mesh, rng):
        """3 rows on an 8-device mesh: dummy rows are appended, masked,
        and trimmed — the caller sees exactly its 3 rows."""
        gen, params = small_gen
        plain = EMGSynthesizer(gen, params)
        sharded = EMGSynthesizer(gen, params, mesh=mesh)
        feats = rng.normal(size=(3, 32, 256)).astype(np.float32)
        sess = np.asarray([0, 1, 2], np.int32)
        want = np.asarray(plain.synthesize_batch(jnp.asarray(feats),
                                                 jnp.asarray(sess)))
        got = np.asarray(sharded.synthesize_batch(jnp.asarray(feats),
                                                  jnp.asarray(sess)))
        assert got.shape == want.shape == (3, 32 * 16, 8)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_streaming_under_mesh(self, small_gen, mesh, rng):
        gen, params = small_gen
        sharded = EMGSynthesizer(gen, params, mesh=mesh)
        feats = rng.normal(size=(200, 256)).astype(np.float32)
        full = EMGSynthesizer(gen, params).synthesize(feats, session_idx=1)
        chunks = list(sharded.synthesize_streaming(feats, session_idx=1,
                                                   chunk_frames=64))
        streamed = np.concatenate(chunks, axis=0)
        assert streamed.shape == full.shape
        np.testing.assert_allclose(streamed, full, atol=2e-4)

    def test_convert_dataset_under_mesh(self, small_gen, mesh, tmp_path):
        gen, params = small_gen
        corpus = tmp_path / "corpus"
        generate_synthetic_corpus(corpus, num_train=4, num_valid=2,
                                  num_test=3, num_sessions=3,
                                  min_frames=64, max_frames=80)
        train_ds = EMGDataset(corpus, "train")
        test_ds = EMGDataset(
            corpus, "test", filter_by_length=False,
            session_id_to_idx=train_ds.session_id_to_idx,
            speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx)
        plain = convert_dataset(EMGSynthesizer(gen, params), test_ds)
        meshed = convert_dataset(EMGSynthesizer(gen, params, mesh=mesh),
                                 test_ds)
        for a, b in zip(plain, meshed):
            np.testing.assert_allclose(b[C.DataType.FAKE_EMG],
                                       a[C.DataType.FAKE_EMG], atol=1e-5)

    def test_set_params_stays_replicated(self, small_gen, mesh, rng):
        """Weight hot-reload under a serving mesh: set_params re-replicates
        so the next call reuses the compiled sharded program with the new
        weights."""
        gen, params = small_gen
        sharded = EMGSynthesizer(gen, params, mesh=mesh)
        feats = rng.normal(size=(8, 32, 256)).astype(np.float32)
        sess = np.zeros((8,), np.int32)
        before = np.asarray(sharded.synthesize_batch(jnp.asarray(feats),
                                                     jnp.asarray(sess)))
        halved = jax.tree.map(lambda x: x * 0.5, params)
        sharded.set_params(halved)
        after = np.asarray(sharded.synthesize_batch(jnp.asarray(feats),
                                                    jnp.asarray(sess)))
        want = np.asarray(EMGSynthesizer(gen, halved).synthesize_batch(
            jnp.asarray(feats), jnp.asarray(sess)))
        assert not np.allclose(before, after)
        np.testing.assert_allclose(after, want, atol=1e-5)
