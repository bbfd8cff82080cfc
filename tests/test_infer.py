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
