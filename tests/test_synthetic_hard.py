"""The HARD synthetic corpus variant (VERDICT r4 #4): structural invariants
preserved, plus the properties that de-saturate the benchmark — many-to-one
context-dependent phoneme->EMG signatures, session-dependent dynamics,
channel crosstalk, amplitude drift."""
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.synthetic import (
    NUM_CONTEXT_CLASSES, _segment_context_classes, generate_synthetic_corpus,
    global_maps, hard_maps, hard_session_dynamics, synth_utterance_hard)


class TestHardUtteranceInvariants:
    def test_etl_length_and_bound_invariants(self):
        """Same invariants the real ETL guarantees
        (reference: scripts/prep_data_gaddy_and_klein.py:398-407)."""
        rng = np.random.default_rng(3)
        utt = synth_utterance_hard(rng, num_frames=140, session_idx=1)
        assert len(utt["emg"]) == C.HOPSIZE * len(utt["units"])
        assert len(utt["units"]) == len(utt["phonemes"])
        assert len(utt["mfccs"]) == 2 * len(utt["units"])
        assert np.abs(utt["emg"]).max() <= 1.0
        assert utt["emg"].dtype == np.float32
        assert utt["emg_feats"].shape == (280, C.NUM_EMG_CHANNELS, 6)

    def test_deterministic_for_fixed_seed(self):
        a = synth_utterance_hard(np.random.default_rng(11), 130, 2)
        b = synth_utterance_hard(np.random.default_rng(11), 130, 2)
        np.testing.assert_array_equal(a["emg"], b["emg"])
        np.testing.assert_array_equal(a["units"], b["units"])

    def test_speech_side_shares_base_anchors(self):
        """The generator input distribution is unchanged: units come from
        the SAME global per-phoneme anchors as the base corpus — only the
        EMG observation model got harder."""
        anchors_base = global_maps()[0]
        anchors_hard = hard_maps()[0]
        np.testing.assert_array_equal(anchors_base, anchors_hard)


class TestManyToOneMapping:
    def test_phoneme_pairs_share_signatures(self):
        """Phonemes 2p and 2p+1 share amplitude AND carrier signatures:
        EMG alone cannot fully determine the phoneme (non-invertible)."""
        _, amps, freqs, phoneme_mod, *_ = hard_maps()
        sil = C.PHONEME_INVENTORY.index("sil")
        for p in range(0, C.NUM_PHONEMES - 1, 2):
            if sil in (p, p + 1):
                continue  # silence overrides its row to near-zero
            np.testing.assert_array_equal(amps[p], amps[p + 1])
            np.testing.assert_array_equal(freqs[p], freqs[p + 1])

    def test_within_pair_evidence_is_weak(self):
        """The only within-pair evidence is the +-8% modulation — partial,
        so the accuracy ceiling sits well below 100% under noise+drift."""
        phoneme_mod = hard_maps()[3]
        assert phoneme_mod.min() >= 0.92 and phoneme_mod.max() <= 1.08

    def test_silence_is_quiet(self):
        _, amps, *_ = hard_maps()
        sil = C.PHONEME_INVENTORY.index("sil")
        assert np.all(amps[sil] <= 0.05)


class TestContextDependence:
    def test_segment_context_is_previous_phoneme_class(self):
        _, _, _, _, ctx_class, *_ = hard_maps()
        sil = C.PHONEME_INVENTORY.index("sil")
        phonemes = np.array([5, 5, 5, 9, 9, 30, 30, 30, 30])
        ctx = _segment_context_classes(phonemes, ctx_class)
        np.testing.assert_array_equal(ctx[:3], ctx_class[sil])
        np.testing.assert_array_equal(ctx[3:5], ctx_class[5])
        np.testing.assert_array_equal(ctx[5:], ctx_class[9])

    def test_context_tables_modulate(self):
        ctx_gain, ctx_freq = hard_maps()[5], hard_maps()[6]
        assert ctx_gain.shape == (NUM_CONTEXT_CLASSES, C.NUM_EMG_CHANNELS)
        # The classes genuinely differ (the modulation is learnable signal).
        assert np.std(ctx_gain, axis=0).max() > 0.05
        assert np.std(ctx_freq, axis=0).max() > 0.01


class TestSessionDynamicsAndCrosstalk:
    def test_sessions_differ_and_are_deterministic(self):
        d0 = hard_session_dynamics(0)
        d0b = hard_session_dynamics(0)
        d1 = hard_session_dynamics(1)
        np.testing.assert_array_equal(d0[0], d0b[0])
        assert d0[1:] == d0b[1:]
        assert not np.allclose(d0[0], d1[0])        # gains
        assert d0[1] != d1[1]                        # carrier scale
        assert d0[2] != d1[2]                        # crosstalk strength
        assert 0.15 <= d0[2] <= 0.35
        assert 9 <= d0[3] <= 32                      # envelope window

    def test_mixing_matrix_is_pure_crosstalk(self):
        mix = hard_maps()[7]
        assert np.all(np.diag(mix) == 0.0)
        np.testing.assert_allclose(np.abs(mix).sum(axis=1), 1.0, rtol=1e-12)

    def test_session_changes_the_same_content(self):
        """Identical rng stream, different session: the EMG differs by
        more than a per-channel gain (dynamics + crosstalk + carrier
        scale are session-dependent)."""
        a = synth_utterance_hard(np.random.default_rng(7), 130, 0)
        b = synth_utterance_hard(np.random.default_rng(7), 130, 1)
        np.testing.assert_array_equal(a["units"], b["units"])
        ratio = (np.abs(a["emg"]) + 1e-3) / (np.abs(b["emg"]) + 1e-3)
        # A pure gain would give a near-constant per-channel ratio.
        assert np.median(np.std(np.log(ratio), axis=0)) > 0.2


class TestHardCorpusGeneration:
    def test_layout_and_dataset_load(self, tmp_path):
        root = generate_synthetic_corpus(
            tmp_path / "hard", num_train=4, num_valid=2, num_test=2,
            num_sessions=2, min_frames=130, max_frames=150, hard=True)
        ds = EMGDataset(root, "train")
        assert len(ds) == 4
        sample = ds[0]
        emg = np.asarray(sample[C.DataType.REAL_EMG])
        units = np.asarray(sample[C.DataType.SPEECH_UNITS])
        assert len(emg) == C.HOPSIZE * len(units)
        assert np.abs(emg).max() <= 1.0

    def test_hard_differs_from_base(self, tmp_path):
        base = generate_synthetic_corpus(
            tmp_path / "base", num_train=1, num_valid=1, num_test=1,
            num_sessions=1, min_frames=130, max_frames=140, hard=False)
        hard = generate_synthetic_corpus(
            tmp_path / "hardc", num_train=1, num_valid=1, num_test=1,
            num_sessions=1, min_frames=130, max_frames=140, hard=True)
        b = EMGDataset(base, "train")[0]
        h = EMGDataset(hard, "train")[0]
        assert not np.array_equal(np.asarray(b[C.DataType.REAL_EMG]),
                                  np.asarray(h[C.DataType.REAL_EMG]))
