"""Tests for the synthetic corpus, dataset, collate, and loaders."""
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.collate import ste_gan_collate
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.loader import Prefetcher, loaders
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    generate_synthetic_corpus(root, num_train=12, num_valid=4, num_test=2,
                              num_sessions=3, seed=0)
    return root


class TestSyntheticCorpus:
    def test_length_invariants(self, corpus):
        ds = EMGDataset(corpus, partition="train", strict=True)
        item = ds[0]
        emg = item[C.DataType.REAL_EMG]
        units = item[C.DataType.SPEECH_UNITS]
        phonemes = item[C.DataType.PHONEMES]
        mfccs = item[C.DataType.MFCCS]
        assert len(emg) == C.HOPSIZE * len(units) == C.HOPSIZE * len(phonemes)
        assert len(mfccs) == 2 * len(units)
        assert emg.shape[-1] == C.NUM_EMG_CHANNELS
        assert units.shape[-1] == C.SPEECH_UNITS_FEAT_SIZE
        assert np.abs(emg).max() <= 1.0

    def test_session_vocab_is_train_derived_and_sorted(self, corpus):
        train = EMGDataset(corpus, partition="train")
        valid = EMGDataset(corpus, partition="valid",
                           session_id_to_idx=train.session_id_to_idx,
                           speaking_mode_id_to_idx=train.speaking_mode_id_to_idx)
        assert list(train.session_id_to_idx.keys()) == sorted(train.session_id_to_idx)
        assert valid.session_id_to_idx == train.session_id_to_idx

    def test_overlap_check(self, corpus):
        train = EMGDataset(corpus, partition="train")
        with pytest.raises(ValueError):
            EMGDataset.check_no_data_overlap([train, train])

    def test_length_filter(self, corpus):
        ds = EMGDataset(corpus, partition="train", filter_by_length=True,
                        train_emg_length=10**9)
        assert len(ds) == 0 and ds.num_filtered > 0


class TestCollate:
    def test_train_shapes_are_static(self, corpus):
        ds = EMGDataset(corpus, partition="train")
        rng = np.random.default_rng(0)
        batch = ste_gan_collate([ds[i] for i in range(4)], "train", rng=rng)
        assert batch[C.DataType.REAL_EMG].shape == (4, 2048, 8)
        assert batch[C.DataType.SPEECH_UNITS].shape == (4, 128, 256)
        assert batch[C.DataType.PHONEMES].shape == (4, 128)
        assert batch[C.DataType.MFCCS].shape == (4, 256, 25)
        assert batch[C.DataType.SESSION_INDEX].shape == (4,)

    def test_emg_crop_aligns_with_unit_crop(self, corpus):
        ds = EMGDataset(corpus, partition="train")
        item = ds[0]
        rng = np.random.default_rng(3)
        batch = ste_gan_collate([item], "train", rng=rng)
        emg = batch[C.DataType.REAL_EMG][0]
        units = batch[C.DataType.SPEECH_UNITS][0]
        full_units = item[C.DataType.SPEECH_UNITS]
        # locate the unit crop in the full sequence, verify EMG aligns 16:1
        for start in range(len(full_units) - 127):
            if np.array_equal(full_units[start:start + 128], units):
                np.testing.assert_array_equal(
                    item[C.DataType.REAL_EMG][start * 16:start * 16 + 2048], emg)
                return
        raise AssertionError("unit crop not found in source utterance")

    def test_valid_takes_first_chunk(self, corpus):
        ds = EMGDataset(corpus, partition="valid")
        batch = ste_gan_collate([ds[0]], "valid")
        np.testing.assert_array_equal(
            batch[C.DataType.SPEECH_UNITS][0], ds[0][C.DataType.SPEECH_UNITS][:128])

    def test_test_partition_full_length(self, corpus):
        ds = EMGDataset(corpus, partition="test")
        batch = ste_gan_collate([ds[0]], "test")
        assert batch[C.DataType.REAL_EMG].shape[1] == len(ds[0][C.DataType.REAL_EMG])


class TestLoaders:
    def test_undersized_train_partition_fails_fast(self, corpus):
        # An empty/undersized train split must raise, not spin through
        # zero-batch epochs (drop_last would yield nothing forever).
        import pytest

        with pytest.raises(ValueError, match="usable"):
            loaders(corpus, batch_size=10_000)

    def test_three_loaders(self, corpus):
        train, valid, test = loaders(corpus, batch_size=4)
        tb = next(iter(train))
        assert tb[C.DataType.REAL_EMG].shape == (4, 2048, 8)
        vb = next(iter(valid))
        assert vb[C.DataType.REAL_EMG].shape[1] == 2048
        testb = next(iter(test))
        assert testb[C.DataType.REAL_EMG].shape[0] == 1

    def test_prefetcher_preserves_order_and_errors(self, corpus):
        items = list(Prefetcher(lambda: iter(range(10)), depth=2))
        assert items == list(range(10))

        def boom():
            yield 1
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            list(Prefetcher(boom, depth=2))


class TestPerHostSharding:
    """Multi-host data sharding (mocked process grid): every host draws the
    same global batches; host slices partition each batch; single-host
    behaviour is unchanged."""

    def test_host_slices_partition_global_batches(self, corpus):
        from ste_gan_tpu.data.loader import DataLoader

        ds = EMGDataset(corpus, partition="train", filter_by_length=False)
        kwargs = dict(batch_size=4, partition="train", shuffle=True,
                      emg_train_length=512, seed=3, drop_last=True)
        hosts = [DataLoader(ds, **kwargs, process_index=i, process_count=2)
                 for i in range(2)]
        unsharded = DataLoader(ds, **kwargs)

        global_batches = list(unsharded._index_batches())
        for host in hosts:
            assert [list(c) for c in host._index_batches()] == \
                [list(c) for c in global_batches]
        for chunk in global_batches:
            slices = [list(h._host_slice(chunk)) for h in hosts]
            assert slices[0] + slices[1] == list(chunk)

        # Collated host batches carry the local batch size.
        batch0 = next(iter(hosts[0]))
        assert batch0[C.DataType.REAL_EMG].shape[0] == 2
        full = next(iter(unsharded))
        assert full[C.DataType.REAL_EMG].shape[0] == 4

    def test_invalid_grids_rejected(self, corpus):
        from ste_gan_tpu.data.loader import DataLoader

        ds = EMGDataset(corpus, partition="train", filter_by_length=False)
        with pytest.raises(ValueError, match="divisible"):
            DataLoader(ds, batch_size=5, partition="train", shuffle=True,
                       emg_train_length=512, drop_last=True,
                       process_index=0, process_count=2)
        with pytest.raises(ValueError, match="drop_last"):
            DataLoader(ds, batch_size=4, partition="train", shuffle=True,
                       emg_train_length=512, drop_last=False,
                       process_index=0, process_count=2)
