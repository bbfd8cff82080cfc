"""Packed single-file corpus format (`data/packed.py`): one mmap-able
blob + JSON index per split, auto-detected by `EMGDataset`, serving items
IDENTICAL to the directory layout's."""
import shutil

import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.packed import PackedSplit, pack_split
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus

COMPARED_FIELDS = (
    C.DataType.REAL_EMG, C.DataType.SPEECH_UNITS, C.DataType.PHONEMES,
    C.DataType.MFCCS, C.DataType.EMG_FEATURES,
)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    """(directory-layout root, packed root) of the same corpus. The packed
    root's artifact directories are DELETED after packing, so any read
    that still goes to per-utterance files fails loudly."""
    root = tmp_path_factory.mktemp("corpus_dir")
    generate_synthetic_corpus(root, num_train=6, num_valid=2, num_test=2,
                              num_sessions=2, min_frames=34, max_frames=40,
                              seed=3)
    packed_root = tmp_path_factory.mktemp("corpus_packed")
    shutil.copytree(root, packed_root, dirs_exist_ok=True)
    for split in ("train", "valid", "test"):
        pack_split(packed_root / split)
        for directory in (C.DataDir.EMG, C.DataDir.SPEECH_UNITS,
                          C.DataDir.PHONEMES, C.DataDir.MFCCS,
                          C.DataDir.EMG_FEATS, C.DataDir.TRANSCRIPTIONS):
            target = packed_root / split / directory
            if target.is_dir():
                shutil.rmtree(target)
    return root, packed_root


@pytest.mark.parametrize("partition", ["train", "valid", "test"])
def test_items_identical_to_directory_layout(corpora, partition):
    root, packed_root = corpora
    a = EMGDataset(root, partition=partition, train_emg_length=512)
    b = EMGDataset(packed_root, partition=partition, train_emg_length=512)
    assert a.utt_ids == b.utt_ids
    assert a.emg_lengths == b.emg_lengths
    assert a.session_id_to_idx == b.session_id_to_idx
    assert a.num_emg_channels == b.num_emg_channels
    assert a.transcripts == b.transcripts
    for i in range(len(a)):
        ia, ib = a[i], b[i]
        for key in COMPARED_FIELDS:
            if ia[key] is None:
                assert ib[key] is None, key
            else:
                np.testing.assert_array_equal(ia[key], ib[key],
                                              err_msg=f"{key} @ {i}")
                assert ia[key].dtype == ib[key].dtype
        assert ia[C.DataType.UTT_ID] == ib[C.DataType.UTT_ID]
        assert ia[C.DataType.TRANSCRIPTION] == ib[C.DataType.TRANSCRIPTION]
        assert ia[C.DataType.SESSION_INDEX] == ib[C.DataType.SESSION_INDEX]


def test_startup_reads_index_only(corpora):
    """The packed root has NO artifact directories left — construction and
    reads must come exclusively from packed.bin + the index."""
    _, packed_root = corpora
    ds = EMGDataset(packed_root, partition="train", train_emg_length=512)
    assert len(ds) > 0
    item = ds[0]
    assert item[C.DataType.REAL_EMG].shape[-1] == 8


def test_reader_zero_copy_view(corpora):
    _, packed_root = corpora
    split = PackedSplit(packed_root / "train")
    utt, length = split.emg_infos()[0]
    emg = split.load(utt, "emg")
    assert emg.shape[0] == length
    assert not emg.flags.writeable  # mmap-backed view, not a copy
    with pytest.raises(FileNotFoundError):
        split.load(utt, "nonexistent_field")


def test_packed_loaders_end_to_end(corpora):
    from ste_gan_tpu.data.loader import loaders

    _, packed_root = corpora
    train_loader, valid_loader, _ = loaders(
        packed_root, batch_size=2, train_emg_length=512, seed=0)
    batch = next(iter(train_loader))
    assert batch[C.DataType.REAL_EMG].shape == (2, 512, 8)
    batch = next(iter(valid_loader))
    assert batch[C.DataType.SPEECH_UNITS].shape[0] <= 2
