"""Corpora prepared by the reference's prep scripts (.pt artifacts) load
transparently through EMGDataset."""
from pathlib import Path

import numpy as np
import torch

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.dataset import EMGDataset


def _write_pt_corpus(root: Path, rng):
    for split, count in [("train", 3), ("valid", 1), ("test", 1)]:
        for sub in (C.DataDir.EMG, C.DataDir.SPEECH_UNITS, C.DataDir.PHONEMES,
                    C.DataDir.MFCCS, C.DataDir.TRANSCRIPTIONS):
            (root / split / sub).mkdir(parents=True, exist_ok=True)
    idx = 0
    for split, count in [("train", 3), ("valid", 1), ("test", 1)]:
        for _ in range(count):
            frames = 140
            utt = f"sess00__utt{idx:05d}__normal"
            idx += 1
            torch.save(torch.tensor(rng.normal(size=(frames * 16, 8)).astype(np.float32)),
                       root / split / C.DataDir.EMG / f"{utt}.pt")
            torch.save(torch.tensor(rng.normal(size=(frames, 256)).astype(np.float32)),
                       root / split / C.DataDir.SPEECH_UNITS / f"{utt}.pt")
            torch.save(torch.tensor(rng.integers(0, 48, frames)),
                       root / split / C.DataDir.PHONEMES / f"{utt}.pt")
            torch.save(torch.tensor(rng.normal(size=(2 * frames, 25)).astype(np.float32)),
                       root / split / C.DataDir.MFCCS / f"{utt}.pt")
            (root / split / C.DataDir.TRANSCRIPTIONS / f"{utt}.txt").write_text("Hello")


def test_pt_artifacts_load(tmp_path, rng):
    _write_pt_corpus(tmp_path, rng)
    ds = EMGDataset(tmp_path, "train", strict=True, return_emg_feats=False)
    assert len(ds) == 3
    item = ds[0]
    assert item[C.DataType.REAL_EMG].shape == (140 * 16, 8)
    assert item[C.DataType.SPEECH_UNITS].shape == (140, 256)
    assert item[C.DataType.PHONEMES].dtype == np.int32
    assert item[C.DataType.TRANSCRIPTION] == "hello"  # lower-cased like the reference
    assert ds.emg_lengths[0] == 140 * 16
