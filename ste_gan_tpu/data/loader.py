"""Host-side data loaders with background prefetch.

The TPU analogue of the reference's DataLoader setup
(ste_gan/data/loader.py:19-109): a shuffling train iterator with random
chunk collation, a sequential valid iterator with first-chunk collation, and
a batch-1 full-length test iterator. Instead of worker *processes*, batches
are assembled on the host (items are RAM-cached after first touch) and
handed to a small thread-based prefetcher — device transfer and sharding
happen in :mod:`ste_gan_tpu.parallel.mesh` so the loader stays
framework-agnostic numpy.
"""
from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable, Dict, Iterator

import numpy as np

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.collate import ste_gan_collate
from ste_gan_tpu.data.dataset import EMGDataset


class DataLoader:
    """Iterable over collated batches of an :class:`EMGDataset`.

    Multi-host pods: ``process_count > 1`` makes every host draw the SAME
    seeded global permutation and batch boundaries, but load/collate only
    its own ``batch_size / process_count`` slice of each global batch — the
    per-host shard of the data-parallel global batch (SURVEY.md §7 phase 2).
    ``process_count == 1`` (default) is byte-identical to the unsharded
    behaviour."""

    def __init__(self, dataset: EMGDataset, batch_size: int, partition: str,
                 shuffle: bool, emg_train_length: int, hopsize: int = C.HOPSIZE,
                 seed: int = 0, drop_last: bool = False,
                 process_index: int = 0, process_count: int = 1):
        if process_count > 1:
            if batch_size % process_count:
                raise ValueError(
                    f"global batch_size {batch_size} not divisible by "
                    f"process_count {process_count}")
            if not drop_last:
                raise ValueError("per-host sharding requires drop_last "
                                 "(every host must see a full slice)")
        assert 0 <= process_index < process_count
        self.dataset = dataset
        self.batch_size = batch_size
        self.partition = partition
        self.shuffle = shuffle
        self.emg_train_length = emg_train_length
        self.hopsize = hopsize
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        self._epoch = -1

    @property
    def local_batch_size(self) -> int:
        return self.batch_size // self.process_count

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> Iterator[np.ndarray]:
        """Global batch index chunks — identical on every host (same seed)."""
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(indices)
        for i in range(0, len(indices), self.batch_size):
            chunk = indices[i:i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def _host_slice(self, chunk: np.ndarray) -> np.ndarray:
        """This host's contiguous slice of a global batch."""
        local = self.local_batch_size if self.process_count > 1 else len(chunk)
        start = self.process_index * local
        return chunk[start:start + local]

    def _crop_starts(self, global_indices: np.ndarray,
                     unit_lengths) -> np.ndarray:
        """Per-item crop starts seeded by (seed, epoch, global index) —
        host-count invariant: any partitioning of the global batch across
        hosts crops every utterance identically, so N hosts reproduce the
        single-host trajectory exactly (SURVEY §2.3). ``unit_lengths`` are
        the items' speech-unit frame counts (so the index-only
        device-resident path draws identical starts without loading items)."""
        frames = self.emg_train_length // self.hopsize
        starts = np.empty(len(global_indices), np.int64)
        for row, (j, n) in enumerate(zip(global_indices, unit_lengths)):
            hi = 1 + max(0, int(n) - frames)
            starts[row] = np.random.default_rng(
                (self.seed, self._epoch, int(j))).integers(0, hi)
        return starts

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        for chunk in self._index_batches():
            local = self._host_slice(chunk)
            items = [self.dataset[int(j)] for j in local]
            starts = (self._crop_starts(
                local, [len(it[C.DataType.SPEECH_UNITS]) for it in items])
                if self.partition == "train" else None)
            yield ste_gan_collate(
                items, partition=self.partition,
                emg_train_length=self.emg_train_length,
                hopsize=self.hopsize, starts=starts)


class Prefetcher:
    """Background-thread prefetch of an iterator (the analogue of the
    reference's num_workers=2 async loading; ste_gan/constants.py:54)."""

    _SENTINEL = object()

    def __init__(self, make_iter: Callable[[], Iterator], depth: int = 2):
        self._make_iter = make_iter
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        error = []

        def worker():
            try:
                for item in self._make_iter():
                    q.put(item)
            except BaseException as exc:  # propagate into the consumer
                error.append(exc)
            finally:
                q.put(self._SENTINEL)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if error:
                    raise error[0]
                return
            yield item


def loaders(
    data_root: Path,
    strict: bool = False,
    hopsize: int = C.HOPSIZE,
    train_emg_length: int = C.TRAIN_EMG_LENGTH,
    batch_size: int = C.BATCH_SIZE,
    seed: int = 0,
    drop_last_train: bool = True,
    process_index: int = None,
    process_count: int = None,
):
    """Build (train, valid, test) loaders with the reference's dataset
    filters and train-derived vocabularies (ste_gan/data/loader.py:19-90).

    ``drop_last_train=True`` keeps every compiled step at the full static
    batch shape (the reference tolerates a ragged final batch; we prefer a
    single XLA program).

    ``process_index``/``process_count`` default to this JAX process's
    coordinates: on a multi-host pod the TRAIN loader yields this host's
    shard of each global batch (valid/test stay replicated — evaluation and
    plotting run identically on every host)."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    train_ds = EMGDataset(data_root, partition="train", strict=strict,
                          filter_by_length=True, only_include_voiced=True,
                          train_emg_length=train_emg_length)
    valid_ds = EMGDataset(data_root, partition="valid",
                          session_id_to_idx=train_ds.session_id_to_idx,
                          speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx,
                          only_include_voiced=True, filter_by_length=True,
                          train_emg_length=train_emg_length, strict=strict)
    test_ds = EMGDataset(data_root, partition="test",
                         session_id_to_idx=train_ds.session_id_to_idx,
                         speaking_mode_id_to_idx=train_ds.speaking_mode_id_to_idx,
                         only_include_voiced=True, filter_by_length=False,
                         train_emg_length=train_emg_length, strict=strict)
    EMGDataset.check_no_data_overlap([train_ds, valid_ds, test_ds])
    if len(train_ds) < batch_size:
        # Fail fast: with an empty/undersized train partition the trainer
        # would spin through zero-batch epochs forever (drop_last).
        raise ValueError(
            f"train partition at {data_root} has {len(train_ds)} usable "
            f"utterances (< batch_size {batch_size}). If this is the "
            "synthetic development corpus, (re)generate it with: "
            "python -m ste_gan_tpu.data.synthetic --root data/synthetic")

    train_loader = DataLoader(train_ds, batch_size, "train", shuffle=True,
                              emg_train_length=train_emg_length,
                              hopsize=hopsize, seed=seed,
                              drop_last=drop_last_train,
                              process_index=process_index,
                              process_count=process_count)
    valid_loader = DataLoader(valid_ds, batch_size, "valid", shuffle=False,
                              emg_train_length=train_emg_length, hopsize=hopsize)
    test_loader = DataLoader(test_ds, 1, "test", shuffle=False,
                             emg_train_length=train_emg_length, hopsize=hopsize)
    return train_loader, valid_loader, test_loader


def loaders_via_config(cfg):
    return loaders(
        data_root=Path(cfg.data.dataset_root),
        strict=cfg.data.strict,
        hopsize=C.HOPSIZE,
        train_emg_length=cfg.train.chunk_size,
        batch_size=cfg.train.batch_size,
        seed=cfg.train.random_seed,
    )
