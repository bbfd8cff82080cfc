"""Device-resident corpus (data/device_corpus.py): on-device crop gathers
must be example-identical to the host collate pipeline, and the trainer's
device-resident mode must reproduce the host-pipeline trajectory."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.collate import ste_gan_collate
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.data.device_corpus import DeviceCorpus, IndexLoader
from ste_gan_tpu.data.loader import DataLoader
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus

CHUNK = 512  # 32 speech-unit frames


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory) -> Path:
    root = tmp_path_factory.mktemp("corpus")
    generate_synthetic_corpus(root, num_train=8, num_valid=2, num_test=2,
                              num_sessions=3, min_frames=34, max_frames=48,
                              seed=0)
    return root


@pytest.fixture(scope="module")
def train_ds(corpus_root) -> EMGDataset:
    return EMGDataset(corpus_root, partition="train", filter_by_length=True,
                      only_include_voiced=True, train_emg_length=CHUNK)


def test_gather_matches_host_collate(train_ds):
    """gather(rows, starts) == ste_gan_collate(items, 'train', starts=...)
    bit-exactly at f32 storage, for random rows/starts incl. edge starts."""
    dc = DeviceCorpus.from_dataset(train_ds, emg_train_length=CHUNK,
                                   float_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    frames = CHUNK // C.HOPSIZE
    rows = rng.integers(0, len(train_ds), size=6)
    # Edge coverage: first item at start 0, one item at its max legal start.
    rows[0], rows[1] = 0, len(train_ds) - 1
    starts = np.asarray([rng.integers(0, 1 + dc.unit_lengths[r] - frames)
                         for r in rows])
    starts[0] = 0
    starts[1] = dc.unit_lengths[rows[1]] - frames

    host = ste_gan_collate([train_ds[int(r)] for r in rows], "train",
                           emg_train_length=CHUNK, starts=starts)
    dev = jax.jit(dc.gather)(jnp.asarray(rows), jnp.asarray(starts))

    for key in (C.DataType.REAL_EMG, C.DataType.SPEECH_UNITS,
                C.DataType.PHONEMES, C.DataType.SESSION_INDEX,
                C.DataType.SPEAKING_MODE_INDEX, C.DataType.MFCCS):
        np.testing.assert_array_equal(
            np.asarray(dev[key]), host[key], err_msg=key)


def test_f16_storage_is_cast_then_crop(train_ds):
    """f16 corpus storage quantizes exactly like the trainer's f16 wire
    format (cast-then-crop == crop-then-cast, elementwise)."""
    dc = DeviceCorpus.from_dataset(train_ds, emg_train_length=CHUNK,
                                   float_dtype=jnp.float16)
    rows = np.asarray([2, 5])
    starts = np.asarray([1, 3])
    host = ste_gan_collate([train_ds[int(r)] for r in rows], "train",
                           emg_train_length=CHUNK, starts=starts)
    dev = dc.gather(jnp.asarray(rows), jnp.asarray(starts))
    for key in (C.DataType.REAL_EMG, C.DataType.SPEECH_UNITS,
                C.DataType.MFCCS):
        np.testing.assert_array_equal(
            np.asarray(dev[key]), host[key].astype(np.float16), err_msg=key)
    np.testing.assert_array_equal(
        np.asarray(dev[C.DataType.PHONEMES]), host[C.DataType.PHONEMES])


def test_index_loader_replays_host_pipeline(train_ds):
    """IndexLoader + gather reproduces the host DataLoader's batches
    example-for-example over multiple epochs (same permutation, same
    crop starts)."""
    def make_loader():
        return DataLoader(train_ds, batch_size=4, partition="train",
                          shuffle=True, emg_train_length=CHUNK, seed=11,
                          drop_last=True)

    dc = DeviceCorpus.from_dataset(train_ds, emg_train_length=CHUNK,
                                   float_dtype=jnp.float32)
    host_loader = make_loader()
    index_loader = IndexLoader(make_loader(), dc.unit_lengths)

    for _ in range(2):  # two epochs: epoch-seeded starts must track
        for host_batch, idx in zip(host_loader, index_loader):
            dev = dc.gather(jnp.asarray(idx["rows"]),
                            jnp.asarray(idx["starts"]))
            for key in (C.DataType.REAL_EMG, C.DataType.SPEECH_UNITS,
                        C.DataType.PHONEMES, C.DataType.SESSION_INDEX):
                np.testing.assert_array_equal(
                    np.asarray(dev[key]), host_batch[key], err_msg=key)


def test_trainer_device_resident_matches_host_pipeline(corpus_root, tmp_path):
    """E2E: the trainer with device_resident_data=True (and K-step dispatch
    on top) reproduces the host-pipeline run — same data order, same math —
    at f32 storage/wire."""
    from tests.test_train_loop import tiny_cfg
    from ste_gan_tpu.train import train_gan

    vals = {}
    for name, resident, k in (("host", False, 1), ("device", True, 2)):
        cfg = tiny_cfg(corpus_root)
        cfg.train.max_steps = 4
        cfg.train.interval_valid = 4
        cfg.train.interval_save = 4
        cfg.train.transfer_dtype = "float32"
        cfg.train.device_resident_data = resident
        cfg.train.steps_per_dispatch = k
        run_dir = tmp_path / f"run_{name}"
        vals[name] = train_gan.train(cfg, run_dir, resume=False, debug=False)
        assert (run_dir / ".done").exists()

    for key in vals["host"]:
        np.testing.assert_allclose(
            vals["device"][key], vals["host"][key], rtol=1e-4, atol=1e-5,
            err_msg=f"{key} diverged between device-resident and host input")


def test_trainer_device_resident_matches_host_on_mesh(corpus_root, tmp_path):
    """Same equality ON THE 8-DEVICE MESH: batch sharded over devices,
    corpus replicated, crop descriptors sharded — the production
    data-parallel + device-resident composition (train_gan.py wires the
    corpus through the jitted step as a pytree argument; the gather runs
    per-device on its batch shard)."""
    import jax

    from tests.test_train_loop import tiny_cfg
    from ste_gan_tpu.train import train_gan

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device virtual CPU mesh")

    vals = {}
    for name, resident in (("host", False), ("device", True)):
        cfg = tiny_cfg(corpus_root)
        cfg.train.batch_size = 8  # one example per device
        cfg.train.data_parallel = 8
        cfg.train.max_steps = 4
        cfg.train.interval_valid = 4
        cfg.train.interval_save = 4
        cfg.train.transfer_dtype = "float32"
        cfg.train.device_resident_data = resident
        run_dir = tmp_path / f"mesh_{name}"
        vals[name] = train_gan.train(cfg, run_dir, resume=False, debug=False)
        assert (run_dir / ".done").exists()

    for key in vals["host"]:
        np.testing.assert_allclose(
            vals["device"][key], vals["host"][key], rtol=1e-4, atol=1e-5,
            err_msg=f"{key} diverged between device-resident and host "
                    "input on the mesh")
