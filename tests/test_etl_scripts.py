"""End-to-end tests of the offline ETL scripts on a synthetic raw
Gaddy&Klein session tree: clean_audio.py (spectral-gate fallback) and
prep_data_gaddy_and_klein.py (full pipeline with a deterministic HuBERT
stub), asserting the artifact invariants of the reference prep
(scripts/prep_data_gaddy_and_klein.py:398-407) and split routing of silent
utterances' voiced references."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

from ste_gan_tpu import constants as C
from ste_gan_tpu.data.dataset import EMGDataset
from ste_gan_tpu.etl.audio_dsp import read_audio_file, write_audio_file

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import clean_audio  # noqa: E402
import prep_data_gaddy_and_klein as prep  # noqa: E402


SR = 16_000


class HubertStub:
    """Deterministic Soft-HuBERT stand-in: 50 Hz / 256-dim units derived
    from 320-sample audio windows through a fixed random projection."""

    def __init__(self, seed: int = 0):
        self._mix = np.random.default_rng(seed).normal(
            size=(320, 256)).astype(np.float32)

    def units(self, audio_t):
        import torch

        audio = audio_t.squeeze().numpy()
        frames = len(audio) // 320
        windows = audio[: frames * 320].reshape(frames, 320)
        return torch.from_numpy((windows @ self._mix)[None])


def _textgrid(duration: float, phones) -> str:
    """Long-format TextGrid with a 'phones' tier covering [0, duration]."""
    n = len(phones)
    edges = np.linspace(0.0, duration, n + 1)
    intervals = "\n".join(
        f"""        intervals [{i + 1}]:
            xmin = {edges[i]:.4f}
            xmax = {edges[i + 1]:.4f}
            text = "{ph}" """
        for i, ph in enumerate(phones))
    return f"""File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = {duration:.4f}
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = {duration:.4f}
        intervals: size = {n}
{intervals}
"""


def _write_session(session_dir: Path, align_dir: Path, rng,
                   utterances) -> None:
    """``utterances``: list of (index, text, book, sentence_index,
    duration_s) tuples; index 0 is the silence/noise clip."""
    session_dir.mkdir(parents=True, exist_ok=True)
    tg_dir = align_dir / session_dir.name
    tg_dir.mkdir(parents=True, exist_ok=True)
    for index, text, book, sent, dur in utterances:
        n_audio = int(dur * SR)
        n_emg = int(dur * 1000)  # raw EMG at 1 kHz
        tone = 0.3 * np.sin(2 * np.pi * 220 * np.arange(n_audio) / SR)
        noise = 0.02 * rng.normal(size=n_audio)
        audio = (noise if sent < 0 else tone + noise).astype(np.float32)
        write_audio_file(session_dir / f"{index}_audio.flac", audio, SR)
        emg = rng.normal(0.0, 20.0, size=(n_emg, 8)).astype(np.float64)
        np.save(session_dir / f"{index}_emg.npy", emg)
        (session_dir / f"{index}_info.json").write_text(json.dumps({
            "text": text, "book": book, "sentence_index": sent}))
        if sent >= 0:
            (tg_dir / f"{session_dir.name}_{index}_audio.TextGrid").write_text(
                _textgrid(dur, ["sil", "ah", "b", "sil"]))


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """voiced_parallel session (3 utts), silent_parallel session (2 utts
    whose book locations match voiced ones), nonparallel session (1 utt)."""
    root = tmp_path_factory.mktemp("raw")
    src = root / "emg_data"
    align = root / "text_alignments"
    rng = np.random.default_rng(42)

    _write_session(src / "voiced_parallel_data" / "v_sess", align, rng, [
        (0, "", "book1", -1, 1.0),
        (1, "hello world", "book1", 10, 2.0),
        (2, "second utterance", "book1", 11, 2.56),
        (3, "third utterance", "book1", 12, 2.0),
    ])
    _write_session(src / "silent_parallel_data" / "s_sess", align, rng, [
        (0, "", "book1", -1, 1.0),
        (1, "hello world", "book1", 10, 2.56),       # dev book location
        (2, "second utterance", "book1", 11, 2.0),   # test book location
    ])
    _write_session(src / "nonparallel_data" / "n_sess", align, rng, [
        (0, "", "book2", -1, 1.0),
        (1, "nonparallel utterance", "book2", 50, 2.0),
    ])
    (root / "testset_largedev.json").write_text(json.dumps({
        "dev": [["book1", 10]], "test": [["book1", 11]]}))
    return root


def test_clean_audio_spectral_gate_fallback(raw_tree, monkeypatch):
    """clean_audio.py end to end (no noisereduce/speechbrain in this image:
    the scipy spectral-gate fallback runs). Cleaned files appear; tone
    content survives while noise-only energy drops."""
    monkeypatch.setattr(sys, "argv", [
        "clean_audio.py", "--source_data_dir", str(raw_tree / "emg_data")])
    clean_audio.main()

    v_sess = raw_tree / "emg_data" / "voiced_parallel_data" / "v_sess"
    cleaned = sorted(v_sess.glob("*_audio_clean.*"))
    assert len(cleaned) == 4  # incl. the noise clip itself
    raw, _ = read_audio_file(v_sess / "1_audio.wav")
    out, sr = read_audio_file(v_sess / "1_audio_clean.wav")
    assert sr == SR and len(out) == len(raw)
    assert np.all(np.isfinite(out))
    # Idempotent without --overwrite.
    assert clean_audio.clean_directory(v_sess) == 0


def test_prep_pipeline_end_to_end(raw_tree, monkeypatch, tmp_path):
    """prep_data_gaddy_and_klein.py main() with a HuBERT stub: artifact
    invariants, EMG scaling, silent parallel targets, and split routing."""
    target = tmp_path / "corpus"
    monkeypatch.setattr(prep, "load_hubert", lambda *a, **k: HubertStub())
    monkeypatch.setattr(sys, "argv", [
        "prep_data_gaddy_and_klein.py",
        "--source_data_dir", str(raw_tree / "emg_data"),
        "--text_alignment_dir", str(raw_tree / "text_alignments"),
        "--testset_file", str(raw_tree / "testset_largedev.json"),
        "--target_dir", str(target),
    ])
    prep.main()

    # Split routing: silent utt with the dev book location -> valid, its
    # voiced reference too; test book location -> test; the rest -> train.
    valid_emg = sorted((target / "valid" / "emg").glob("*.npy"))
    test_emg = sorted((target / "test" / "emg").glob("*.npy"))
    train_emg = sorted((target / "train" / "emg").glob("*.npy"))
    valid_ids = [p.stem for p in valid_emg]
    test_ids = [p.stem for p in test_emg]
    assert any("s_sess__1__silent" in u for u in valid_ids)
    assert any("v_sess__1__normal" in u for u in valid_ids)
    assert any("s_sess__2__silent" in u for u in test_ids)
    assert any("v_sess__2__normal" in u for u in test_ids)
    assert len(train_emg) == 2  # v_sess utt 3 + n_sess utt 1

    # Artifact invariants (reference prep :398-407).
    for split_dir in (target / "train", target / "valid", target / "test"):
        for emg_path in (split_dir / "emg").glob("*.npy"):
            utt = emg_path.stem
            emg = np.load(emg_path)
            units = np.load(split_dir / "units" / f"{utt}.npy")
            phonemes = np.load(split_dir / "phonemes" / f"{utt}.npy")
            feats = np.load(split_dir / "emg_feats" / f"{utt}.npy")
            mfccs = np.load(split_dir / "mfccs" / f"{utt}.npy")
            assert len(units) == len(phonemes)
            assert len(mfccs) == 2 * len(units)
            assert np.all(np.abs(emg) <= 1.0)  # tanh(emg/100)
            assert emg.shape[1] == 8 and units.shape[1] == 256
            if utt.endswith(C.SpeakingMode.NORMAL):
                assert len(emg) == 16 * len(units)
                assert len(feats) == 2 * len(units)
            assert (split_dir / "transcriptions" / f"{utt}.txt").exists()
            assert list((split_dir / "audio").glob(f"{utt}.*"))

    # The emitted tree loads through the framework dataset (strict mode).
    train_ds = EMGDataset(target, partition="train", strict=True,
                          filter_by_length=False, only_include_voiced=False)
    assert len(train_ds) == 2
    item = train_ds[0]
    assert item[C.DataType.REAL_EMG].shape[1] == 8

    # Silent utterances carry the PARALLEL voiced recording's units: the
    # valid silent utt's units equal its voiced reference's units.
    sil = next(u for u in valid_ids if "s_sess__1" in u)
    ref = next(u for u in valid_ids if "v_sess__1" in u)
    np.testing.assert_allclose(
        np.load(target / "valid" / "units" / f"{sil}.npy"),
        np.load(target / "valid" / "units" / f"{ref}.npy"))


def test_clean_audio_enhancement_branch_with_stub_stack(raw_tree, tmp_path,
                                                        monkeypatch):
    """The noisereduce + speechbrain MetricGAN+ branch (the reference's
    stack; reference scripts/clean_audio.py:74-97) executes end to end when
    those packages import — verified here with protocol-checking stub
    modules injected into sys.modules (the real packages are absent in this
    image; the fallback path is covered by
    test_clean_audio_spectral_gate_fallback). The noisereduce stub speaks
    the 1.x API the reference used (audio_clip/noise_clip) and REJECTS the
    2.x call, so the version-compat dispatch in clean_audio.denoise is
    exercised; the enhancer stub checks the reference's call protocol and
    that the model is loaded once per process, not per file."""
    import types

    import torch

    calls = {"reduce": 0, "enhance": 0, "from_hparams": 0}

    fake_nr = types.ModuleType("noisereduce")

    def reduce_noise(**kwargs):
        if "y" in kwargs:  # 2.x call — this stub is a 1.x install
            raise TypeError("reduce_noise() got an unexpected keyword 'y'")
        y, y_noise = kwargs["audio_clip"], kwargs["noise_clip"]
        assert y.ndim == 1 and y_noise.ndim == 1
        calls["reduce"] += 1
        return y * 0.5

    fake_nr.reduce_noise = reduce_noise

    class FakeEnhancer:
        @classmethod
        def from_hparams(cls, source, savedir):
            assert source == "speechbrain/metricgan-plus-voicebank"
            assert "metricgan" in savedir
            calls["from_hparams"] += 1
            return cls()

        def enhance_batch(self, noisy, lengths):
            # The reference's call protocol: [1, T] float batch + relative
            # lengths tensor (reference clean_audio.py:86-92).
            assert isinstance(noisy, torch.Tensor) and noisy.ndim == 2
            assert noisy.shape[0] == 1 and noisy.dtype == torch.float32
            assert float(lengths[0]) == 1.0
            calls["enhance"] += 1
            return noisy * 2.0

    fake_sb = types.ModuleType("speechbrain")
    fake_sb_pre = types.ModuleType("speechbrain.pretrained")
    fake_sb_pre.SpectralMaskEnhancement = FakeEnhancer
    fake_sb.pretrained = fake_sb_pre
    monkeypatch.setitem(sys.modules, "noisereduce", fake_nr)
    monkeypatch.setitem(sys.modules, "speechbrain", fake_sb)
    monkeypatch.setitem(sys.modules, "speechbrain.pretrained", fake_sb_pre)
    monkeypatch.setattr(clean_audio, "_ENHANCER", None)

    # Fresh session dir so earlier tests' _clean outputs don't interfere.
    rng = np.random.default_rng(7)
    sess = tmp_path / "emg_data" / "voiced_parallel_data" / "e_sess"
    _write_session(sess.parent / "e_sess", tmp_path / "align", rng, [
        (0, "", "book1", -1, 1.0),
        (1, "enhanced utterance", "book1", 99, 2.0),
    ])
    n = clean_audio.clean_directory(sess)
    assert n == 2  # noise clip + utterance
    assert calls["reduce"] == 2 and calls["enhance"] == 2
    assert calls["from_hparams"] == 1  # loaded once, reused per file
    raw, _ = read_audio_file(sess / "1_audio.wav")
    out, _ = read_audio_file(sess / "1_audio_clean.wav")
    assert len(out) == len(raw) and np.all(np.isfinite(out))
