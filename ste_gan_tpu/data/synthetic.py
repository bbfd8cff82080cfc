"""Synthetic mini-corpus generator with a LEARNABLE cross-modal mapping.

The reference never ships data (the Gaddy & Klein corpus must be downloaded
and preprocessed), and it has no test fixtures at all. This module creates a
structurally faithful synthetic corpus with the exact invariants the real
ETL guarantees (reference: scripts/prep_data_gaddy_and_klein.py:398-407):

* ``len(emg) == 16 * len(units) == 16 * len(phonemes)`` (800 Hz vs 50 Hz),
* ``len(mfccs) == 2 * len(units)`` (100 Hz vs 50 Hz),
* EMG is tanh-bounded to [-1, 1] (reference :282-284),
* utterance ids encode ``{session}__{name}__{speaking_mode}``.

The EMG <-> phoneme/speech-unit relationship is a FIXED GLOBAL mapping
(round-3 redesign; the round-2 corpus drew fresh per-utterance anchor
matrices, which made the cross-utterance mapping pure noise and capped
encoder phoneme accuracy at chance):

* every phoneme has a deterministic speech-unit anchor vector, a per-EMG-
  channel amplitude signature in [0.15, 0.85], and a per-channel band-
  limited carrier frequency in [30, 180] Hz;
* an utterance's EMG channel c is ``gain[session, c] * A[p(t), c] *
  sin(phase_c(t))`` with the carrier phase integrated through time (no
  discontinuities at phoneme boundaries) plus small noise, tanh-squashed;
* speech units are the phoneme anchors plus smoothed low-amplitude noise;
  MFCCs are a fixed linear projection of the units at 2x the frame rate;
* sessions differ by a deterministic per-channel gain in [0.75, 1.25]
  (what the generator's session embedding must learn to compensate).

So: an EMG encoder can decode phonemes/units from the amplitude+frequency
signatures (well above chance), and a generator can synthesise EMG whose
signatures the frozen encoder recognises — the full perceptual-loss
pathway has real structure to learn, and validation metrics move the way
the reference protocol expects (ste_gan/train.py:292-378).

Artifacts are written as ``.npy`` under the reference's directory layout
(``{split}/{emg,units,phonemes,mfccs,emg_feats}/{utt_id}.npy`` plus
``transcriptions/{utt_id}.txt``).
"""
from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import Dict

import numpy as np

from ste_gan_tpu import constants as C

#: Seed namespace for the global (corpus-wide) phoneme/session mappings.
#: Distinct from the per-utterance content seed so regenerating a corpus
#: with a different ``seed`` keeps the SAME underlying mapping.
MAP_SEED = 7321


@lru_cache(maxsize=4)
def global_maps(map_seed: int = MAP_SEED, num_channels: int = C.NUM_EMG_CHANNELS):
    """Deterministic corpus-wide mappings (phoneme anchors/signatures,
    MFCC projection). Cached; identical across utterances and splits."""
    rng = np.random.default_rng(map_seed)
    anchors = rng.normal(0.0, 1.0,
                         size=(C.NUM_PHONEMES, C.SPEECH_UNITS_FEAT_SIZE))
    # Per-phoneme, per-channel amplitude signature and carrier frequency.
    amps = rng.uniform(0.15, 0.85, size=(C.NUM_PHONEMES, num_channels))
    freqs = rng.uniform(30.0, 180.0, size=(C.NUM_PHONEMES, num_channels))
    # 'sil' is quiet: tiny amplitude on every channel.
    sil = C.PHONEME_INVENTORY.index("sil")
    amps[sil] = 0.05
    mfcc_mix = rng.normal(size=(C.SPEECH_UNITS_FEAT_SIZE, C.NUM_MFCCS))
    mfcc_mix /= np.sqrt(C.SPEECH_UNITS_FEAT_SIZE)
    return anchors, amps, freqs, mfcc_mix


def session_gains(session_idx: int, num_channels: int = C.NUM_EMG_CHANNELS,
                  map_seed: int = MAP_SEED) -> np.ndarray:
    """Deterministic per-channel gain for a recording session."""
    rng = np.random.default_rng((map_seed, 77, session_idx))
    return rng.uniform(0.75, 1.25, size=num_channels)


def _smooth(x: np.ndarray, window: int) -> np.ndarray:
    kernel = np.ones(window) / window
    return np.apply_along_axis(
        lambda s: np.convolve(s, kernel, mode="same"), 0, x)


def synth_utterance(rng: np.random.Generator, num_frames: int,
                    session_idx: int, num_channels: int = C.NUM_EMG_CHANNELS,
                    silent: bool = False) -> Dict[str, np.ndarray]:
    """Generate one utterance worth of aligned artifacts.

    ``silent=True`` mimics the real corpus: the unit/phoneme/MFCC targets
    come from a "parallel voiced recording" with a DIFFERENT frame count
    (reference prep stores parallel_speech_units for silent utterances;
    scripts/prep_data_gaddy_and_klein.py:372-379), while the EMG keeps its
    own length — so ``len(emg) != 16 * len(units)`` for silent samples,
    exactly like real silent data. The EMG is built from a time-warped
    version of the target trajectory, so DTW alignment has real structure.
    """
    anchors, amps, freqs, mfcc_mix = global_maps(num_channels=num_channels)
    hop = C.HOPSIZE
    num_emg = num_frames * hop
    if silent:
        num_target_frames = max(8, int(round(
            num_frames * rng.uniform(0.75, 1.25))))
    else:
        num_target_frames = num_frames

    # Phoneme segments: random lengths of 4-20 frames.
    phonemes = np.zeros(num_target_frames, dtype=np.int64)
    pos = 0
    while pos < num_target_frames:
        seg = int(rng.integers(4, 20))
        phonemes[pos:pos + seg] = int(rng.integers(0, C.NUM_PHONEMES))
        pos += seg

    # Speech units: GLOBAL per-phoneme anchors + smoothed low noise.
    units = anchors[phonemes] + 0.15 * rng.normal(
        size=(num_target_frames, C.SPEECH_UNITS_FEAT_SIZE))
    units = _smooth(units, 3).astype(np.float32)

    # MFCCs at 2x the unit rate via the fixed projection.
    mfccs = np.repeat(units @ mfcc_mix, 2, axis=0).astype(np.float32)
    mfccs += 0.1 * rng.normal(size=mfccs.shape).astype(np.float32)

    # EMG trajectory at the utterance's own frame count (linear time-warp of
    # the target trajectory for silent utterances; identity for voiced).
    warp_idx = np.round(np.linspace(0, num_target_frames - 1,
                                    num_frames)).astype(np.int64)
    warped_phonemes = phonemes[warp_idx]

    # EMG: per-channel phoneme signature carriers with continuous phase.
    ph_per_sample = np.repeat(warped_phonemes, hop)          # [num_emg]
    amp = amps[ph_per_sample]                                # [num_emg, C]
    inst_freq = freqs[ph_per_sample]                         # [num_emg, C]
    phase0 = rng.uniform(0, 2 * np.pi, size=num_channels)
    phase = phase0[None, :] + (2 * np.pi / C.EMG_SAMPLE_RATE) * np.cumsum(
        inst_freq, axis=0)
    gain = session_gains(session_idx, num_channels)
    noise = rng.normal(0.0, 0.05, size=(num_emg, num_channels))
    emg = np.tanh(1.2 * gain[None, :] * amp * np.sin(phase)
                  + noise).astype(np.float32)

    # Frame-level EMG features at 100 Hz (placeholder statistics with the
    # right shape: [frames_100hz, channels, 6]).
    n100 = num_frames * 2
    emg_feats = emg[: n100 * (hop // 2)].reshape(n100, hop // 2, num_channels)
    emg_feats = np.stack([
        emg_feats.mean(1), np.square(emg_feats).sum(1),
        np.square(np.abs(emg_feats)).sum(1), np.abs(emg_feats).mean(1),
        (np.diff(np.signbit(emg_feats), axis=1) != 0).mean(1).astype(np.float32),
        np.abs(emg_feats).max(1),
    ], axis=-1).astype(np.float32)

    return {
        "emg": emg,
        "units": units,
        "phonemes": phonemes,
        "mfccs": mfccs,
        "emg_feats": emg_feats,
        "transcription": "synthetic utterance " + " ".join(
            C.PHONEME_INVENTORY[p] for p in phonemes[::16][:8]),
    }


def generate_synthetic_corpus(
    root: Path,
    num_train: int = 24,
    num_valid: int = 6,
    num_test: int = 4,
    num_sessions: int = 4,
    min_frames: int = 130,
    max_frames: int = 260,
    seed: int = 0,
    silent_fraction: float = 0.0,
    num_channels: int = C.NUM_EMG_CHANNELS,
) -> Path:
    """Write a synthetic corpus under ``root`` and return it."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    counts = {"train": num_train, "valid": num_valid, "test": num_test}
    utt_counter = 0
    for split, count in counts.items():
        dirs = {}
        for sub in (C.DataDir.EMG, C.DataDir.SPEECH_UNITS, C.DataDir.PHONEMES,
                    C.DataDir.MFCCS, C.DataDir.EMG_FEATS, C.DataDir.TRANSCRIPTIONS):
            dirs[sub] = root / split / sub
            dirs[sub].mkdir(parents=True, exist_ok=True)
        for _ in range(count):
            session_idx = int(rng.integers(0, num_sessions))
            silent = bool(rng.random() < silent_fraction)
            mode = C.SpeakingMode.SILENT if silent else C.SpeakingMode.NORMAL
            num_frames = int(rng.integers(min_frames, max_frames))
            utt = synth_utterance(rng, num_frames, session_idx,
                                  num_channels=num_channels, silent=silent)
            utt_id = f"sess{session_idx:02d}__utt{utt_counter:05d}__{mode}"
            utt_counter += 1
            np.save(dirs[C.DataDir.EMG] / f"{utt_id}.npy", utt["emg"])
            np.save(dirs[C.DataDir.SPEECH_UNITS] / f"{utt_id}.npy", utt["units"])
            np.save(dirs[C.DataDir.PHONEMES] / f"{utt_id}.npy", utt["phonemes"])
            np.save(dirs[C.DataDir.MFCCS] / f"{utt_id}.npy", utt["mfccs"])
            np.save(dirs[C.DataDir.EMG_FEATS] / f"{utt_id}.npy", utt["emg_feats"])
            (dirs[C.DataDir.TRANSCRIPTIONS] / f"{utt_id}.txt").write_text(
                utt["transcription"])
    return root


def main() -> None:
    """CLI: (re)generate the development corpus (data/ is gitignored —
    regenerate after a fresh checkout; deterministic for a given seed)."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="data/synthetic")
    ap.add_argument("--num_train", type=int, default=96)
    ap.add_argument("--num_valid", type=int, default=24)
    ap.add_argument("--num_test", type=int, default=16)
    ap.add_argument("--num_sessions", type=int, default=4)
    ap.add_argument("--min_frames", type=int, default=130)
    ap.add_argument("--max_frames", type=int, default=260)
    ap.add_argument("--silent_fraction", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    # Regeneration must start clean: utterance ids encode the (seeded)
    # session assignment, so a parameter change would otherwise leave
    # stale files from the previous corpus mixed in.
    root = Path(args.root)
    if root.exists():
        import shutil

        shutil.rmtree(root)
    root = generate_synthetic_corpus(
        Path(args.root), num_train=args.num_train, num_valid=args.num_valid,
        num_test=args.num_test, num_sessions=args.num_sessions,
        min_frames=args.min_frames, max_frames=args.max_frames,
        seed=args.seed, silent_fraction=args.silent_fraction)
    print(f"synthetic corpus written to {root}")


if __name__ == "__main__":
    main()
