"""Machine-checked invariants of the round-5 SEEDED adversarial-ablation
study (benchmarks/adversarial_ablation_r5.json, produced on the real TPU
by benchmarks/adversarial_ablation.py — VERDICT r4 #1 + #4).

The round-4 study was one seed per arm with FED over 32 utterances; this
one is >=3 seeds per arm on the HARD corpus with FED over the full
128-utterance test split and paired utterance-bootstrap CIs on the
full-vs-no_adv deltas. Structural invariants here; the outcome
assertions at the bottom encode the committed result."""
import json
from pathlib import Path

import pytest

ART = (Path(__file__).resolve().parents[1] / "benchmarks"
       / "adversarial_ablation_r5.json")
ARMS = ("full", "no_adv", "td_only")


@pytest.fixture(scope="module")
def study():
    if not ART.exists():
        pytest.skip("round-5 ablation artifacts not yet generated")
    return json.loads(ART.read_text())


def test_seeded_matched_budgets(study):
    assert study["steps"] >= 5000
    assert len(study["seeds"]) >= 3
    for seed in study["seeds"]:
        for arm in ARMS:
            run = study[f"{arm}_s{seed}"]
            assert run["seed"] == seed
            # FED over the full hard-corpus test split, not a subset.
            assert run["test_realism"]["num_utterances"] >= 100
            assert run["val_su_series"], (arm, seed)


def test_hard_corpus_not_saturated(study):
    """The de-saturation worked: no arm pins phoneme accuracy at ~100%
    (the old corpus's failure mode that motivated VERDICT r4 #4)."""
    assert "hard" in study["data"]
    for seed in study["seeds"]:
        for arm in ("full", "no_adv"):
            acc = study[f"{arm}_s{seed}"]["test_chunked"][
                "val/phoneme_accuracy_avg"]
            assert 20.0 < acc < 98.0, (arm, seed, acc)


def test_aggregate_consistent_with_runs(study):
    agg = study["aggregate"]
    for arm in ARMS:
        per_seed = agg[arm]["fed"]["per_seed"]
        assert len(per_seed) == len(study["seeds"])
        for i, seed in enumerate(study["seeds"]):
            want = study[f"{arm}_s{seed}"]["test_realism"]["fed"]
            assert abs(per_seed[i] - want) < 1e-3


def test_bootstrap_structure(study):
    boots = study["bootstrap_full_vs_no_adv"]
    assert [b["seed"] for b in boots] == study["seeds"]
    for b in boots:
        assert b["n_boot"] >= 100
        assert b["n_utterances"] >= 100
        for key in ("fed", "lsd_db"):
            lo, hi = b[key]["ci95"]
            assert lo <= hi
            # Point estimate inside (or at) the percentile interval.
            assert lo - 1e-6 <= b[key]["boot_mean"] <= hi + 1e-6


def test_headline_fed_intervals_do_not_overlap(study):
    """The committed result: the adversarial arm's FED beats no_adv with
    NON-OVERLAPPING cross-seed intervals (mean +- 2 std) — the round-4
    point estimate now has error bars and survives them."""
    full, na = study["aggregate"]["full"]["fed"], study["aggregate"]["no_adv"]["fed"]
    assert full["mean"] + 2 * full["std"] < na["mean"] - 2 * na["std"]


def test_every_seed_bootstrap_ci_excludes_zero(study):
    """Paired utterance bootstrap: on EVERY seed, the 95% CI of both the
    FED and LSD full-minus-no_adv deltas sits entirely below zero."""
    for b in study["bootstrap_full_vs_no_adv"]:
        assert b["fed"]["ci95"][1] < 0, b
        assert b["lsd_db"]["ci95"][1] < 0, b
        assert b["fed"]["frac_a_better"] == 1.0


def test_td_only_calibrates_the_scale(study):
    agg = study["aggregate"]
    assert agg["td_only"]["fed"]["mean"] > 5 * agg["no_adv"]["fed"]["mean"]
    assert agg["td_only"]["phone_acc"]["mean"] < 50.0


def test_optimized_axes_stay_close(study):
    """The deltas live on the non-optimized axes: the directly optimized
    SU error and phoneme accuracy differ between the perceptual arms by
    far less than the realism axes do (SU within 15%, accuracy within 4
    points) — which is why the realism family was needed at all."""
    agg = study["aggregate"]
    su_f, su_n = agg["full"]["test_su"]["mean"], agg["no_adv"]["test_su"]["mean"]
    assert abs(su_f - su_n) < 0.15 * max(su_f, su_n)
    assert abs(agg["full"]["phone_acc"]["mean"]
               - agg["no_adv"]["phone_acc"]["mean"]) < 4.0


def test_report_committed_and_consistent(study):
    report = ART.parent / "ablation_r5" / "REPORT.md"
    assert report.exists()
    text = report.read_text()
    assert "LOAD-BEARING" in text or "MIXED/NEGATIVE" in text
    mean_fed = study["aggregate"]["full"]["fed"]["mean"]
    assert f"{mean_fed:.3f}" in text
