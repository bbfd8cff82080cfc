"""Machine-checked invariants of the ROUND-4 adversarial-ablation study
(benchmarks/adversarial_ablation.json — VERDICT r3 #1; historical: one
seed per arm on the synthetic_large corpus, FED over 32 utterances).

The claim under test: the discriminators are LOAD-BEARING, not just
correct. Three matched runs (full / no_adv / td_only) scored on held-out
data with distribution-level metrics no arm optimises directly. These
assertions re-check the committed result on every test run without
re-training. The statistically hardened round-5 study (>=3 seeds, full
test split, paired bootstrap CIs, hard corpus) is pinned separately in
tests/test_ablation_r5_artifacts.py."""
import json
from pathlib import Path

import pytest

ART = (Path(__file__).resolve().parents[1] / "benchmarks"
       / "adversarial_ablation.json")


@pytest.fixture(scope="module")
def study():
    if not ART.exists():
        pytest.skip("ablation artifacts not yet generated")
    return json.loads(ART.read_text())


def test_all_arms_ran_matched_budgets(study):
    assert study["steps"] >= 5000
    for arm in ("full", "no_adv", "td_only"):
        assert study[arm]["test_realism"]["num_utterances"] > 0
        assert study[arm]["val_su_series"], arm


def test_adversarial_pathway_improves_nonoptimized_axes(study):
    """The headline: with the paired (optimized) metrics matched, the
    adversarial arm wins the purely non-optimized realism axes — Fréchet
    encoder distance and spectral texture — by a wide margin."""
    full = study["full"]["test_realism"]
    no_adv = study["no_adv"]["test_realism"]
    assert full["fed"] < 0.8 * no_adv["fed"], (full["fed"], no_adv["fed"])
    assert (full["log_spectral_distance"]["mean_db"]
            < 0.8 * no_adv["log_spectral_distance"]["mean_db"])


def test_optimized_metrics_do_not_separate_the_arms(study):
    """On the directly optimized axes the two perceptual arms are
    indistinguishable (within 5%) — exactly why a realism metric was
    needed to see the discriminators' contribution at all."""
    su_full = study["full"]["test_chunked"]["val/speech_unit"]
    su_na = study["no_adv"]["test_chunked"]["val/speech_unit"]
    assert abs(su_full - su_na) < 0.05 * max(su_full, su_na)
    acc_full = study["full"]["test_chunked"]["val/phoneme_accuracy_avg"]
    acc_na = study["no_adv"]["test_chunked"]["val/phoneme_accuracy_avg"]
    assert abs(acc_full - acc_na) < 2.0  # percentage points


def test_td_only_calibrates_the_scale(study):
    """Removing the perceptual pathway entirely blows up FED and
    collapses phoneme accuracy — the dynamic range that makes the
    full-vs-no_adv deltas meaningful rather than noise."""
    td = study["td_only"]
    assert td["test_realism"]["fed"] > 10 * study["no_adv"]["test_realism"]["fed"]
    assert (td["test_chunked"]["val/speech_unit"]
            > 3 * study["full"]["test_chunked"]["val/speech_unit"])
    assert td["test_chunked"]["val/phoneme_accuracy_avg"] < 80.0


def test_report_is_committed_and_consistent(study):
    report = ART.parent / "ablation_r4" / "REPORT.md"
    assert report.exists()
    text = report.read_text()
    assert "LOAD-BEARING" in text or "MIXED/NEGATIVE" in text
    # The table carries the same FED numbers as the JSON.
    assert f"{study['full']['test_realism']['fed']:.3f}" in text
