"""Machine-checked invariants of the committed long-horizon training run
(benchmarks/stability_r2, produced by benchmarks/stability_report.py from a
5,000-step fused-step run on the synthetic_large corpus — VERDICT r1 item 1).

These assertions run against the committed artifacts, so every test run
re-checks the stability claim without re-training."""
import json
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parents[1] / "benchmarks" / "stability_r2"


@pytest.fixture(scope="module")
def summary():
    path = ART / "summary.json"
    if not path.exists():
        pytest.skip("stability artifacts not yet generated")
    return json.loads(path.read_text())


def test_ran_long_horizon(summary):
    assert summary["steps"] >= 5_000
    assert summary["val_speech_unit"]["n"] >= 10  # validation every 500


def test_val_speech_unit_error_improves(summary):
    su = summary["val_speech_unit"]
    assert su["best"] < su["first"], (su["best"], su["first"])
    assert su["last"] < su["first"], (su["last"], su["first"])


def test_val_td_error_improves(summary):
    td = summary["val_multi_td"]
    assert td["last"] < td["first"]


def test_losses_stay_bounded(summary):
    g = summary["train_loss_generator"]
    d = summary["train_loss_discriminator"]
    # No divergence: the worst logged value stays within a small factor of
    # the initial value, and the final values are finite and below start.
    assert g["max"] <= 2.0 * g["first"]
    assert g["last"] < g["first"]
    assert d["max"] <= 4.0 * d["first"]
    assert 0.0 <= d["last"] <= d["first"]


def test_su_series_monotone_trend(summary):
    """The SU validation curve's second half averages below its first half
    (improvement is sustained, not a single lucky point)."""
    series = [v for _, v in summary["val_speech_unit_series"]]
    half = len(series) // 2
    first, second = series[:half], series[half:]
    assert sum(second) / len(second) <= sum(first) / len(first)
