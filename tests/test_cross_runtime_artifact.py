"""Machine-checked invariants of the committed trained-weights
cross-runtime proof (benchmarks/cross_runtime_trained.json, produced by
benchmarks/cross_runtime_trained.py — VERDICT r4 #7).

tests/test_torch_export.py proves fresh-parameter export equivalence;
this artifact proves the FLAGSHIP TRAINED checkpoint round-trips: the
reference torch generator, strict-loading our exported state_dict,
reproduces our bucketed production inference sample-for-sample on the
held-out test split."""
import json
from pathlib import Path

import pytest

ART = (Path(__file__).resolve().parents[1] / "benchmarks"
       / "cross_runtime_trained.json")


@pytest.fixture(scope="module")
def proof():
    if not ART.exists():
        pytest.skip("cross-runtime artifact not yet generated")
    return json.loads(ART.read_text())


def test_trained_checkpoint_not_fresh_params(proof):
    """The comparison used a real training artifact (a 20k+-step
    checkpoint), not an initialisation."""
    assert proof["checkpoint_step"] > 10_000
    assert "exp/" in proof["run_dir"]


def test_full_test_split_compared(proof):
    assert proof["num_utterances"] >= 32
    assert len(proof["per_utterance"]) == proof["num_utterances"]


def test_runtimes_agree_within_gates(proof):
    assert proof["passed"] is True
    assert proof["max_abs_diff"] < proof["gates"]["max_abs"]
    assert proof["mean_abs_diff"] < proof["gates"]["mean_abs"]
    # Every utterance individually agrees (no outlier hidden by the mean).
    for u in proof["per_utterance"]:
        assert u["max_abs"] < proof["gates"]["max_abs"], u
