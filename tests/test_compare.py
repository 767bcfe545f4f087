"""Multi-strategy x multi-model comparison report (reference E3,
``src/evaluation/compare.py:178-197``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.ground_truth import build_ground_truth
from record_linkage_spark.operators.rollup import rollup_conversations
from record_linkage_spark.plans.compare import MODELS, compare_report
from record_linkage_spark.synth.transcripts import (
    generate_transcripts,
    hidden_key_table,
    transcripts_table,
)


@pytest.fixture(scope="module")
def report(spark):
    raw = generate_transcripts(spark, n_entities=150, dup_rate=2.0)
    profiles = rollup_conversations(transcripts_table(raw))
    keys = hidden_key_table(raw).select("conv_id", "entity_key")
    gt = build_ground_truth(profiles, keys, neg_ratio=2.0)
    return compare_report(gt, profiles)


def test_full_grid_emitted(report):
    cells = {(r["strategy"], r["model"]) for r in report}
    assert cells == {(s, m) for s in ("B1", "B2") for m in MODELS}
    assert len(report) == 6


def test_reference_report_fields(report):
    # same field names as the reference's pipeline_report.json rows
    expected = {
        "strategy", "model", "blocking_recall", "n_test_pairs",
        "n_candidates", "reduction_ratio_vs_test", "tp", "fp", "fn", "tn",
        "precision_global", "recall_global", "f1_global",
        "precision_candidates", "recall_candidates", "f1_candidates",
        "threshold_used", "inference_time_sec",
    }
    for r in report:
        assert set(r) == expected


def test_b2_is_recall_bound_by_blocking(report):
    """B2's tighter cascade prunes positives; global recall can never
    exceed blocking recall (the reference's B2 rows show the same bound)."""
    by = {(r["strategy"], r["model"]): r for r in report}
    for m in MODELS:
        b1, b2 = by[("B1", m)], by[("B2", m)]
        assert b2["blocking_recall"] <= b1["blocking_recall"]
        assert b2["recall_global"] <= b2["blocking_recall"] + 1e-9
        # candidate-level scoring stays strong for the feature models
    assert by[("B1", "lr")]["f1_candidates"] >= 0.95


def test_blocking_stats_consistent(report):
    for r in report:
        assert r["n_candidates"] <= r["n_test_pairs"]
        assert r["tp"] + r["fn"] + r["fp"] + r["tn"] == r["n_test_pairs"]
