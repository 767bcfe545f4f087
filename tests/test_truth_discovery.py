"""Truth discovery (ACCU-style): the copied-wrong-value-outvotes-
majority scenario, learned source accuracies, tie-break determinism,
and parallelism invariance."""

import pytest

from record_linkage_spark.operators.truth_discovery import truth_discovery

SCHEMA = "entity_id bigint, attr string, source_id string, value string"

# Calibration facts 1-5: G and H claim the truth, B1/B2 each claim their
# own wrong value. Target fact 6: H is silent, B1 and B2 COPY the same
# wrong value "Y" — majority says Y (2-1), learned accuracy says X.
CLAIMS = (
    [(i, "city", "G", f"true{i}") for i in range(1, 6)]
    + [(i, "city", "H", f"true{i}") for i in range(1, 6)]
    + [(i, "city", "B1", f"wrongb1_{i}") for i in range(1, 6)]
    + [(i, "city", "B2", f"wrongb2_{i}") for i in range(1, 6)]
    + [(6, "city", "G", "X"), (6, "city", "B1", "Y"), (6, "city", "B2", "Y")]
)


def _run(spark, claims, **kw):
    df = spark.createDataFrame(claims, SCHEMA)
    truths, srcs = truth_discovery(df, **kw)
    t = {(r.entity_id, r.attr): r for r in truths.collect()}
    a = {r.source_id: r.accuracy for r in srcs.collect()}
    return t, a


def test_accuracy_weighted_vote_overturns_copied_majority(spark):
    t, a = _run(spark, CLAIMS)
    assert t[(6, "city")].value == "X"          # not the 2-source copy "Y"
    for i in range(1, 6):
        assert t[(i, "city")].value == f"true{i}"
    assert a["G"] > a["B1"] and a["G"] > a["B2"]
    assert a["H"] > a["B1"]


def test_single_iteration_is_majority_vote(spark):
    """With one iteration (uniform prior), the argmax IS majority vote —
    the copied wrong value wins. The fixpoint is what fixes it."""
    t, _ = _run(spark, CLAIMS, iterations=1)
    assert t[(6, "city")].value == "Y"


def test_tie_breaks_to_smallest_value(spark):
    claims = [(1, "a", "S1", "beta"), (1, "a", "S2", "alpha")]
    t, _ = _run(spark, claims)
    assert t[(1, "a")].value == "alpha"


def test_null_claims_ignored_and_counts(spark):
    claims = CLAIMS + [(7, "city", "G", None)]
    df = spark.createDataFrame(claims, SCHEMA)
    truths, srcs = truth_discovery(df)
    assert truths.filter("entity_id = 7").count() == 0
    n = {r.source_id: r.n_claims for r in srcs.collect()}
    assert n["G"] == 6  # the null claim does not count
    t6 = truths.filter("entity_id = 6").collect()[0]
    assert t6.n_sources == 1  # X claimed by G alone


def test_parallelism_invariance(spark):
    df = spark.createDataFrame(CLAIMS, SCHEMA)
    t1, s1 = truth_discovery(df.coalesce(1))
    t2, s2 = truth_discovery(df.repartition(7))
    key_t = lambda d: sorted(  # noqa: E731
        (r.entity_id, r.attr, r.value, round(r.score, 9)) for r in d.collect()
    )
    key_s = lambda d: sorted(  # noqa: E731
        (r.source_id, round(r.accuracy, 12)) for r in d.collect()
    )
    assert key_t(t1) == key_t(t2)
    assert key_s(s1) == key_s(s2)


def test_accuracies_clamped(spark):
    """A source that is right everywhere must not blow up the vote
    (ln(1/0)): accuracy stays <= max_accuracy's smoothing bound."""
    claims = [(i, "a", "P", f"v{i}") for i in range(1, 4)]
    t, a = _run(spark, claims)
    assert a["P"] < 1.0
    for i in range(1, 4):
        assert t[(i, "a")].value == f"v{i}"
