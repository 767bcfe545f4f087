"""k-anonymity / l-diversity release gates: truth tables, suppression
semantics, null handling, plan shape, parallelism invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.privacy import (
    equivalence_classes,
    k_anonymity_report,
    l_diversity_report,
    suppress_below_k,
    violating_classes,
)

ROWS = [
    # (age_band, zip3, disease)
    ("30-40", "021", "flu"),
    ("30-40", "021", "flu"),
    ("30-40", "021", "cold"),
    ("40-50", "021", "flu"),
    ("40-50", "021", "cold"),
    ("50-60", "946", "cancer"),  # singleton class
    ("30-40", None, "flu"),      # null QI forms its own class
    ("30-40", None, "flu"),
]


@pytest.fixture(scope="module")
def pii(spark):
    return spark.createDataFrame(
        ROWS, "age_band string, zip3 string, disease string"
    ).localCheckpoint()


def test_equivalence_classes_truth_table(spark, pii):
    got = {
        (r.age_band, r.zip3): r.n
        for r in equivalence_classes(pii, ["age_band", "zip3"]).collect()
    }
    assert got == {
        ("30-40", "021"): 3,
        ("40-50", "021"): 2,
        ("50-60", "946"): 1,
        ("30-40", "\x00null"): 2,
    }


def test_k_anonymity_report(spark, pii):
    r = k_anonymity_report(pii, ["age_band", "zip3"]).collect()[0]
    assert (r.k_min, r.n_classes, r.n_records, r.n_singleton_classes) == (1, 4, 8, 1)


def test_violating_and_suppress(spark, pii):
    bad = violating_classes(pii, ["age_band", "zip3"], k=2).collect()
    assert [(b.age_band, b.zip3) for b in bad] == [("50-60", "946")]
    kept = suppress_below_k(pii, ["age_band", "zip3"], k=2)
    assert kept.count() == 7
    assert kept.filter(F.col("age_band") == "50-60").count() == 0
    assert kept.columns == pii.columns  # schema preserved
    # post-suppression the gate passes at k=2
    assert k_anonymity_report(kept, ["age_band", "zip3"]).collect()[0].k_min == 2
    # null-QI rows survive as their own (size-2) class
    assert kept.filter(F.col("zip3").isNull()).count() == 2


def test_l_diversity_report(spark, pii):
    got = {
        (r.age_band, r.zip3): (r.n, r.l)
        for r in l_diversity_report(pii, ["age_band", "zip3"], "disease").collect()
    }
    assert got[("30-40", "021")] == (3, 2)   # flu, cold
    assert got[("40-50", "021")] == (2, 2)
    assert got[("50-60", "946")] == (1, 1)   # homogeneity: k=1 AND l=1
    assert got[("30-40", "\x00null")] == (2, 1)  # 2-anonymous but 1-diverse


def test_null_sensitive_not_diverse(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", None)], "g string, s string"
    )
    r = l_diversity_report(df, ["g"], "s").collect()[0]
    assert (r.n, r.l) == (3, 1)


def test_validation(spark, pii):
    with pytest.raises(ValueError):
        equivalence_classes(pii, [])
    with pytest.raises(ValueError):
        suppress_below_k(pii, ["age_band"], 0)


def test_parallelism_invariance(spark, pii):
    key = lambda rows: sorted(map(tuple, rows), key=repr)  # noqa: E731 (None-safe sort)
    a = key(suppress_below_k(pii, ["age_band", "zip3"], 2).collect())
    b = key(suppress_below_k(pii.repartition(7), ["age_band", "zip3"], 2).collect())
    assert a == b


def test_plans_no_python_no_corpus_reshuffle(spark, pii):
    plan = (
        suppress_below_k(pii, ["age_band", "zip3"], 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas", "CartesianProduct"):
        assert marker not in plan
    assert "LeftSemi" in plan
    rep = k_anonymity_report(pii, ["age_band", "zip3"])
    rplan = rep._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in rplan or "partial_min" in rplan
