"""Classifier unit semantics: column-expression scoring, default-0 on
missing features, explode+agg threshold sweep (A7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.classifier import (
    LinearModel,
    score_pairs,
    threshold_grid,
    tune_threshold,
)


def test_score_expr_sigmoid(spark):
    model = LinearModel(weights=[2.0, -1.0], intercept=0.5, feature_names=("f1", "f2"))
    df = spark.createDataFrame([(1.0, 1.0), (0.0, 0.0)], "f1 double, f2 double")
    import math

    rows = score_pairs(df, model).collect()
    assert rows[0].score == pytest.approx(1 / (1 + math.exp(-1.5)))
    assert rows[1].score == pytest.approx(1 / (1 + math.exp(-0.5)))


def test_score_missing_features_default_zero(spark):
    model = LinearModel(weights=[1.0], intercept=5.0, feature_names=("f1",))
    df = spark.createDataFrame([(None,), (1.0,)], "f1 double")
    rows = score_pairs(df, model).collect()
    assert rows[0].score == 0.0 and rows[0].pred == 0
    assert rows[1].score > 0.9


def test_threshold_grid_matches_reference():
    g = threshold_grid()
    assert g[0] == 0.10 and g[-1] == 0.95 and len(g) == 18


def test_tune_threshold_exact(spark):
    # scores 0.2/0.4/0.6/0.8, labels 0/0/1/1 -> any tau in (0.4, 0.6] gives
    # F1=1; sweep grid hits 0.45; ties break to the lowest tau
    df = spark.createDataFrame(
        [(0, 0.2), (0, 0.4), (1, 0.6), (1, 0.8)], "label int, score double"
    )
    tau, f1 = tune_threshold(df)
    assert f1 == 1.0
    assert tau == pytest.approx(0.45)


def test_model_roundtrip():
    m = LinearModel(weights=[1.0, 2.0], intercept=-0.5, threshold=0.6)
    m2 = LinearModel.from_dict(m.to_dict())
    assert m2 == m


def test_explain_pairs_hand_computed(spark):
    from record_linkage_spark.operators.classifier import explain_pairs

    model = LinearModel(
        weights=[2.0, -1.0, 0.5], intercept=0.0, threshold=0.5,
        feature_names=("f1", "f2", "f3"),
    )
    df = spark.createDataFrame(
        [("a", "b", 1.0, 1.0, None), ("a", "c", 0.0, 0.5, 1.0)],
        "id_A string, id_B string, f1 double, f2 double, f3 double",
    )
    out = explain_pairs(df, model, top_k=3)
    ab = [
        (r.rank, r.feature, r.value, r.contribution)
        for r in out.filter("id_B = 'b'").orderBy("rank").collect()
    ]
    # missing f3 explains as 0; |2.0| > |-1.0| > 0
    assert ab == [(1, "f1", 1.0, 2.0), (2, "f2", 1.0, -1.0), (3, "f3", 0.0, 0.0)]
    # the missing-feature pair scores 0 (score_pairs default-0 convention)
    assert out.filter("id_B = 'b'").first().score == 0.0
    ac = [
        (r.rank, r.feature, r.contribution)
        for r in out.filter("id_B = 'c'").orderBy("rank").collect()
    ]
    # contributions 0.0, -0.5, 0.5: |−0.5| == |0.5| ties break on name
    assert ac == [(1, "f2", -0.5), (2, "f3", 0.5), (3, "f1", 0.0)]


def test_explain_pairs_top_k_and_score_consistency(spark):
    from record_linkage_spark.operators.classifier import (
        explain_pairs,
        score_pairs,
    )

    model = LinearModel(
        weights=[1.5, 0.5], intercept=-1.0, threshold=0.5,
        feature_names=("f1", "f2"),
    )
    df = spark.createDataFrame(
        [("a", "b", 1.0, 1.0)], "id_A string, id_B string, f1 double, f2 double"
    )
    out = explain_pairs(df, model, top_k=1).collect()
    assert len(out) == 1 and out[0].feature == "f1"
    want = score_pairs(df, model).first().score
    assert out[0].score == want
