"""Fellegi-Sunter: hand-computed m/u estimation, log2 weight arithmetic,
and the three-way decision band."""

from math import log2

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.fellegi_sunter import (
    estimate_mu,
    fs_classify,
    fs_score,
)


def _labeled(spark):
    # 4 matches, 4 non-matches; f1 agrees on 3/4 matches and 1/4
    # non-matches; f2 agrees on 4/4 matches and 0/4 non-matches
    rows = [
        (1, 1.0, 1.0), (1, 1.0, 1.0), (1, 1.0, 1.0), (1, 0.0, 1.0),
        (0, 1.0, 0.0), (0, 0.0, 0.0), (0, 0.0, 0.0), (0, 0.0, 0.0),
    ]
    return spark.createDataFrame(rows, "label int, f1 double, f2 double")


def test_estimate_mu_laplace(spark):
    w = estimate_mu(_labeled(spark), ["f1", "f2"], smoothing=0.5)
    # m_f1 = (3 + .5) / (4 + 1) = 0.7 ; u_f1 = (1 + .5) / 5 = 0.3
    assert w["f1"] == (pytest.approx(0.7), pytest.approx(0.3))
    # m_f2 = (4 + .5) / 5 = 0.9 ; u_f2 = (0 + .5) / 5 = 0.1
    assert w["f2"] == (pytest.approx(0.9), pytest.approx(0.1))


def test_fs_score_hand_computed(spark):
    weights = {"f1": (0.7, 0.3), "f2": (0.9, 0.1)}
    pairs = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 0.0), (3, 0.0, 0.0)],
        "pid int, f1 double, f2 double",
    )
    got = {
        r.pid: r.fs_weight for r in fs_score(pairs, weights).collect()
    }
    agree1, dis1 = log2(0.7 / 0.3), log2(0.3 / 0.7)
    agree2, dis2 = log2(0.9 / 0.1), log2(0.1 / 0.9)
    assert got[1] == pytest.approx(agree1 + agree2)
    assert got[2] == pytest.approx(agree1 + dis2)
    assert got[3] == pytest.approx(dis1 + dis2)


def test_fs_classify_three_way_band(spark):
    weights = {"f1": (0.7, 0.3), "f2": (0.9, 0.1)}
    pairs = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 0.0), (3, 0.0, 0.0)],
        "pid int, f1 double, f2 double",
    )
    # full-agree weight ~= 4.39, mixed ~= -1.95, full-disagree ~= -4.39
    out = {
        r.pid: r.fs_decision
        for r in fs_classify(pairs, weights, upper=3.0, lower=-3.0).collect()
    }
    assert out == {1: "link", 2: "possible", 3: "non_link"}

    with pytest.raises(ValueError):
        fs_classify(pairs, weights, upper=-1.0, lower=1.0)


def test_fs_end_to_end_estimation_separates_classes(spark):
    labeled = _labeled(spark)
    w = estimate_mu(labeled, ["f1", "f2"])
    scored = fs_score(labeled, w).collect()
    match_scores = [r.fs_weight for r in scored if r.label == 1]
    unmatch_scores = [r.fs_weight for r in scored if r.label == 0]
    # weights estimated from this table fully separate it:
    # min match = dis(f1)+agree(f2) = 1.95 > max unmatch = -1.95
    assert min(match_scores) > max(unmatch_scores)


def test_ecm_recovers_known_mixture_without_labels(spark):
    """Pairs sampled from a known two-component Bernoulli mixture: the
    unsupervised EM fit must recover (p, m, u) to ~±0.05 and its weights
    must separate the (hidden) classes."""
    import random

    from record_linkage_spark.operators.fellegi_sunter import ecm_estimate

    rng = random.Random(42)
    true_p = 0.15
    true_m = [0.92, 0.85, 0.80]
    true_u = [0.08, 0.15, 0.25]
    rows = []
    for _ in range(6000):
        is_match = rng.random() < true_p
        probs = true_m if is_match else true_u
        rows.append(
            tuple(1.0 if rng.random() < pj else 0.0 for pj in probs)
            + (int(is_match),)
        )
    df = spark.createDataFrame(
        rows, "f1 double, f2 double, f3 double, hidden int"
    )

    got = ecm_estimate(df.select("f1", "f2", "f3"), ["f1", "f2", "f3"])
    assert abs(got["p"] - true_p) < 0.05
    for i, c in enumerate(["f1", "f2", "f3"]):
        m, u = got["weights"][c]
        assert abs(m - true_m[i]) < 0.07, (c, m)
        assert abs(u - true_u[i]) < 0.07, (c, u)

    scored = fs_score(df, got["weights"]).collect()
    m_scores = [r.fs_weight for r in scored if r.hidden == 1]
    u_scores = [r.fs_weight for r in scored if r.hidden == 0]
    assert sum(m_scores) / len(m_scores) > sum(u_scores) / len(u_scores) + 2


def test_ecm_pattern_aggregation_is_bounded(spark):
    """The only cluster job groups by pattern: 3 binary features -> at
    most 8 collected rows regardless of pair count (here 6,000)."""
    from record_linkage_spark.operators.fellegi_sunter import ecm_estimate

    df = spark.range(6000).select(
        (F.col("id") % 2 == 0).cast("double").alias("f1"),
        (F.col("id") % 3 == 0).cast("double").alias("f2"),
        (F.col("id") % 5 == 0).cast("double").alias("f3"),
    )
    n_patterns = df.select(
        (F.col("f1") >= 0.5).cast("int").alias("f1"),
        (F.col("f2") >= 0.5).cast("int").alias("f2"),
        (F.col("f3") >= 0.5).cast("int").alias("f3"),
    ).distinct().count()
    assert n_patterns <= 8
    got = ecm_estimate(df, ["f1", "f2", "f3"])
    assert 0.0 < got["p"] < 1.0 and got["iters"] >= 1


def test_tf_adjusted_agreement_weights(spark):
    """Agreeing on a rare value outweighs agreeing on a common one; the
    numbers are hand-computed from the tf table."""
    from math import log2 as py_log2

    from record_linkage_spark.operators.fellegi_sunter import (
        fs_tf_adjusted_score,
    )

    # 10 records: "smith" x 5 (tf 0.5), "wong" x 4 (tf 0.4), "zu" x 1 (0.1)
    records = spark.createDataFrame(
        [(i, "smith") for i in range(5)]
        + [(i, "wong") for i in range(5, 9)]
        + [(9, "zu")],
        "rid bigint, surname string",
    )
    pairs = spark.createDataFrame(
        [
            (1, "smith", "smith"),  # common agree
            (2, "zu", "zu"),        # rare agree
            (3, "smith", "wong"),   # disagree
            (4, None, "wong"),      # null side -> disagree weight
        ],
        "pid int, surname_A string, surname_B string",
    )
    m = 0.9
    got = {
        r.pid: r.fs_tf_weight
        for r in fs_tf_adjusted_score(pairs, records, "surname", m).collect()
    }
    assert got[1] == pytest.approx(py_log2(0.9 / 0.5))
    assert got[2] == pytest.approx(py_log2(0.9 / 0.1))
    assert got[2] > got[1]  # rare agreement is stronger evidence
    u_bar = 0.5**2 + 0.4**2 + 0.1**2  # 0.42
    assert got[3] == pytest.approx(py_log2(0.1 / (1 - u_bar)))
    assert got[4] == got[3]


def test_thresholds_from_prior_band(spark):
    """Posterior-odds thresholds: with p=0.5 the band is symmetric at
    ±log2(19); an ECM fit + derived band separates the planted mixture
    with high posterior confidence on the links."""
    from math import log2 as py_log2

    from record_linkage_spark.operators.fellegi_sunter import (
        ecm_estimate,
        fs_classify,
        fs_thresholds_from_prior,
    )

    hi, lo = fs_thresholds_from_prior(0.5)
    assert hi == pytest.approx(py_log2(19))
    assert lo == pytest.approx(-py_log2(19))
    with pytest.raises(ValueError):
        fs_thresholds_from_prior(0.0)

    # end to end: unsupervised fit -> derived band -> classify
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(4000):
        is_match = rng.random() < 0.2
        probs = [0.95, 0.9] if is_match else [0.05, 0.1]
        rows.append(
            tuple(1.0 if rng.random() < pj else 0.0 for pj in probs)
            + (int(is_match),)
        )
    df = spark.createDataFrame(rows, "f1 double, f2 double, hidden int")
    fit = ecm_estimate(df.select("f1", "f2"), ["f1", "f2"])
    hi, lo = fs_thresholds_from_prior(fit["p"], 0.9, 0.9)
    out = fs_classify(df, fit["weights"], upper=hi, lower=lo).collect()
    linked = [r for r in out if r.fs_decision == "link"]
    assert linked, "band too tight: nothing linked"
    precision = sum(r.hidden for r in linked) / len(linked)
    assert precision >= 0.85  # links honor the target posterior-ish
