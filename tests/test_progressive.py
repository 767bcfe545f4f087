"""Progressive (pay-as-you-go) ER scheduling: PSNM tier semantics, the
front-loading property (high recall at a small prefix of the work), and
parallelism invariance."""

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.progressive import (
    progressive_recall_curve,
    progressive_sn_schedule,
)


def _profiles(spark):
    # sort key clusters duplicates adjacently: planted dup x' of x shares
    # x's key, fillers spread across distinct keys
    rows = []
    for i in range(30):
        rows.append((f"a{i:03d}", f"key{i:03d}"))
        if i < 10:
            rows.append((f"b{i:03d}", f"key{i:03d}"))  # dup of a_i, same key
    return spark.createDataFrame(rows, "conv_id string, token_prefix string")


def _truth(spark):
    return spark.createDataFrame(
        [(f"a{i:03d}", f"b{i:03d}") for i in range(10)],
        "id_A string, id_B string",
    )


def test_schedule_tiers_match_expanding_windows(spark):
    """The one-pass schedule at max_distance=4 filtered to priority<=w
    must equal a fresh SN run at window=w, for every w."""
    from record_linkage_spark.operators.blocking import sorted_neighborhood_pairs

    prof = _profiles(spark)
    sched = progressive_sn_schedule(prof, max_distance=4)
    for w in (1, 2, 3, 4):
        got = {
            (r.id_A, r.id_B)
            for r in sched.filter(F.col("priority") <= w).collect()
        }
        want = {
            (r.id_A, r.id_B)
            for r in sorted_neighborhood_pairs(prof, window=w).collect()
        }
        assert got == want, w


def test_curve_hand_computed_and_front_loading(spark):
    """Every planted dup is rank-adjacent to its source, so tier 1 alone
    reaches recall 1.0 at a fraction of the tier-4 comparison cost."""
    sched = progressive_sn_schedule(_profiles(spark), max_distance=4)
    curve = {
        r.priority: r for r in progressive_recall_curve(sched, _truth(spark)).collect()
    }
    assert curve[1].recall == pytest.approx(1.0)
    assert curve[1].n_matches_cum == 10
    # 40 records -> 39 distance-1 pairs; tiers are monotone in both axes
    assert curve[1].n_pairs_cum == 39
    assert curve[4].recall == pytest.approx(1.0)
    for d in (2, 3, 4):
        assert curve[d].n_pairs_cum > curve[d - 1].n_pairs_cum
        assert curve[d].n_matches_cum >= curve[d - 1].n_matches_cum
    # the pay-as-you-go point: full recall at ~1/4 of the full budget
    assert curve[1].n_pairs_cum < curve[4].n_pairs_cum / 2


def test_unreached_truth_caps_recall(spark):
    """Truth pairs the schedule never emits (keys sort far apart) hold
    the curve below 1.0 — lost recall must be visible, not silently
    normalized away."""
    prof = _profiles(spark)
    truth = _truth(spark).union(
        spark.createDataFrame(
            [("a000", "a029")], "id_A string, id_B string"
        )  # ranks ~30 apart: outside every tier
    )
    curve = {
        r.priority: r
        for r in progressive_recall_curve(
            progressive_sn_schedule(prof, max_distance=4), truth
        ).collect()
    }
    assert curve[4].recall == pytest.approx(10 / 11)


def test_parallelism_invariance(spark):
    prof = _profiles(spark)
    a = sorted(
        tuple(r)
        for r in progressive_recall_curve(
            progressive_sn_schedule(prof.coalesce(1), max_distance=3),
            _truth(spark),
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in progressive_recall_curve(
            progressive_sn_schedule(prof.repartition(7), max_distance=3),
            _truth(spark),
        ).collect()
    )
    assert a == b
