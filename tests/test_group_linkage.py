"""Group linkage (On et al. ICDE 2007): 1:1-matched group similarity —
hand-computed truth tables, the shared-member-in-big-groups property,
1:1 discipline across group-pair contexts, and parallelism invariance."""

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.matching import group_linkage

PAIRS = "id_A bigint, id_B bigint, score double"
GROUPS = "record_id bigint, group_id string"


def test_member_for_member_groups_score_one(spark):
    groups = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (11, "g2"), (12, "g2")], GROUPS
    )
    pairs = spark.createDataFrame([(1, 11, 1.0), (2, 12, 1.0)], PAIRS)
    row = group_linkage(pairs, groups).collect()[0]
    assert (row.group_A, row.group_B) == ("g1", "g2")
    assert row.n_matched == 2
    assert row.sim == pytest.approx(1.0)


def test_single_shared_member_in_large_groups_scores_low(spark):
    """The property record-level max-aggregation lacks: one perfect
    member pair between two 4-member groups is weak group evidence."""
    groups = spark.createDataFrame(
        [(i, "g1") for i in range(1, 5)] + [(i, "g2") for i in range(11, 15)],
        GROUPS,
    )
    pairs = spark.createDataFrame([(1, 11, 1.0)], PAIRS)
    row = group_linkage(pairs, groups).collect()[0]
    assert row.sim == pytest.approx(1.0 / (4 + 4 - 1))


def test_one_to_one_discipline_hand_computed(spark):
    """Greedy under (score desc, ids): edge (1,11,0.9) wins, locking 1
    and 11; best remaining disjoint edge is (2,12,0.6). sim =
    (0.9+0.6)/(2+2-2)."""
    groups = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (11, "g2"), (12, "g2")], GROUPS
    )
    pairs = spark.createDataFrame(
        [(1, 11, 0.9), (1, 12, 0.8), (2, 11, 0.7), (2, 12, 0.6)], PAIRS
    )
    row = group_linkage(pairs, groups).collect()[0]
    assert row.n_matched == 2
    assert row.match_weight == pytest.approx(1.5)
    assert row.sim == pytest.approx(1.5 / 2)


def test_contexts_are_independent(spark):
    """The same record matches once PER group pair: record 1 (g1) can
    match into g2 and into g3 simultaneously — 1:1 holds within each
    group-pair context, not globally."""
    groups = spark.createDataFrame(
        [(1, "g1"), (11, "g2"), (21, "g3")], GROUPS
    )
    pairs = spark.createDataFrame([(1, 11, 0.9), (1, 21, 0.8)], PAIRS)
    out = {
        (r.group_A, r.group_B): r for r in group_linkage(pairs, groups).collect()
    }
    assert out[("g1", "g2")].n_matched == 1
    assert out[("g1", "g3")].n_matched == 1


def test_same_group_and_subthreshold_pairs_ignored(spark):
    groups = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (11, "g2")], GROUPS
    )
    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (1, 11, 0.2), (2, 11, 0.9)], PAIRS
    )
    out = group_linkage(pairs, groups, min_score=0.5).collect()
    assert len(out) == 1
    assert out[0].n_matched == 1
    assert out[0].match_weight == pytest.approx(0.9)


def test_orientation_canonicalized(spark):
    """Pairs arriving with groups in either orientation land on the same
    canonical (group_A < group_B) row."""
    groups = spark.createDataFrame(
        [(1, "g2"), (2, "g2"), (11, "g1"), (12, "g1")], GROUPS
    )
    pairs = spark.createDataFrame([(1, 11, 1.0), (12, 2, 1.0)], PAIRS)
    rows = group_linkage(pairs, groups).collect()
    assert len(rows) == 1
    assert (rows[0].group_A, rows[0].group_B) == ("g1", "g2")
    assert rows[0].n_matched == 2


def test_parallelism_invariance(spark):
    import random

    rng = random.Random(11)
    groups = [(i, f"g{i % 6}") for i in range(60)]
    pairs = [
        (a, b, round(rng.random(), 6))
        for a in range(0, 30)
        for b in range(30, 60)
        if rng.random() < 0.2
    ]
    gdf = spark.createDataFrame(groups, GROUPS)
    pdf = spark.createDataFrame(pairs, PAIRS)
    key = lambda rows: sorted(  # noqa: E731
        (r.group_A, r.group_B, r.n_matched, round(r.sim, 9)) for r in rows
    )
    a = key(group_linkage(pdf.coalesce(1), gdf.coalesce(1)).collect())
    b = key(group_linkage(pdf.repartition(7), gdf.repartition(5)).collect())
    assert a == b
