from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.skew import (
    key_frequencies,
    load_imbalance,
    partition_loads,
    skew_report,
    skew_scalars,
)


def _counts(spark, pairs):
    return spark.createDataFrame(pairs, "key string, n long")


def test_uniform_keys_need_no_salt(spark):
    counts = _counts(spark, [(f"k{i}", 100) for i in range(16)])
    rep = skew_report(counts, n_partitions=16)
    rows = rep.collect()
    assert all(r.salt == 1 for r in rows)
    assert all(r.skew_factor == pytest.approx(1.0) for r in rows)
    s = skew_scalars(rep).first()
    assert s.n_hot_keys == 0
    assert s.max_skew_factor == pytest.approx(1.0)


def test_hot_key_gets_proportional_salt(spark):
    # one key holds 50% of 2000 rows; 32 partitions -> salt ceil(0.5*32)=16
    counts = _counts(spark, [("hot", 1000)] + [(f"k{i}", 50) for i in range(20)])
    rep = {r.key: r for r in skew_report(counts, n_partitions=32).collect()}
    assert rep["hot"].salt == 16
    assert rep["hot"].skew_factor == pytest.approx(16.0)
    assert rep["hot"].share == pytest.approx(0.5)
    assert all(r.salt == 1 for k, r in rep.items() if k != "hot")
    s = skew_scalars(skew_report(counts, n_partitions=32)).first()
    assert s.n_hot_keys == 1
    assert s.total == 2000


def test_key_frequencies_concatenates_and_limits(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 1)], "x string, y int"
    )
    out = {r.key: r.n for r in key_frequencies(df, ["x", "y"]).collect()}
    assert out["a\x1f1"] == 2 and out["a\x1f2"] == 1 and out["b\x1f1"] == 1
    top = key_frequencies(df, ["x", "y"], top_n=1).collect()
    assert len(top) == 1 and top[0].key == "a\x1f1"


def test_sketch_counts_compose(spark):
    """heavy_hitters output (est_count) feeds skew_report unchanged when
    capacity makes it exact — the corpus-scale path."""
    from record_linkage_spark.operators.sketches import heavy_hitters

    rows = spark.createDataFrame(
        [("hot",)] * 300 + [(f"k{i}",) for i in range(30)], "v string"
    )
    hh = heavy_hitters(rows, "v", capacity=512).select(
        F.col("v").alias("key"), F.col("est_count").alias("n")
    )
    rep = {r.key: r for r in skew_report(hh, n_partitions=10).collect()}
    assert rep["hot"].n == 300
    assert rep["hot"].salt == math.ceil(300 / 330 * 10)


def test_partition_loads_conserve_and_imbalance(spark):
    counts = _counts(spark, [(f"k{i}", 10 * (i + 1)) for i in range(40)])
    loads = partition_loads(counts, n_partitions=8)
    total = sum(r.load for r in loads.collect())
    assert total == sum(10 * (i + 1) for i in range(40))
    imb = load_imbalance(loads).first()
    assert imb.max_load >= imb.mean_load
    assert imb.imbalance >= 1.0
    # a single-key table maximizes imbalance: everything in one bin
    one = partition_loads(_counts(spark, [("k", 100)]), n_partitions=8)
    assert load_imbalance(one).first().imbalance == 1.0  # 1 occupied bin
    assert one.count() == 1


def test_partitioning_invariance_and_validation(spark):
    counts = _counts(spark, [(f"k{i}", 7 * (i % 5) + 1) for i in range(50)])
    a = sorted(map(tuple, skew_report(counts, 16).collect()))
    b = sorted(map(tuple, skew_report(counts.repartition(9), 16).collect()))
    assert a == b
    with pytest.raises(ValueError):
        skew_report(counts, 0)
    with pytest.raises(ValueError):
        partition_loads(counts, -1)


def test_null_key_parts_stay_distinct(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("a", "b")], "x string, y string"
    )
    out = key_frequencies(df, ["x", "y"]).collect()
    # concat_ws drops nulls; the sentinel must keep all three distinct
    assert len(out) == 3
    assert all(r.n == 1 for r in out)


def test_salting_plan_matches_report_rule_and_adds_pair_budget(spark):
    """salting_plan is THE salt-sizing code path: without a salt_target
    its salts equal skew_report's recommendation column for the same
    counts; with one, a cold-by-share key whose group is still
    quadratic-heavy gets the ceil(n / salt_target) budget fan-out."""
    from record_linkage_spark.operators.skew import salting_plan, skew_report

    counts = spark.createDataFrame(
        [("hot", 800), ("warm", 150), ("cold", 50)], "key string, n long"
    )
    rep = {r.key: r.salt for r in skew_report(counts, n_partitions=8).collect()}
    plan = {r.key: r.salt for r in salting_plan(counts, n_partitions=8).collect()}
    assert plan == rep == {"hot": 7, "warm": 2, "cold": 1}

    # pair budget: cold (5% share -> proportional salt 1) still splits
    # when its 50 rows exceed a 20-row group budget
    budget = {
        r.key: r.salt
        for r in salting_plan(counts, n_partitions=8, salt_target=20).collect()
    }
    assert budget == {"hot": 40, "warm": 8, "cold": 3}

    import pytest

    with pytest.raises(ValueError):
        salting_plan(counts, n_partitions=0)
