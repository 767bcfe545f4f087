"""Bucketed tables must make bucket-key joins and aggregations
exchange-free — the durable co-location lever for 100 TB maintenance
queries (sources/bucketed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.sources.bucketed import read_bucketed, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    base = spark.range(0, 5_000).select(
        F.col("id").alias("conv_id"),
        (F.col("id") % 97).alias("f"),
    )
    write_bucketed(
        base, "t_profiles_b", ["conv_id"], n_buckets=8,
        path=str(root / "profiles"),
    )
    write_bucketed(
        base.select("conv_id", (F.col("f") * 2).alias("g")),
        "t_updates_b", ["conv_id"], n_buckets=8,
        path=str(root / "updates"),
    )
    yield "t_profiles_b", "t_updates_b"
    spark.sql("DROP TABLE IF EXISTS t_profiles_b")
    spark.sql("DROP TABLE IF EXISTS t_updates_b")


def test_bucketed_join_and_agg_have_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    a, b = read_bucketed(spark, ta), read_bucketed(spark, tb)
    # merge hint keeps the small test tables off the broadcast path so
    # the assertion checks the co-location property, not table size
    j = a.hint("merge").join(b, "conv_id")
    plan = _plan(j)
    assert "Exchange" not in plan, plan
    assert j.count() == 5_000

    agg = a.groupBy("conv_id").agg(F.sum("f").alias("s"))
    plan_a = _plan(agg)
    assert "Exchange" not in plan_a, plan_a
    assert agg.count() == 5_000


def test_plain_parquet_read_of_same_files_would_shuffle(spark, bucketed_pair, tmp_path_factory):
    """Control: the SAME data joined without bucket metadata shuffles —
    proving the exchange elimination comes from the bucketing, and
    documenting why reads must go through the catalog."""
    ta, tb = bucketed_pair
    a = read_bucketed(spark, ta)
    plain = spark.createDataFrame(
        a.collect(), schema=a.schema
    )  # identical rows, no bucket metadata
    j = plain.hint("merge").join(
        read_bucketed(spark, tb).hint("merge"), "conv_id"
    )
    assert "Exchange" in _plan(j)
