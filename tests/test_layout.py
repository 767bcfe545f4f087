from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.layout import (
    file_stats,
    range_bucket,
    skipping_fraction,
    zorder_layout,
    zvalue,
)


def _py_zvalue(vals, bits):
    out = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def _grid(spark, side=32):
    rows = [(i, i % side, i // side) for i in range(side * side)]
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_zvalue_matches_python_reference(spark):
    df = _grid(spark, 8).withColumn(
        "zval", zvalue([F.col("x"), F.col("y")], bits=3)
    )
    for r in df.collect():
        assert r.zval == _py_zvalue([r.x, r.y], 3)


def test_range_bucket_clamps_and_spreads(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (99.9,), (100.0,), (250.0,)], "v double"
    ).withColumn("b", range_bucket("v", 0.0, 100.0, 4))
    got = [r.b for r in df.collect()]
    assert got[0] == 0          # below range clamps to the low edge
    assert got[-2] == 15        # vmax clamps into the top bucket
    assert got[-1] == 15        # above range clamps to the high edge
    assert 0 <= got[2] < 16


def test_validation_errors():
    with pytest.raises(ValueError):
        range_bucket("v", 5.0, 5.0, 4)
    with pytest.raises(ValueError):
        range_bucket("v", 0.0, 1.0, 40)
    with pytest.raises(ValueError):
        zvalue([], 4)
    with pytest.raises(ValueError):
        zvalue([F.lit(0)] * 4, 16)


def test_zorder_layout_partitions_cover_disjoint_zranges(spark):
    df = _grid(spark).withColumn(
        "zval", zvalue([F.col("x"), F.col("y")], bits=5)
    )
    parts = (
        zorder_layout(df, n_partitions=4)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(parts) == 4
    for a, b in zip(parts, parts[1:]):
        assert a.hi <= b.lo  # contiguous, non-overlapping z-ranges


def test_skipped_files_truly_contain_no_matches(spark):
    df = _grid(spark).withColumn(
        "zval", zvalue([F.col("x"), F.col("y")], bits=5)
    )
    stats = file_stats(df, "id", ["x", "y"], n_files=16).localCheckpoint()
    # replay the reader's pruning decision and check it against truth
    from pyspark.sql import Window

    assigned = df.withColumn(
        "file_id", F.ntile(16).over(Window.orderBy("zval", "id")) - 1
    )
    lo, hi = 4, 7
    prunable = {
        r.file_id
        for r in stats.filter(
            ~((F.col("y_max") >= lo) & (F.col("y_min") <= hi))
        ).collect()
    }
    assert prunable  # z-order must make SOME files prunable on y
    bad = assigned.filter(
        F.col("file_id").isin(list(prunable))
        & F.col("y").between(lo, hi)
    ).count()
    assert bad == 0


def test_zorder_beats_single_column_sort_on_the_other_dimension(spark):
    base = _grid(spark)
    z = base.withColumn("zval", zvalue([F.col("x"), F.col("y")], bits=5))
    linear = base.withColumn("zval", F.col("x"))  # sort-by-x layout
    sz = file_stats(z, "id", ["x", "y"], n_files=16)
    sl = file_stats(linear, "id", ["x", "y"], n_files=16)
    z_y = skipping_fraction(sz, "y", 4, 7).first().skip_frac
    l_y = skipping_fraction(sl, "y", 4, 7).first().skip_frac
    z_x = skipping_fraction(sz, "x", 4, 7).first().skip_frac
    l_x = skipping_fraction(sl, "x", 4, 7).first().skip_frac
    # sort-by-x cannot prune on y at all; z-order prunes on BOTH
    assert l_y == 0.0
    assert z_y >= 0.5
    assert z_x >= 0.5
    assert l_x > z_x  # the single-sort column stays the best for itself


def test_zvalue_partitioning_invariance(spark):
    df = _grid(spark, 16).withColumn(
        "zval", zvalue([F.col("x"), F.col("y")], bits=4)
    )
    a = sorted((r.id, r.zval) for r in df.collect())
    b = sorted((r.id, r.zval) for r in df.repartition(13).collect())
    assert a == b
