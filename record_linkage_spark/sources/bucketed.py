"""Bucketed warehouse tables: co-located joins and aggregations.

At 100 TB the dominant cost of the linkage pipeline's *maintenance*
queries (re-hydration, incremental overlays, entity re-fusion) is
re-shuffling the same conversation-keyed tables on every run. Spark's
bucketing persists the hash-partitioning INTO the table layout: every
equi-join or aggregation on the bucket key then reads co-located
buckets and skips the Exchange entirely — the "reuse a partitioning
across stages" lever, made durable across jobs.

Semantics (Spark bucketing, parquet + session catalog here, Iceberg
bucket-partition transforms in production):

* ``bucketBy(n, key)`` on write hash-assigns rows to ``n`` buckets with
  the same hash Spark's shuffle uses, one file group per bucket;
* two tables bucketed by the same key and bucket count sort-merge or
  hash join WITHOUT an Exchange on either side;
* a groupBy on the bucket key aggregates within buckets — no partial /
  final split across an Exchange.

The plan-shape guarantees are pinned by
``tests/test_bucketed.py::test_bucketed_join_and_agg_have_no_exchange``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | tuple[str, ...],
    n_buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as a bucketed parquet table (external when ``path``
    is given). ``n_buckets`` must match across tables that should join
    exchange-free; pick it like shuffle partitions — 2-3x total cores,
    fixed for the table family, NOT per-job."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (a plain
    ``spark.read.parquet`` of the same files would DROP the bucketing
    and reintroduce shuffles — always read through the catalog)."""
    return spark.table(table)
