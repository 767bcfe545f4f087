"""Temporal joins Spark lacks as primitives: AS-OF and interval RANGE.

AS-OF join (the kdb+/Pandas ``merge_asof``/Flink temporal-join
operation): for every left event, attach the LATEST right row at or
before the left timestamp for the same key — how a linkage pipeline
hydrates an event with the entity profile, exchange rate, or consent
state that was in force when the event happened. Spark has no native
operator; the naive theta join (``l.ts >= r.ts`` + argmax window) is a
per-key cross product. This implementation is the single-shuffle
union-sort form: tag both inputs, hash-partition by key, sort within
partitions by (ts, tag), and carry the last-seen right payload forward
with a running ``last(ignorenulls)`` window — O(n log n) per key, one
exchange, no pair enumeration. DuckDB's native ``ASOF JOIN`` replays it
for the oracle.

RANGE join: match point events to the intervals containing them
(sessions, maintenance windows, consent periods). The naive
``BETWEEN`` theta join is a cross product; here intervals explode to
the fixed-width buckets they cover and events join their bucket by
EQUALITY before the exact containment filter — the classic
interval-bucketing trick; cost tracks events + interval-bucket
coverage, never |events| x |intervals|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(df: DataFrame, col: str):
    """Epoch-seconds double for numeric OR timestamp columns.
    TIMESTAMP_NTZ refuses a direct double cast (ANSI); route it through
    a session-UTC timestamp first (the session factory pins UTC, so the
    conversion is deterministic)."""
    if dict(df.dtypes)[col].startswith("timestamp"):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: float | None = None,
) -> DataFrame:
    """Backward as-of join: every ``left`` row gains the ``right`` row
    with the greatest ``right_ts`` <= ``left_ts`` for the same ``on``
    keys (ties on exact equal timestamps resolve to the LAST right row
    under a deterministic (ts, payload-hash) order). Right columns come
    back with an ``r_`` prefix (null when nothing precedes the event,
    or the match is older than ``tolerance`` seconds).

    One hash exchange on the keys; the carry is a running
    last(ignorenulls) window over the per-key (ts, side) sort — never a
    theta join."""
    keys = list(on)
    r_payload_cols = [c for c in right.columns if c not in keys]
    payload = F.struct(
        _epoch(right, right_ts).alias("_rts"),
        *[F.col(c).alias(c) for c in r_payload_cols],
    )
    r = right.select(
        *keys,
        _epoch(right, right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l_ = left.select(
        *keys,
        _epoch(left, left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # right rows sort before left rows at equal ts (as-of is inclusive);
    # equal-ts right rows order by payload hash so the carried row is
    # deterministic under any partitioning
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.asc("_ts"),
            F.asc("_side"),
            F.asc(F.xxhash64(F.to_json(F.col("_p")))),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l_)
        .withColumn("_last", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        ok = F.col("_last").isNotNull() & (
            (F.col("_ts") - F.col("_last._rts"))
            <= F.lit(float(tolerance))
        )
        carried = carried.withColumn(
            "_last", F.when(ok, F.col("_last"))
        )
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_last.{c}").alias(f"r_{c}") for c in r_payload_cols],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    on: Sequence[str] = (),
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Containment join: one row per (event, interval) with
    ``start <= ts <= end`` (closed on both ends) and equal ``on`` keys.
    Intervals explode to the fixed-width time buckets they cover and
    events join their single bucket by equality, so the exact BETWEEN
    filter only ever sees co-bucketed candidates. Pick
    ``bucket_seconds`` near the typical interval length: shorter
    buckets mean more interval replication, longer buckets mean more
    false candidates — either way correctness is unaffected.

    Returns all event columns + all interval columns."""
    keys = list(on)
    b = float(bucket_seconds)
    ev = events.withColumn(
        "_bkt", F.floor(_epoch(events, ts_col) / b).cast("long")
    )
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(_epoch(intervals, start_col) / b).cast("long"),
                F.floor(_epoch(intervals, end_col) / b).cast("long"),
            )
        ),
    )
    joined = ev.join(iv, keys + ["_bkt"])
    # exact containment on the RAW columns (timestamps compare natively
    # — no double cast, so micro-precision boundaries stay exact; the
    # double cast is only for bucket arithmetic)
    return joined.filter(
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    ).drop("_bkt")
