"""Temporal entity versioning: SCD2 attribute history + point-in-time
golden records.

A linkage pipeline that runs continuously does not just need the
CURRENT golden record (``operators/survivorship.py``) — it needs to
answer "what did this entity look like when the event happened?"
(training-data labeling, audit, consent). The warehouse-standard shape
is a slowly-changing-dimension type-2 table: one row per
(entity, attribute) VALUE RUN with ``valid_from``/``valid_to``
timestamps, ``valid_to`` null on the open (current) run.

``attribute_history`` turns a record-version stream — one row per
observation ``(entity_id, ts, value)`` per attribute — into that SCD2
table with the classic gaps-and-islands cascade: per-entity lag to
detect value changes (null-safe, so missing observations neither open
nor close a run), a change-flag cumulative sum to number the runs, one
groupBy to collapse each run to its span, and a lead window to close
each run at the next run's start. Everything shuffles ONCE on
``entity_id`` (the lag, the cumsum, the collapse and the lead all ride
the same hash partitioning — AQE reuses the exchange), so the operator
is a constant number of stages regardless of history length, and at
100 TB the cost is one shuffle of the observation stream — there is no
per-entity iteration and no driver state.

``golden_asof`` is the read side: the attribute values in force at a
query timestamp, i.e. the runs whose ``[valid_from, valid_to)``
interval contains it (half-open, matching the SCD2 convention that a
new value takes effect AT its observation timestamp).

Reference scope: the reference engine materializes only the latest
golden record (run_pipeline.py's survivorship stage); the temporal
dimension is this repo's extension, following the Kimball SCD2 shape
so results are externally checkable — the DuckDB twin replays the same
lag/cumsum/lead windows (contract entry ``temporal_joins``
kind='scd2').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def attribute_history(
    observations: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an observation stream into SCD2 value runs.

    Input: one row per observation ``(entity, ts, value)``; several
    observations may repeat the same value — consecutive repeats merge
    into one run. Null values are real observations ("attribute was
    cleared") and form runs like any other value.

    Output: ``(entity, value, version, valid_from, valid_to,
    n_observations)`` with ``version`` numbering an entity's runs from
    0 in time order and ``valid_to`` null on the last (open) run.

    Ties on identical timestamps resolve by ``tiebreak_col`` (a stable
    observation id) when given, else by the value itself — either way
    the run split is deterministic under re-partitioning.

    Plan shape: one hash exchange on ``entity_col``; lag → cumsum →
    groupBy → lead all reuse it. No Python, no iteration.
    """
    tie = F.col(tiebreak_col) if tiebreak_col else F.col(value_col)
    order = [F.col(ts_col).asc(), tie.asc_nulls_first()]
    w = Window.partitionBy(entity_col).orderBy(*order)
    # null-safe change detection: a run breaks only when the value is
    # DISTINCT from the previous observation's value; the first
    # observation per entity always opens run 0 (row_number, not
    # lag-is-null, so null timestamps cannot confuse the boundary)
    changed = F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(
        (~F.col(value_col).eqNullSafe(F.lag(value_col).over(w))).cast("bigint")
    )
    runs = observations.withColumn("_chg", changed).withColumn(
        "_run", F.sum("_chg").over(w) - 1
    )
    collapsed = runs.groupBy(entity_col, "_run").agg(
        F.first(value_col).alias("value"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    w2 = Window.partitionBy(entity_col).orderBy("_run")
    return collapsed.select(
        F.col(entity_col),
        F.col("value"),
        F.col("_run").cast("bigint").alias("version"),
        F.col("valid_from"),
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("n_observations"),
    )


def golden_asof(
    history: DataFrame,
    at_ts,
    entity_col: str = "entity_id",
) -> DataFrame:
    """Point-in-time read over an ``attribute_history`` table: the one
    run per entity whose half-open ``[valid_from, valid_to)`` interval
    contains ``at_ts`` (a literal timestamp/epoch or a Column). A pure
    filter — Catalyst pushes it to the history scan, so at scale this
    reads only the partitions a valid_from-partitioned table exposes.
    Entities whose first observation is after ``at_ts`` simply do not
    appear (they did not exist yet)."""
    ts = at_ts if isinstance(at_ts, Column) else F.lit(at_ts)
    return history.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    ).select(
        entity_col, "value", "version", "valid_from", "valid_to"
    )
