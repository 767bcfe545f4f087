"""Progressive (pay-as-you-go) entity resolution scheduling.

Whang, Marmaros & Garcia-Molina, "Pay-As-You-Go Entity Resolution"
(ICDE 2013 / TKDE 2013) and Papenbrock, Heise & Naumann, "Progressive
Duplicate Detection" (TKDE 2015): when the comparison budget is smaller
than the candidate set — always true at 100 TB — emit candidate pairs in
an order that front-loads likely matches, so resolution quality is
maximal at every prefix of the work, not only at completion.

The scheduler here is the PSNM family's core: sorted-neighborhood pairs
prioritized by RANK DISTANCE (distance-1 neighbors are the most likely
duplicates under any meaningful sort key; distance d is tier d). The
schedule composes with any downstream scorer — consume tiers in order
and stop when the budget or a quality target is hit. The companion
curve operator reports the cumulative cost/recall trade-off per tier,
the decision artifact a budget owner actually reads.

Scale shape: the schedule inherits
:func:`~record_linkage_spark.operators.blocking.sorted_neighborhood_pairs`'
range-partition + bounded-offsets ranking (no single-task global
window); the curve is one equality join against the (small) truth set +
a per-tier aggregate; the only window runs over <= max_distance rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from record_linkage_spark.operators.blocking import sorted_neighborhood_pairs


def progressive_sn_schedule(
    profiles: DataFrame,
    key_expr: Column | str = "token_prefix",
    max_distance: int = 5,
    id_col: str = "conv_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """PSNM schedule: sorted-neighborhood pairs with
    ``priority = rank_B - rank_A`` (1 = adjacent under the sort key =
    compare first). Consuming priorities ascending reproduces the
    progressive SNM's expanding-window emission order exactly, without
    re-scanning per window size: one pass at ``max_distance`` emits
    every tier. Returns (id_A, id_B, priority)."""
    pairs = sorted_neighborhood_pairs(
        profiles,
        key_expr,
        window=max_distance,
        id_col=id_col,
        num_partitions=num_partitions,
    )
    return pairs.select(
        "id_A",
        "id_B",
        (F.col("rank_B") - F.col("rank_A")).cast("int").alias("priority"),
    )


def progressive_recall_curve(
    schedule: DataFrame,
    truth_pairs: DataFrame,
    priority_col: str = "priority",
) -> DataFrame:
    """Cumulative cost/recall per priority tier: one row per tier with
    ``(priority, n_pairs_cum, n_matches_cum, recall)`` — the
    pay-as-you-go trade-off curve (recall is against the FULL truth set,
    so tiers the schedule never reaches show as lost recall, exactly as
    they should).

    ``truth_pairs`` needs (id_A, id_B) in the schedule's orientation
    (id_A = lower rank). The per-tier frame is <= max_distance rows, so
    the cumulative window is bounded by construction; the truth count is
    one single-int collect (mirrors the pipeline's other bounded
    driver-side aggregates)."""
    t = truth_pairs.select("id_A", "id_B").distinct()
    n_truth = t.count()
    j = schedule.join(t.withColumn("_m", F.lit(1)), ["id_A", "id_B"], "left")
    per = j.groupBy(priority_col).agg(
        F.count("*").alias("_n"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).alias("_mm"),
    )
    w = (
        Window.orderBy(priority_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per.select(
        F.col(priority_col),
        F.sum("_n").over(w).cast("bigint").alias("n_pairs_cum"),
        F.sum("_mm").over(w).cast("bigint").alias("n_matches_cum"),
        (
            F.sum("_mm").over(w) / F.lit(float(max(n_truth, 1)))
        ).alias("recall"),
    )
