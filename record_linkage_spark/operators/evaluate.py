"""Global evaluation: reconstruct full-GT predictions and confusion metrics.

Reference ``src/evaluation/compare.py``: every labeled GT pair defaults to
pred=0; candidate predictions are overlaid by the canonical
(min(id), max(id)) pair key (J4, ``compare.py:27-55``); TP/FP/FN/TN and
P/R/F1 come from one conditional-aggregate pass (A6, ``compare.py:58-76``).

Spark shape: a single left join + coalesce + one agg — no per-pair Python,
one shuffle on the canonical pair key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.functions.comparators import canonical_pair


def _canonicalized(df: DataFrame) -> DataFrame:
    lo, hi = canonical_pair("id_A", "id_B")
    return df.withColumn("id_lo", lo).withColumn("id_hi", hi)


def global_predictions(gt: DataFrame, scored_candidates: DataFrame) -> DataFrame:
    """gt(id_A, id_B, label) x candidates(id_A, id_B, pred) -> one row per GT
    pair with pred defaulted to 0 for pairs pruned by blocking."""
    g = _canonicalized(gt)
    c = _canonicalized(scored_candidates).select(
        "id_lo", "id_hi", F.col("pred").alias("_cand_pred")
    )
    j = g.join(c, ["id_lo", "id_hi"], "left")
    return j.withColumn("pred", F.coalesce("_cand_pred", F.lit(0))).drop(
        "_cand_pred", "id_lo", "id_hi"
    )


def confusion_metrics(preds: DataFrame) -> dict:
    """TP/FP/FN/TN + precision/recall/F1 in one pass."""
    row = preds.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 0), 1).otherwise(0)).alias("tn"),
    ).first()
    tp, fp, fn, tn = (int(row.tp or 0), int(row.fp or 0), int(row.fn or 0), int(row.tn or 0))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def evaluate_global(gt: DataFrame, scored_candidates: DataFrame) -> dict:
    """End-to-end E3 analogue: overlay + confusion metrics."""
    return confusion_metrics(global_predictions(gt, scored_candidates))


def bcubed_metrics(
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_key",
) -> DataFrame:
    """B-cubed cluster-quality metrics (Bagga & Baldwin 1998): per record,
    precision = |its cluster ∩ its truth class| / |its cluster| and
    recall = |∩| / |its truth class|; the scores average over records.
    The standard extrinsic metric for entity-resolution clusterings —
    unlike pairwise F1 it doesn't quadratically over-weight big clusters.

    Returns one row: (bcubed_precision, bcubed_recall, bcubed_f1, n_records).

    Scale shape: one inner join on the record id, then three aggregations
    keyed on cluster, class, and (cluster, class) — every group is a real
    cluster/class (bounded by blocking), no pair enumeration anywhere; the
    per-record averages fold into a single final aggregate. All joins are
    equality joins; the per-group size frames broadcast when small.
    """
    a = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
    )
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_k"))
    j = a.join(t, "_id")
    nc = j.groupBy("_c").agg(F.count("*").alias("_nc"))
    nk = j.groupBy("_k").agg(F.count("*").alias("_nk"))
    nck = j.groupBy("_c", "_k").agg(F.count("*").alias("_nck"))
    per = (
        j.join(nck, ["_c", "_k"])
        .join(nc, "_c")
        .join(nk, "_k")
        .select(
            (F.col("_nck") / F.col("_nc")).alias("_p"),
            (F.col("_nck") / F.col("_nk")).alias("_r"),
        )
    )
    out = per.agg(
        F.avg("_p").alias("p"),
        F.avg("_r").alias("r"),
        F.count("*").cast("long").alias("n_records"),
    )
    return out.select(
        F.round("p", 6).alias("bcubed_precision"),
        F.round("r", 6).alias("bcubed_recall"),
        F.round(
            F.when(
                F.col("p") + F.col("r") > 0,
                2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("bcubed_f1"),
        "n_records",
    )
