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
