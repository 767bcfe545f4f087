"""Instance-based schema matching: align the columns of two
heterogeneous sources before linking their records.

The reference pipeline renames source columns onto a hand-written
mediated schema (the P4/P5 projection stage); this module automates
the mapping the way instance-based matchers do (Rahm & Bernstein,
"A survey of approaches to automatic schema matching", VLDB J. 2001):
score every (left column, right column) pair by the Jaccard overlap of
their DISTINCT value sets (optionally blended with Jaro-Winkler name
similarity), then pick a 1:1 assignment with the engine's own greedy
stable matcher.

Scale shape — the insight is that column-pair work is bounded by the
schema, not the data:
- Each table unpivots to distinct ``(column, value)`` rows: one
  projection + one distinct per table (map-side combinable). The value
  payload is the only O(data) shuffle and it moves ONCE.
- The intersection is ONE equality hash join on the value key. A hot
  value (empty string, '0') fans out to at most |colsL| x |colsR|
  pairs — schema-squared, not data-squared.
- Set sizes, the Jaccard combine, and the 1:1 assignment all run on
  |colsL| x |colsR| rows at most — driver-trivial, kept distributed
  anyway for uniformity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unpivot_distinct(
    df: DataFrame, cols: list, out_col: str, lowercase: bool
) -> DataFrame:
    stack = "stack({}, {}) AS (col, v)".format(
        len(cols),
        ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols),
    )
    out = df.selectExpr(stack).filter(F.col("v").isNotNull())
    if lowercase:
        out = out.withColumn("v", F.lower("v"))
    return out.distinct().withColumnRenamed("col", out_col)


def value_overlap(
    left: DataFrame,
    right: DataFrame,
    left_cols: list | None = None,
    right_cols: list | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Exact distinct-value Jaccard for every column pair. Returns
    ``(lcol, rcol, n_left, n_right, n_inter, value_jaccard)`` — one row
    per column pair including zero-overlap pairs (so callers see the
    full score matrix, not just hits)."""
    lc = left_cols or list(left.columns)
    rc = right_cols or list(right.columns)
    L = _unpivot_distinct(left, lc, "lcol", lowercase)
    R = _unpivot_distinct(right, rc, "rcol", lowercase)
    szl = L.groupBy("lcol").agg(F.count(F.lit(1)).alias("n_left"))
    szr = R.groupBy("rcol").agg(F.count(F.lit(1)).alias("n_right"))
    inter = (
        L.join(R, "v")
        .groupBy("lcol", "rcol")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        szl.crossJoin(szr)
        .join(inter, ["lcol", "rcol"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .withColumn(
            "value_jaccard",
            F.col("n_inter")
            / (F.col("n_left") + F.col("n_right") - F.col("n_inter")),
        )
    )


def schema_match(
    left: DataFrame,
    right: DataFrame,
    left_cols: list | None = None,
    right_cols: list | None = None,
    name_weight: float = 0.0,
    min_score: float = 0.1,
    lowercase: bool = True,
) -> DataFrame:
    """Best 1:1 column alignment. Scores every pair as
    ``(1 - name_weight) * value_jaccard + name_weight * jw(lcol, rcol)``,
    drops pairs under ``min_score``, and resolves conflicts with the
    engine's greedy stable 1:1 matcher (strict total order, so the
    assignment is deterministic). Returns
    ``(lcol, rcol, value_jaccard, name_sim, score)``."""
    if not 0.0 <= name_weight <= 1.0:
        raise ValueError(f"name_weight must be in [0, 1], got {name_weight}")
    from record_linkage_spark.functions.similarity import jw_sim
    from record_linkage_spark.operators.matching import one_to_one_matching

    ov = value_overlap(left, right, left_cols, right_cols, lowercase)
    if name_weight > 0.0:
        ov = ov.withColumn(
            "name_sim", jw_sim(F.col("lcol"), F.col("rcol"))
        )
    else:
        ov = ov.withColumn("name_sim", F.lit(0.0))
    scored = ov.withColumn(
        "score",
        (1.0 - name_weight) * F.col("value_jaccard")
        + name_weight * F.col("name_sim"),
    ).filter(F.col("score") >= min_score)
    # namespace the two sides before 1:1 matching: a column name that
    # exists in both schemas must be two distinct nodes, not one
    kept = one_to_one_matching(
        scored.select(
            F.concat(F.lit("L:"), "lcol").alias("lcol"),
            F.concat(F.lit("R:"), "rcol").alias("rcol"),
            "score",
        ),
        id_a="lcol",
        id_b="rcol",
        score_col="score",
    ).select(
        F.expr("substring(lcol, 3)").alias("lcol"),
        F.expr("substring(rcol, 3)").alias("rcol"),
        "score",
    )
    return kept.join(
        scored.select("lcol", "rcol", "value_jaccard", "name_sim"),
        ["lcol", "rcol"],
    ).select("lcol", "rcol", "value_jaccard", "name_sim", "score")
