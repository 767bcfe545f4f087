"""Truth discovery: source-accuracy-weighted conflict resolution.

Yin, Han & Yu, "Truth Discovery with Multiple Conflicting Information
Providers on the Web" (TruthFinder, KDD 2007) and Dong, Berti-Equille &
Srivastava's ACCU model (VLDB 2009): when sources disagree about an
entity's attribute, majority vote is wrong whenever bad sources are
plentiful or copy each other — instead, iterate the mutually-recursive
fixpoint "a value is likely true if accurate sources claim it; a source
is accurate if it claims likely-true values".

This implements the ACCU vote-count iteration: each source carries an
accuracy A(s) (uniform prior to start); a claimed value's score is the
sum over its claiming sources of the vote count

    vote(s) = ln( A(s) * (n_false - 1) / (1 - A(s)) )

(n_false = assumed number of uniformly-likely false values — the ACCU
independence assumption); the per-(entity, attribute) truth is the
argmax-score value (ties break to the smallest value, deterministic);
then A(s) re-estimates as the Laplace-smoothed fraction of s's claims
that match the current truths. A handful of iterations converges.

The canonical behavior this buys over survivorship's mode rule: two
sloppy sources copying the same wrong value outvote one careful source
under majority, but lose here once the careful source's accuracy is
learned from the attributes where it demonstrably agrees with reality.

Scale shape: claims (entity, attr, source, value) is the only big
table; every iteration is two grouped aggregates + one argmax window
keyed by (entity, attr) and one join on source — accuracies live in a
small per-source table that broadcasts. Iteration count is fixed and
small; per-iteration state is localCheckpoint'ed so lineage stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def truth_discovery(
    claims: DataFrame,
    entity_col: str = "entity_id",
    attr_col: str = "attr",
    src_col: str = "source_id",
    val_col: str = "value",
    iterations: int = 5,
    prior_accuracy: float = 0.8,
    n_false: float = 10.0,
    max_accuracy: float = 0.99,
) -> tuple[DataFrame, DataFrame]:
    """Run the ACCU iteration over ``claims``; returns
    ``(truths, accuracies)`` where truths is one row per (entity, attr):
    ``(entity, attr, value, score, n_sources)`` and accuracies is
    ``(source, accuracy, n_claims)``. Accuracies clamp to
    ``[1 - max_accuracy, max_accuracy]`` so vote counts stay finite.
    Null-valued claims are ignored (a source silent on an attribute
    neither helps nor hurts it)."""
    c = (
        claims.select(
            F.col(entity_col).alias("_e"),
            F.col(attr_col).alias("_a"),
            F.col(src_col).alias("_s"),
            F.col(val_col).cast("string").alias("_v"),
        )
        .filter(F.col("_v").isNotNull())
        .localCheckpoint()
    )
    srcs = c.select("_s").distinct().select(
        "_s", F.lit(float(prior_accuracy)).alias("_acc")
    )

    def _vote(acc):
        a = F.least(
            F.greatest(acc, F.lit(1.0 - max_accuracy)), F.lit(max_accuracy)
        )
        return F.log(a * F.lit(n_false - 1.0) / (1.0 - a))

    w = Window.partitionBy("_e", "_a").orderBy(F.desc("_score"), F.asc("_v"))
    truths = None
    for _ in range(max(iterations, 1)):
        scored = (
            c.join(F.broadcast(srcs), "_s")
            .groupBy("_e", "_a", "_v")
            .agg(
                F.sum(_vote(F.col("_acc"))).alias("_score"),
                F.count("*").alias("_n_src"),
            )
        )
        truths = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint()
        )
        # re-estimate accuracy: Laplace-smoothed agreement with truths
        agree = (
            c.join(
                truths.select("_e", "_a", F.col("_v").alias("_tv")),
                ["_e", "_a"],
            )
            .groupBy("_s")
            .agg(
                F.count("*").alias("_n"),
                F.sum((F.col("_v") == F.col("_tv")).cast("int")).alias("_ok"),
            )
        )
        srcs = agree.select(
            "_s",
            ((F.col("_ok") + 1.0) / (F.col("_n") + 2.0)).alias("_acc"),
        ).localCheckpoint()

    out_truths = truths.select(
        F.col("_e").alias(entity_col),
        F.col("_a").alias(attr_col),
        F.col("_v").alias(val_col),
        F.col("_score").alias("score"),
        F.col("_n_src").alias("n_sources"),
    )
    n_claims = c.groupBy("_s").agg(F.count("*").alias("n_claims"))
    out_srcs = srcs.join(n_claims, "_s").select(
        F.col("_s").alias(src_col),
        F.col("_acc").alias("accuracy"),
        "n_claims",
    )
    return out_truths, out_srcs
