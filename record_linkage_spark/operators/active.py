"""Active-learning label acquisition (the reference's Dedupe console
loop, ``src/matching/dedupe.py:196-228``, re-expressed batch-native).

The reference wraps dedupe's ``console_label``: the library picks the
candidate pairs the current model is most uncertain about, a human
labels them, the model retrains, repeat. The same loop works unattended
at warehouse scale when "a human" is any labeling source (an adjudication
queue, a stronger-but-expensive model, a clerical-review table):

  1. score the UNLABELED candidate pool with the current model —
     fully distributed, the same codegen sigmoid as batch scoring;
  2. take the ``k`` most uncertain pairs (smallest ``|score - 0.5|``,
     ties broken by pair id so the selection is deterministic). This is
     a bounded TakeOrdered — k is sized to the labeling budget (tens to
     thousands), never to the pool, so the driver-side result is small
     by construction;
  3. obtain labels for exactly those pairs from the labeler callback;
  4. refit the LR on all labels gathered so far (driver-side IRLS on
     the small labeled matrix, mirroring the reference's sklearn fit)
     and stop early once validation F1 stops improving.

Everything heavy (scoring, anti-join to exclude labeled pairs) stays on
executors; only the k picked pairs and the labeled feature matrix ever
reach the driver — the same driver-size discipline as ``classifier.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.operators.classifier import (
    LinearModel,
    score_pairs,
    train_logistic_regression,
    tune_threshold,
)

PAIR_KEY = ["id_A", "id_B"]


def select_uncertain(
    scored: DataFrame, k: int, score_col: str = "score"
) -> DataFrame:
    """The k pairs the model is least sure about: smallest |score - 0.5|,
    deterministic under ties (pair-id order). Bounded TakeOrdered — k is
    the labeling budget, not a function of pool size."""
    unc = F.abs(F.col(score_col) - F.lit(0.5)).alias("_unc")
    return (
        scored.select(*PAIR_KEY, score_col, unc)
        .orderBy("_unc", *PAIR_KEY)
        .limit(k)
        .drop("_unc")
    )


def active_learning_loop(
    featurized_pool: DataFrame,
    seed_labels: DataFrame,
    labeler: Callable[[DataFrame], DataFrame],
    k_per_round: int = 20,
    max_rounds: int = 5,
    feature_names: list[str] | None = None,
    val_pairs: DataFrame | None = None,
    min_improvement: float = 1e-3,
) -> tuple[LinearModel, DataFrame, list[dict]]:
    """Run the uncertainty-sampling loop.

    ``featurized_pool``: candidate pairs with feature columns already
    attached (``add_features``/``add_dedupe_features`` output) —
    materialize it (checkpoint / stage table) before calling, it is
    re-scored every round. ``seed_labels``/labeler output: frames of
    (id_A, id_B, label). ``val_pairs``: labeled featurized pairs for
    threshold tuning + the early-stop signal.

    Returns (final model, all labels gathered, per-round history).
    """
    labels = seed_labels.select(*PAIR_KEY, "label").localCheckpoint()
    history: list[dict] = []
    best_f1 = -1.0
    model = LinearModel(weights=[], intercept=0.0)
    for rnd in range(max_rounds):
        # cold start: with one labeled class the LR is degenerate (the
        # reference's dedupe refuses to train until both classes are
        # labeled) — train anyway for continuity, but neither trust the
        # plateau signal nor the uncertainty ranking until both classes
        # exist; explore by stable hash order instead.
        degenerate = labels.select("label").distinct().count() < 2
        train = featurized_pool.join(labels, PAIR_KEY)
        model = train_logistic_regression(train, feature_names=feature_names)
        f1 = None
        if val_pairs is not None:
            thr, f1 = tune_threshold(score_pairs(val_pairs, model))
            model.threshold = thr
        history.append(
            {
                "round": rnd,
                "n_labels": labels.count(),
                "val_f1": f1,
                "explored": degenerate,
            }
        )
        if f1 is not None and not degenerate:
            if f1 <= best_f1 + min_improvement and best_f1 >= 0.0:
                break
            best_f1 = max(best_f1, f1)
        if rnd == max_rounds - 1:
            break
        unlabeled = featurized_pool.join(labels, PAIR_KEY, "left_anti")
        if degenerate:
            picks = (
                unlabeled.select(*PAIR_KEY)
                .orderBy(F.md5(F.concat_ws("|", *PAIR_KEY)), *PAIR_KEY)
                .limit(k_per_round)
            )
        else:
            picks = select_uncertain(score_pairs(unlabeled, model), k_per_round)
        if picks.isEmpty():
            break
        new_labels = labeler(picks.select(*PAIR_KEY)).select(*PAIR_KEY, "label")
        labels = (
            labels.unionByName(new_labels)
            .dropDuplicates(PAIR_KEY)
            .localCheckpoint()
        )
    return model, labels, history


def hard_negatives(
    topk: DataFrame,
    positives: DataFrame,
    per_query: int = 5,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    score_col: str = "cosine",
    pos_cols: tuple[str, str] = ("id_A", "id_B"),
) -> DataFrame:
    """Highest-similarity NON-matching neighbors per query — the
    training negatives that teach a scorer the decision boundary, where
    random negatives (X2's stratified sampler) teach it almost nothing
    once it clears the easy cases (the BM25/ANN hard-negative recipe of
    Karpukhin et al., "Dense Passage Retrieval", EMNLP 2020, applied to
    the ER candidate space).

    ``topk`` is any neighbor frame shaped like the ANN operators'
    output (``(query_id, neighbor_id, <score>, ...)``); ``positives``
    is the ground-truth match table whose pair-id columns are named by
    ``pos_cols`` (any orientation — pairs are canonicalized before the
    exclusion). Returns the ``per_query``
    most-similar surviving neighbors per query with ``hn_rank``.

    Scale shape: the exclusion is ONE anti-join on the canonical pair
    key (the ground-truth side is the small one — AQE broadcasts it);
    the re-rank window partitions by query over at most the input's k
    rows per query. Nothing collects.
    """
    if per_query < 1:
        raise ValueError(f"per_query must be >= 1, got {per_query}")
    from pyspark.sql import Window

    qc, nc = F.col(query_col), F.col(neighbor_col)
    cand = topk.withColumn("_ka", F.least(qc, nc)).withColumn(
        "_kb", F.greatest(qc, nc)
    )
    pa, pb = F.col(pos_cols[0]), F.col(pos_cols[1])
    pos = positives.select(
        F.least(pa, pb).alias("_ka"),
        F.greatest(pa, pb).alias("_kb"),
    ).distinct()
    survivors = cand.join(pos, ["_ka", "_kb"], "left_anti").drop("_ka", "_kb")
    w = Window.partitionBy(query_col).orderBy(
        F.desc(score_col), F.asc(neighbor_col)
    )
    return (
        survivors.withColumn("hn_rank", F.row_number().over(w))
        .filter(F.col("hn_rank") <= per_query)
    )
