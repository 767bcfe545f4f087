"""Active-learning loop (reference Dedupe console_label analogue):
uncertainty sampling must be deterministic and the loop must lift
held-out F1 over the seed-only model with a small labeling budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_linkage_spark.operators.active import (
    active_learning_loop,
    select_uncertain,
)
from record_linkage_spark.operators.classifier import (
    score_pairs,
    train_logistic_regression,
    tune_threshold,
)
from record_linkage_spark.operators.evaluate import confusion_metrics


def _labeled_pool(spark):
    """Featurized labeled pair pool from the synthetic corpus: full GT
    (hidden-key labels), hydrated + featurized once."""
    from record_linkage_spark.operators.features import (
        FEATURE_INPUT_COLS,
        add_features,
    )
    from record_linkage_spark.operators.ground_truth import (
        build_ground_truth,
        hydrate_pairs,
    )
    from record_linkage_spark.operators.rollup import rollup_conversations
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        hidden_key_table,
        transcripts_table,
    )

    raw = generate_transcripts(spark, n_entities=120, dup_rate=1.8)
    profiles = rollup_conversations(transcripts_table(raw)).localCheckpoint()
    keys = hidden_key_table(raw).select("conv_id", "entity_key").localCheckpoint()
    gt = build_ground_truth(profiles, keys)
    cols = sorted(set(FEATURE_INPUT_COLS) | {"text_len_bucket"})
    return add_features(hydrate_pairs(gt, profiles, cols)).localCheckpoint()


def test_select_uncertain_deterministic(spark):
    pool = spark.createDataFrame(
        [("a", "b", 0.9), ("c", "d", 0.52), ("e", "f", 0.48), ("g", "h", 0.52)],
        "id_A string, id_B string, score double",
    )
    picks = [tuple(r) for r in select_uncertain(pool, 2).collect()]
    # 0.52/0.48 tie at |.02|; (c,d) < (e,f) < (g,h) by pair id
    assert [p[:2] for p in picks] == [("c", "d"), ("e", "f")]
    again = [tuple(r)[:2] for r in select_uncertain(pool, 2).collect()]
    assert [p[:2] for p in picks] == again


def test_active_loop_improves_f1_with_small_budget(spark):
    pool = _labeled_pool(spark)
    train_pool = pool.filter(F.col("split") == "train")
    val = pool.filter(F.col("split") == "val").localCheckpoint()
    test = pool.filter(F.col("split") == "test").localCheckpoint()
    truth = train_pool.select("id_A", "id_B", "label").localCheckpoint()

    # tiny seed: first 4 pairs by id (usually class-skewed — the realistic
    # cold start the loop must climb out of)
    seed = truth.orderBy("id_A", "id_B").limit(4).localCheckpoint()

    def f1_on_test(model):
        thr, _ = tune_threshold(score_pairs(val, model))
        model.threshold = thr
        return confusion_metrics(score_pairs(test, model))["f1"]

    baseline_model = train_logistic_regression(train_pool.join(seed.select("id_A", "id_B"), ["id_A", "id_B"]))
    baseline_f1 = f1_on_test(baseline_model)

    def oracle_labeler(pairs):
        # stands in for the reference's console human: answers from the
        # hidden ground truth, only for the pairs asked about
        return pairs.join(truth, ["id_A", "id_B"])

    model, labels, history = active_learning_loop(
        train_pool.drop("label"),
        seed,
        oracle_labeler,
        k_per_round=15,
        max_rounds=4,
        val_pairs=val,
    )
    final_f1 = f1_on_test(model)
    assert final_f1 >= baseline_f1
    assert final_f1 >= 0.9  # small budget reaches a usable matcher
    n_labels = labels.count()
    assert n_labels <= 4 + 15 * 3  # budget respected
    assert [h["round"] for h in history] == list(range(len(history)))


def test_hard_negatives_exclude_positives_and_rank(spark):
    from record_linkage_spark.operators.active import hard_negatives

    topk = spark.createDataFrame(
        [
            (1, 2, 0.99, 1), (1, 3, 0.95, 2), (1, 4, 0.90, 3), (1, 5, 0.85, 4),
            (2, 1, 0.99, 1), (2, 6, 0.80, 2),
        ],
        "query_id long, neighbor_id long, cosine double, rank int",
    )
    # (1,2) and (2,1) are true matches — both orientations canonicalize
    gt = spark.createDataFrame([(2, 1)], "id_A long, id_B long")
    out = hard_negatives(topk, gt, per_query=2).collect()
    got = {(r.query_id, r.hn_rank): r.neighbor_id for r in out}
    # query 1: 2 excluded -> hardest survivors 3 then 4; query 2: 1 excluded -> 6
    assert got == {(1, 1): 3, (1, 2): 4, (2, 1): 6}


def test_hard_negatives_tie_break_and_validation(spark):
    import pytest

    from record_linkage_spark.operators.active import hard_negatives

    topk = spark.createDataFrame(
        [(1, 9, 0.5, 1), (1, 7, 0.5, 2), (1, 8, 0.5, 3)],
        "query_id long, neighbor_id long, cosine double, rank int",
    )
    gt = spark.createDataFrame([], "id_A long, id_B long")
    out = hard_negatives(topk, gt, per_query=2).collect()
    assert [(r.hn_rank, r.neighbor_id) for r in sorted(out, key=lambda r: r.hn_rank)] == [
        (1, 7), (2, 8)
    ]
    with pytest.raises(ValueError):
        hard_negatives(topk, gt, per_query=0)


def test_hard_negatives_custom_pos_cols(spark):
    """The positives frame's pair-id columns are configurable (ADVICE r4):
    a ground-truth table named (left_id, right_id) excludes the same
    pairs as the default (id_A, id_B) schema."""
    from record_linkage_spark.operators.active import hard_negatives

    topk = spark.createDataFrame(
        [(1, 2, 0.99, 1), (1, 3, 0.95, 2), (2, 1, 0.99, 1), (2, 6, 0.80, 2)],
        "query_id long, neighbor_id long, cosine double, rank int",
    )
    gt = spark.createDataFrame([(2, 1)], "left_id long, right_id long")
    out = hard_negatives(
        topk, gt, per_query=2, pos_cols=("left_id", "right_id")
    ).collect()
    got = {(r.query_id, r.hn_rank): r.neighbor_id for r in out}
    assert got == {(1, 1): 3, (2, 1): 6}
