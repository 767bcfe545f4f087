"""End-to-end acceptance: the north_rule's pairwise F1 >= 0.99 on labeled
pairs at the same blocking key (candidate-level, per SURVEY.md §6 — the
reference's candidate-level metrics, blocking recall measured separately),
plus full pipeline-to-clusters sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.blocking import (
    apply_blocking_filter,
    blocking_metrics,
)
from record_linkage_spark.operators.classifier import (
    score_pairs,
    train_logistic_regression,
    tune_threshold,
)
from record_linkage_spark.operators.clustering import assign_entities
from record_linkage_spark.operators.evaluate import confusion_metrics, evaluate_global
from record_linkage_spark.operators.features import FEATURE_INPUT_COLS, add_features
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

HYDRATE_COLS = sorted(set(FEATURE_INPUT_COLS) | {"text_len_bucket"})


@pytest.fixture(scope="module")
def linkage(spark):
    raw = generate_transcripts(spark, n_entities=400, dup_rate=1.8)
    transcripts = transcripts_table(raw)
    profiles = rollup_conversations(transcripts).cache()
    keys = hidden_key_table(raw)
    gt = build_ground_truth(profiles, keys.select("conv_id", "entity_key"), neg_ratio=2.0)
    hydrated = hydrate_pairs(gt, profiles, HYDRATE_COLS).cache()
    # train once for the whole module: features over B1-blocked GT pairs,
    # LR on train split, threshold tuned on val
    feats = add_features(apply_blocking_filter(hydrated, "B1")).cache()
    model = train_logistic_regression(feats.filter(F.col("split") == "train"))
    tau, _ = tune_threshold(score_pairs(feats.filter(F.col("split") == "val"), model))
    model.threshold = tau
    return {
        "raw": raw,
        "transcripts": transcripts,
        "profiles": profiles,
        "keys": keys,
        "gt": gt,
        "hydrated": hydrated,
        "feats": feats,
        "model": model,
    }


def test_f1_on_labeled_pairs_at_blocking_key(spark, linkage):
    """Candidate-level F1 >= 0.99 on labeled pairs that share the blocking
    key — the BASELINE.json acceptance metric."""
    feats, model = linkage["feats"], linkage["model"]
    scored_test = score_pairs(feats.filter(F.col("split") == "test"), model)
    m = confusion_metrics(scored_test.select("label", "pred"))
    assert m["f1"] >= 0.99, m


def test_blocking_recall_reasonable(spark, linkage):
    hydrated = linkage["hydrated"]
    test_pairs = hydrated.filter(F.col("split") == "test")
    cand = apply_blocking_filter(test_pairs, "B1")
    m = blocking_metrics(
        test_pairs.select("id_A", "id_B", "label"),
        cand.select("id_A", "id_B"),
        "B1",
    )
    # reference B1: 0.9797 recall; perturbed duplicates should mostly block
    assert m["blocking_recall"] >= 0.85, m
    assert m["reduction_ratio_vs_test"] > 0.5, m


def test_global_eval_and_clusters(spark, linkage):
    """Full path: train on GT, score candidates, global metrics + CC entity
    assignment agreeing with the hidden entity ids."""
    profiles = linkage["profiles"]
    feats, model = linkage["feats"], linkage["model"]
    scored = score_pairs(feats, model)
    gm = evaluate_global(
        linkage["gt"].select("id_A", "id_B", "label"),
        scored.select("id_A", "id_B", "pred"),
    )
    assert gm["f1"] >= 0.95, gm

    edges = scored.filter(F.col("pred") == 1).select(
        F.col("id_A").alias("src"), F.col("id_B").alias("dst")
    )
    clusters = assign_entities(profiles.select("conv_id"), edges)
    truth = linkage["keys"].select("conv_id", F.col("entity_id").alias("true_entity"))
    j = clusters.join(truth, "conv_id")
    # pairwise cluster agreement on GT-labeled pairs
    a = j.select(
        F.col("conv_id").alias("id_A"),
        F.col("entity_id").alias("ca"),
        F.col("true_entity").alias("ta"),
    )
    b = j.select(
        F.col("conv_id").alias("id_B"),
        F.col("entity_id").alias("cb"),
        F.col("true_entity").alias("tb"),
    )
    pairs = linkage["gt"].select("id_A", "id_B").join(a, "id_A").join(b, "id_B")
    agree = pairs.select(
        F.avg(((F.col("ca") == F.col("cb")) == (F.col("ta") == F.col("tb"))).cast("double")).alias("acc")
    ).first()
    assert agree.acc >= 0.95
