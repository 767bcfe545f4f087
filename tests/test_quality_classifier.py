from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.quality_classifier import (
    INTERCEPT_FEAT,
    hashed_ngram_features,
    nb_quality_weights,
    pareto_sample_column,
    score_quality,
    train_quality_lr,
)

DIM = 1 << 10


def _corpus(spark, n=300, seed_shift=0):
    """Deterministic good/bad docs: good = varied vocabulary, bad =
    spam-token repetition (the signal a quality classifier exists to
    learn)."""
    rows = []
    good_vocab = ["alpha", "beta", "gamma", "delta", "query", "join", "scan", "merge"]
    for i in range(n):
        j = i + seed_shift
        if i % 2 == 0:
            toks = [good_vocab[(j * 7 + k) % len(good_vocab)] for k in range(12)]
            y = 1
        else:
            toks = ["buy", "now", "click"] * 4 + [f"spam{j % 3}"] * 6
            y = 0
        rows.append((j, " ".join(toks), y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _np_features(rows, dim=DIM):
    """Numpy replay of hashed_ngram_features (unigrams+bigrams, L1)."""
    import hashlib

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim

    out = {}
    for doc_id, text, _y in rows:
        toks = [t for t in text.lower().strip().split() if t]
        grams = toks + [a + "\x02" + b for a, b in zip(toks, toks[1:])]
        cnt = {}
        for g in grams:
            cnt[h(g)] = cnt.get(h(g), 0) + 1
        tot = sum(cnt.values())
        out[doc_id] = {f: c / tot for f, c in cnt.items()}
        out[doc_id][INTERCEPT_FEAT] = 1.0
    return out


def test_hashed_features_match_numpy_replay(spark):
    docs = _corpus(spark, 40)
    rows = [(r.doc_id, r.text, r.y) for r in docs.collect()]
    feats = hashed_ngram_features(docs, dim=DIM).collect()
    want = _np_features(rows)
    got = {}
    for r in feats:
        got.setdefault(r.id, {})[r.feat] = r.x
    assert set(got) == set(want)
    for d in want:
        assert set(got[d]) == set(want[d])
        for f in want[d]:
            assert got[d][f] == pytest.approx(want[d][f], abs=1e-12)


def test_nb_weights_match_closed_form(spark):
    docs = _corpus(spark, 60)
    feats = hashed_ngram_features(docs, dim=DIM)
    labels = docs.select(F.col("doc_id").alias("id"), "y")
    w = {r.feat: r.w for r in nb_quality_weights(feats, labels, dim=DIM).collect()}

    rows = [(r.doc_id, r.text, r.y) for r in docs.collect()]
    X = _np_features(rows)
    npos = sum(1 for _, _, y in rows if y == 1)
    nneg = len(rows) - npos
    pm, nm = {}, {}
    for doc_id, _, y in rows:
        for f, x in X[doc_id].items():
            if f == INTERCEPT_FEAT:
                continue
            (pm if y == 1 else nm)[f] = (pm if y == 1 else nm).get(f, 0.0) + x
    a = 1.0
    for f in set(pm) | set(nm):
        want = math.log((pm.get(f, 0.0) + a) / (npos + a * DIM)) - math.log(
            (nm.get(f, 0.0) + a) / (nneg + a * DIM)
        )
        assert w[f] == pytest.approx(want, rel=1e-9)
    assert w[INTERCEPT_FEAT] == pytest.approx(math.log((npos + a) / (nneg + a)))


def test_nb_scorer_separates_heldout(spark):
    train = _corpus(spark, 300)
    test = _corpus(spark, 100, seed_shift=10_000)
    ftr = hashed_ngram_features(train, dim=DIM)
    fte = hashed_ngram_features(test, dim=DIM)
    w = nb_quality_weights(ftr, train.select(F.col("doc_id").alias("id"), "y"), dim=DIM)
    scored = score_quality(fte, w).join(
        test.select(F.col("doc_id").alias("id"), "y"), "id"
    )
    acc = scored.select(
        F.avg(((F.col("p_good") > 0.5).cast("int") == F.col("y")).cast("int")).alias("a")
    ).first().a
    assert acc >= 0.95


def test_lr_one_step_matches_numpy(spark):
    docs = _corpus(spark, 30)
    feats = hashed_ngram_features(docs, dim=DIM)
    labels = docs.select(F.col("doc_id").alias("id"), "y")
    lr, l2 = 0.7, 1e-3
    w1 = {
        r.feat: r.w
        for r in train_quality_lr(feats, labels, n_iter=1, lr=lr, l2=l2).collect()
    }
    rows = [(r.doc_id, r.text, r.y) for r in docs.collect()]
    X = _np_features(rows)
    n = len(rows)
    # zero init -> margin 0 -> p 0.5 -> r = 0.5 - y
    grad = {}
    for doc_id, _, y in rows:
        r = 0.5 - y
        for f, x in X[doc_id].items():
            grad[f] = grad.get(f, 0.0) + r * x / n
    for f, g in grad.items():
        assert w1[f] == pytest.approx(-lr * g, rel=1e-9, abs=1e-12)


def test_lr_with_nb_warm_start_classifies(spark):
    train = _corpus(spark, 200)
    test = _corpus(spark, 80, seed_shift=50_000)
    ftr = hashed_ngram_features(train, dim=DIM)
    labels = train.select(F.col("doc_id").alias("id"), "y")
    nb = nb_quality_weights(ftr, labels, dim=DIM)
    w = train_quality_lr(ftr, labels, n_iter=2, lr=1.0, init_weights=nb)
    scored = score_quality(hashed_ngram_features(test, dim=DIM), w).join(
        test.select(F.col("doc_id").alias("id"), "y"), "id"
    )
    acc = scored.select(
        F.avg(((F.col("p_good") > 0.5).cast("int") == F.col("y")).cast("int")).alias("a")
    ).first().a
    assert acc >= 0.95


def test_features_partitioning_invariant(spark):
    d1 = _corpus(spark, 120).repartition(2)
    d2 = _corpus(spark, 120).repartition(11)
    f1 = hashed_ngram_features(d1, dim=DIM)
    f2 = hashed_ngram_features(d2, dim=DIM)
    assert f1.exceptAll(f2).count() == 0
    assert f2.exceptAll(f1).count() == 0


def test_pareto_sample_keeps_high_quality_more(spark):
    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(0.95)).otherwise(F.lit(0.05)).alias("p"),
    )
    kept = df.withColumn(
        "keep", pareto_sample_column(F.col("p"), F.col("id").cast("string"))
    )
    rates = {
        r.p: r.rate
        for r in kept.groupBy("p").agg(F.avg(F.col("keep").cast("int")).alias("rate")).collect()
    }
    # GPT-3's rule keeps with prob (2 - score)^-alpha: ~0.644 at 0.95,
    # ~0.0025 at 0.05 — soft preference, not a hard cliff
    assert 0.55 < rates[0.95] < 0.75
    assert rates[0.05] < 0.02
    assert rates[0.95] > rates[0.05]


def test_scorer_plan_is_jvm_side(spark):
    docs = _corpus(spark, 50)
    feats = hashed_ngram_features(docs, dim=DIM)
    w = nb_quality_weights(feats, docs.select(F.col("doc_id").alias("id"), "y"), dim=DIM)
    plan = score_quality(feats, w)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "BroadcastHashJoin" in plan
