"""ANN operators: brute-force cosine top-k correctness vs numpy; LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.similarity_search import (
    brute_force_topk,
    cosine_sim,
    embedding_near_duplicates,
    lsh_topk,
)


def _vectors(spark, n=60, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base,
    )


def test_cosine_sim(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = [r.c for r in df.select(cosine_sim("a", "b").alias("c")).collect()]
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(0.0)
    assert got[2] == 0.0


def test_brute_force_topk_matches_numpy(spark):
    df, base = _vectors(spark)
    queries = df.filter(F.col("vec_id") < 5)
    got = brute_force_topk(df, queries, k=3).collect()
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = norm @ norm.T
    for q in range(5):
        s = sims[q].copy()
        s[q] = -np.inf
        exp = list(np.argsort(-s)[:3])
        mine = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q]
        assert mine == exp, (q, mine, exp)


def test_lsh_topk_recall(spark):
    df, _ = _vectors(spark, n=80)
    queries = df.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(df, queries, k=1).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(df, queries, k=1, num_planes=16, num_bands=8).collect()
    }
    # generous banding -> top-1 recall should be decent on random data
    assert len(exact & approx) >= 5


def test_embedding_near_duplicates(spark):
    rng = np.random.default_rng(0)
    v = rng.normal(size=12).astype(np.float32)
    rows = [
        (0, [float(x) for x in v]),
        (1, [float(x) for x in v * 2.0]),        # same direction -> cos 1
        (2, [float(x) for x in v + rng.normal(size=12, scale=0.01).astype(np.float32)]),
        (3, [float(x) for x in rng.normal(size=12)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.id_A, r.id_B) for r in embedding_near_duplicates(df, 0.99).collect()}
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p for p in got)


def test_ivf_topk_recovers_planted_neighbors(spark):
    """IVF with enough probes finds the same top-1 as brute force for
    planted near-duplicate vectors."""
    import math

    from pyspark.sql import functions as F

    from record_linkage_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
    )

    # 8 well-separated base directions in 16-dim + a near-copy of each
    rows = []
    for i in range(8):
        v = [0.0] * 16
        v[i * 2] = 1.0
        v[i * 2 + 1] = 0.3
        rows.append((i, v))
        rows.append((100 + i, [x + (0.01 if j == 0 else 0.0) for j, x in enumerate(v)]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 8)

    bf = {
        r.query_id: r.neighbor_id
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    ivf = {
        r.query_id: r.neighbor_id
        for r in ivf_topk(
            corpus, queries, k=1, n_centroids=4, n_probe=4, iterations=2
        ).collect()
    }
    # probing all cells == exhaustive: must match brute force exactly
    assert ivf == bf
    assert all(bf[i] == 100 + i for i in bf)
