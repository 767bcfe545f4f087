"""Product quantization (train / encode / ADC top-k) — pinned against a
from-scratch numpy replay of encode+LUT+ADC on the operator's own
codebooks, a Lloyd-improves-reconstruction property, planted-copy
retrieval, and partitioning invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.similarity_search import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)


def _vec_df(spark, arrs, parts=None):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(arrs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts) if parts else df


def _rng_vecs(n, dim, seed, clusters=0):
    rng = np.random.default_rng(seed)
    if clusters:
        centers = rng.normal(size=(clusters, dim)) * 4
        return centers[rng.integers(0, clusters, n)] + rng.normal(size=(n, dim))
    return rng.normal(size=(n, dim))


def _np_codebooks(cb_rows):
    m = max(r.sub for r in cb_rows) + 1
    k = max(r.code for r in cb_rows) + 1
    books = np.zeros((m, k, len(cb_rows[0].centroid)))
    for r in cb_rows:
        books[r.sub][r.code] = r.centroid
    return books


def _np_encode(vecs, books):
    m, _, L = books.shape
    codes = np.zeros((len(vecs), m), dtype=int)
    for vi, v in enumerate(vecs):
        for s in range(m):
            d = ((books[s] - v[s * L:(s + 1) * L]) ** 2).sum(axis=1)
            codes[vi][s] = int(np.argmin(d))  # ties -> smallest code
    return codes


def test_adc_matches_numpy_reference(spark):
    vecs = _rng_vecs(24, 8, seed=3, clusters=3)
    df = _vec_df(spark, vecs, parts=5)
    queries = _vec_df(spark, vecs[:3])
    got = {
        (r.query_id, r.neighbor_id): (r.adc, r.rank)
        for r in pq_topk(
            df, queries, k=23, m_subspaces=2, k_codes=4, iterations=2
        ).collect()
    }
    books = _np_codebooks(
        train_pq_codebooks(df, 2, 4, iterations=2).collect()
    )
    codes = _np_encode(vecs, books)
    L = books.shape[2]
    for qi in range(3):
        adcs = {}
        for ni in range(24):
            if ni == qi:
                continue
            adcs[ni] = round(
                sum(
                    float(vecs[qi][s * L:(s + 1) * L] @ books[s][codes[ni][s]])
                    for s in range(books.shape[0])
                ),
                6,
            )
        order = sorted(adcs, key=lambda n: (-adcs[n], n))
        for rank, ni in enumerate(order, 1):
            assert got[(qi, ni)] == (pytest.approx(adcs[ni], abs=1e-6), rank)


def test_encode_matches_numpy_and_lloyd_improves_reconstruction(spark):
    vecs = _rng_vecs(40, 8, seed=7, clusters=4)
    df = _vec_df(spark, vecs)

    def recon_err(iterations):
        books = _np_codebooks(
            train_pq_codebooks(df, 2, 4, iterations=iterations).collect()
        )
        enc = {
            r.vec_id: r.codes
            for r in pq_encode(
                df, train_pq_codebooks(df, 2, 4, iterations=iterations)
            ).collect()
        }
        np_codes = _np_encode(vecs, books)
        L = books.shape[2]
        err = 0.0
        for vi, v in enumerate(vecs):
            assert list(np_codes[vi]) == list(enc[vi])  # encode parity
            dec = np.concatenate(
                [books[s][enc[vi][s]] for s in range(books.shape[0])]
            )
            err += float(((v - dec) ** 2).sum())
        return err / len(vecs)

    assert recon_err(3) < recon_err(0)  # Lloyd beats the raw init


def test_planted_copy_retrieved_top1(spark):
    base = _rng_vecs(60, 16, seed=11)
    base = base / np.linalg.norm(base, axis=1, keepdims=True)
    corpus = list(base) + [base[i] for i in range(5)]  # ids 60..64 = copies
    df = _vec_df(spark, corpus)
    queries = _vec_df(spark, corpus[:5])
    top = {
        r.query_id: r.neighbor_id
        for r in pq_topk(
            df, queries, k=1, m_subspaces=4, k_codes=8, iterations=3
        ).collect()
    }
    hits = sum(1 for qi in range(5) if top[qi] == qi + 60)
    assert hits >= 4  # identical codes -> the exact copy wins ADC


def test_pq_partitioning_invariance(spark):
    vecs = _rng_vecs(30, 8, seed=13, clusters=3)
    a = pq_topk(
        _vec_df(spark, vecs, parts=1), _vec_df(spark, vecs[:2]),
        k=5, m_subspaces=2, k_codes=4,
    ).collect()
    b = pq_topk(
        _vec_df(spark, vecs, parts=16), _vec_df(spark, vecs[:2]),
        k=5, m_subspaces=2, k_codes=4,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dim_must_divide(spark):
    with pytest.raises(ValueError):
        train_pq_codebooks(_vec_df(spark, _rng_vecs(8, 9, 1)), m_subspaces=2)


def test_ivfpq_planted_copy_and_probe_containment(spark):
    from record_linkage_spark.operators.similarity_search import (
        _assign_cells,
        cosine_sim,
        ivfpq_topk,
        train_ivf_centroids,
    )

    base = _rng_vecs(60, 16, seed=17)
    base = base / np.linalg.norm(base, axis=1, keepdims=True)
    corpus = list(base) + [base[i] for i in range(5)]  # ids 60..64 = copies
    df = _vec_df(spark, corpus)
    queries = _vec_df(spark, corpus[:5])
    out = ivfpq_topk(
        df, queries, k=3, n_centroids=8, n_probe=3,
        m_subspaces=4, k_codes=8, iterations=2,
    ).collect()
    top = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    # the exact copy shares the query's cell AND codes -> it wins ADC
    assert sum(1 for qi in range(5) if top[qi] == qi + 60) >= 4

    # every candidate actually lives in one of its query's probed cells
    cents = train_ivf_centroids(df, 8, 2)
    cells = {
        r._vid: r.cell for r in _assign_cells(df, cents, "vec_id", "embedding").collect()
    }
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "s", cosine_sim("qv", "centroid")
    ).collect()
    by_q: dict = {}
    for r in scored:
        by_q.setdefault(r.query_id, []).append((-r.s, r.cell))
    probed = {
        qid: {c for _, c in sorted(v)[:3]} for qid, v in by_q.items()
    }
    for r in out:
        assert cells[r.neighbor_id] in probed[r.query_id]


def test_ivfpq_partitioning_invariance(spark):
    vecs = _rng_vecs(40, 8, seed=19, clusters=4)
    from record_linkage_spark.operators.similarity_search import ivfpq_topk

    a = ivfpq_topk(
        _vec_df(spark, vecs, parts=1), _vec_df(spark, vecs[:2]),
        k=5, n_centroids=4, n_probe=2, m_subspaces=2, k_codes=4,
    ).collect()
    b = ivfpq_topk(
        _vec_df(spark, vecs, parts=16), _vec_df(spark, vecs[:2]),
        k=5, n_centroids=4, n_probe=2, m_subspaces=2, k_codes=4,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
