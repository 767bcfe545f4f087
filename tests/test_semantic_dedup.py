"""SemDeDup semantic dedup: within-cell pair generation vs numpy brute
force, the keep-the-cluster-outlier policy, and partitioning invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.similarity_search import (
    semantic_deduplicate,
    semantic_duplicate_pairs,
)


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


def _grouped_vectors(spark, seed=11, n_groups=6, group_size=4, n_singles=20, dim=16):
    """Well-separated planted duplicate groups: each group is one random
    direction plus tiny perturbations (within-group cosine > 0.999), and
    singles are fresh random directions (cross-group cosine << 0.9 in
    16-d with overwhelming margin at this seed — asserted, not assumed)."""
    rng = np.random.default_rng(seed)
    vecs, gid = [], []
    for g in range(n_groups):
        d = rng.normal(size=dim)
        d /= np.linalg.norm(d)
        for _ in range(group_size):
            vecs.append((d + rng.normal(scale=1e-3, size=dim)).astype(np.float32))
            gid.append(g)
    for _ in range(n_singles):
        d = rng.normal(size=dim)
        vecs.append((d / np.linalg.norm(d)).astype(np.float32))
        gid.append(-1)
    base = np.stack(vecs)
    # verify the margin the tests rely on
    for i in range(len(base)):
        for j in range(i + 1, len(base)):
            c = _cos(base[i], base[j])
            if gid[i] == gid[j] and gid[i] >= 0:
                assert c > 0.999
            else:
                assert c < 0.9
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, base, gid


def test_single_cell_pairs_equal_numpy_brute_force(spark):
    df, base, gid = _grouped_vectors(spark)
    got = {
        (r.id_A, r.id_B)
        for r in semantic_duplicate_pairs(
            df, cosine_threshold=0.95, n_clusters=1, iterations=1
        ).collect()
    }
    want = {
        (i, j)
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if _cos(base[i], base[j]) >= 0.95
    }
    assert got == want
    # and the planted structure is exactly the within-group pairs
    assert want == {
        (i, j)
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if gid[i] == gid[j] and gid[i] >= 0
    }


def test_multi_cell_pairs_find_planted_groups_no_false_positives(spark):
    df, base, gid = _grouped_vectors(spark)
    pairs = semantic_duplicate_pairs(
        df, cosine_threshold=0.95, n_clusters=4, iterations=3
    ).collect()
    got = {(r.id_A, r.id_B) for r in pairs}
    want = {
        (i, j)
        for i in range(len(base))
        for j in range(i + 1, len(base))
        if gid[i] == gid[j] and gid[i] >= 0
    }
    # tight groups sit in one k-means cell, so within-cell search is exact
    # on them; nothing below tau can appear no matter the cells
    assert got == want
    assert all(r.cosine >= 0.95 for r in pairs)


def test_keep_policy_is_farthest_from_centroid(spark):
    # one cluster of all-duplicate vectors: after any Lloyd iteration the
    # single centroid is the global mean, so the SemDeDup keep policy
    # (lowest cosine to centroid, ties -> smallest id) is numpy-checkable
    rng = np.random.default_rng(5)
    d = rng.normal(size=8)
    d /= np.linalg.norm(d)
    base = np.stack(
        [(d + rng.normal(scale=1e-2, size=8)).astype(np.float32) for _ in range(7)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(7)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_deduplicate(
        df, cosine_threshold=0.95, n_clusters=1, iterations=2
    ).collect()
    assert len(out) == 7
    assert len({r.group_id for r in out}) == 1
    kept = [r.vec_id for r in out if r.keep]
    centroid = base.astype(np.float64).mean(axis=0)
    sims = [_cos(base[i], centroid) for i in range(7)]
    margin = sorted(sims)[1] - sorted(sims)[0]
    assert margin > 1e-6  # fixture has a clear outlier, no tie ambiguity
    assert kept == [int(np.argmin(sims))]


def test_dedup_keeps_one_per_group_and_all_singletons(spark):
    df, base, gid = _grouped_vectors(spark)
    out = semantic_deduplicate(
        df, cosine_threshold=0.95, n_clusters=4, iterations=3
    ).collect()
    assert len(out) == len(base)
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r.group_id, []).append(r)
    n_planted = len([g for g in set(gid) if g >= 0])
    multi = [rows for rows in by_group.values() if len(rows) > 1]
    assert len(multi) == n_planted
    for rows in multi:
        assert sum(r.keep for r in rows) == 1
        # planted group members share a gid
        gids = {gid[r.vec_id] for r in rows}
        assert len(gids) == 1 and gids.pop() >= 0
    singles = [rows[0] for rows in by_group.values() if len(rows) == 1]
    assert all(r.keep for r in singles)
    assert {r.vec_id for r in singles} == {i for i, g in enumerate(gid) if g < 0}


def test_partitioning_invariance(spark):
    df, _, _ = _grouped_vectors(spark)
    a = semantic_deduplicate(
        df.repartition(1), cosine_threshold=0.95, n_clusters=3, iterations=2
    )
    b = semantic_deduplicate(
        df.repartition(7, F.col("vec_id")),
        cosine_threshold=0.95,
        n_clusters=3,
        iterations=2,
    )
    rows_a = sorted(a.collect(), key=lambda r: r.vec_id)
    rows_b = sorted(b.collect(), key=lambda r: r.vec_id)
    # decisions (cell, group, keep) must be bit-identical across
    # parallelism; centroid_sim may differ in the last ulp because avg's
    # partial-sum order follows partitioning
    assert [(r.vec_id, r.cell, r.group_id, r.keep) for r in rows_a] == [
        (r.vec_id, r.cell, r.group_id, r.keep) for r in rows_b
    ]
    for ra, rb in zip(rows_a, rows_b):
        assert ra.centroid_sim == pytest.approx(rb.centroid_sim, abs=1e-9)
