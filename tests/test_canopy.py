"""Canopy blocking: distributed derivation (tight-graph pivot clustering
+ loose rank join) must EQUAL the sequential McCallum-Nigam-Ungar scan
under the same hash permutation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from record_linkage_spark.operators.blocking import (
    canopies,
    canopy_candidate_pairs,
)


def _pi(spark, nodes, seed):
    df = spark.createDataFrame([(n,) for n in nodes], "n string").select(
        "n", F.xxhash64(F.lit(seed), F.col("n")).alias("h")
    )
    return {r.n: (r.h, r.n) for r in df.collect()}


def _sequential_canopies(pairs, tight, loose, pi):
    """(a, b, score) cheap pairs -> {(record, canopy_seed)} membership."""
    sim: dict[tuple, float] = {}
    nodes = set()
    for a, b, s in pairs:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        sim[key] = max(sim.get(key, float("-inf")), s)
        nodes |= {a, b}
    # drop pairs below loose entirely (they don't put nodes in the graph
    # for the distributed version either — mirror that membership universe)
    loose_nbrs: dict[str, set] = {n: set() for n in nodes}
    for (a, b), s in sim.items():
        if s >= loose:
            loose_nbrs[a].add(b)
            loose_nbrs[b].add(a)
    universe = {n for n in nodes if loose_nbrs[n]}
    listed = set(universe)
    out = set()
    for v in sorted(universe, key=lambda n: pi[n]):
        if v not in listed:
            continue
        members = {v} | {u for u in loose_nbrs[v] if u in listed}
        for u in members:
            out.add((u, v))
        removed = {
            u
            for u in members
            if u == v or sim[(min(u, v), max(u, v))] >= tight
        }
        listed -= removed
    return out


def _random_scored_pairs(n_nodes=50, n_pairs=140, seed=13):
    rng = random.Random(seed)
    nodes = [f"c{i:03d}" for i in range(n_nodes)]
    seen = set()
    rows = []
    while len(rows) < n_pairs:
        a, b = rng.sample(nodes, 2)
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        rows.append((key[0], key[1], round(rng.random(), 3)))
    return rows


def test_canopies_equal_sequential_scan(spark):
    rows = _random_scored_pairs()
    df = spark.createDataFrame(rows, "id_A string, id_B string, score double")
    tight, loose = 0.8, 0.4
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    pi = _pi(spark, nodes, seed=42)
    want = _sequential_canopies(rows, tight, loose, pi)
    got = {
        (r.conv_id, r.canopy_id)
        for r in canopies(df, tight=tight, loose=loose, seed=42).collect()
    }
    assert got == want


def test_canopies_overlap_and_cover(spark):
    rows = _random_scored_pairs(n_nodes=40, n_pairs=120, seed=5)
    df = spark.createDataFrame(rows, "id_A string, id_B string, score double")
    m = canopies(df, tight=0.9, loose=0.3, seed=7)
    per_node = m.groupBy("conv_id").count().collect()
    # a low loose threshold with a high tight threshold must leave some
    # record in more than one canopy — the overlap canopy blocking exists for
    assert max(r["count"] for r in per_node) >= 2
    # every record with a loose-or-better pair is covered
    covered = {r.conv_id for r in m.collect()}
    in_graph = {
        x
        for a, b, s in rows
        if s >= 0.3
        for x in (a, b)
    }
    assert covered == in_graph


def test_canopies_tight_members_share_seed_canopy(spark):
    # every record is in the canopy of its tight claimer — tight pairs
    # always end up comparable downstream
    rows = [
        ("a", "b", 0.95),
        ("b", "c", 0.95),
        ("c", "d", 0.5),
        ("d", "e", 0.95),
    ]
    df = spark.createDataFrame(rows, "id_A string, id_B string, score double")
    m = canopies(df, tight=0.9, loose=0.4, seed=42)
    by_node: dict[str, set] = {}
    for r in m.collect():
        by_node.setdefault(r.conv_id, set()).add(r.canopy_id)
    for a, b, s in rows:
        if s >= 0.9:
            assert by_node[a] & by_node[b], (a, b)
    pairs = {
        (r.id_A, r.id_B) for r in canopy_candidate_pairs(m).collect()
    }
    for a, b, s in rows:
        if s >= 0.9:
            assert (min(a, b), max(a, b)) in pairs


def test_canopies_validates_thresholds(spark):
    import pytest

    df = spark.createDataFrame([], "id_A string, id_B string, score double")
    with pytest.raises(ValueError):
        canopies(df, tight=0.3, loose=0.8)
