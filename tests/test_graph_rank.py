"""PageRank pins: equality with a dense numpy power iteration
(including dangling redistribution), mass conservation, determinism
across parallelism, and the deterministic top-k view."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from record_linkage_spark.operators.graph_rank import pagerank, top_ranked

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("e", "a"), ("e", "d"),
    # 'f' is dangling (appears only as a destination)
    ("c", "f"), ("b", "f"),
]


def _numpy_pagerank(edges, damping=0.85, num_iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in set(edges):
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        contrib = np.zeros(n)
        for u, v in set(edges):
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dm = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dm / n)
    return {nodes[i]: r[i] for i in range(n)}


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_matches_dense_power_iteration(spark):
    got = {
        r["node"]: r["r"]
        for r in pagerank(_edges_df(spark), num_iters=10).collect()
    }
    want = _numpy_pagerank(EDGES, num_iters=10)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_rank_mass_is_conserved(spark):
    total = (
        pagerank(_edges_df(spark), num_iters=7)
        .agg(F.sum("r").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_parallel_edges_do_not_double_count(spark):
    dup = spark.createDataFrame(
        EDGES + EDGES[:4], "src string, dst string"
    )
    a = {r["node"]: r["r"] for r in pagerank(dup, num_iters=5).collect()}
    b = {
        r["node"]: r["r"]
        for r in pagerank(_edges_df(spark), num_iters=5).collect()
    }
    for n in b:
        assert a[n] == pytest.approx(b[n], abs=1e-12)


def test_invariant_across_partitioning(spark):
    df = _edges_df(spark)
    a = pagerank(df.repartition(1), num_iters=6).collect()
    b = pagerank(df.repartition(13), num_iters=6).collect()
    ra = {r["node"]: round(r["r"], 12) for r in a}
    rb = {r["node"]: round(r["r"], 12) for r in b}
    assert ra == rb


def test_top_ranked_is_deterministic_and_ordered(spark):
    ranks = pagerank(_edges_df(spark), num_iters=10)
    top = top_ranked(ranks, k=3).collect()
    assert len(top) == 3
    vals = [r["r"] for r in top]
    assert vals == sorted(vals, reverse=True)
    # 'c' receives the most in-links in the fixture
    assert top[0]["node"] == "c"


def test_bad_damping_rejected(spark):
    with pytest.raises(ValueError):
        pagerank(_edges_df(spark), damping=1.0)


def _numpy_label_spreading(edges, seeds, alpha=0.8, num_iters=10):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v))
            und.add((v, u))
    nodes = sorted({u for u, _ in und} | {v for _, v in und} | set(seeds))
    idx = {n: i for i, n in enumerate(nodes)}
    labels = sorted(set(seeds.values()))
    lidx = {l: i for i, l in enumerate(labels)}
    n, m = len(nodes), len(labels)
    deg = np.zeros(n)
    for u, _ in und:
        deg[idx[u]] += 1
    s = np.zeros((n, m))
    for node, lab in seeds.items():
        s[idx[node], lidx[lab]] = 1.0
    f = s.copy()
    for _ in range(num_iters):
        c = np.zeros((n, m))
        for u, v in und:
            c[idx[v]] += f[idx[u]] / deg[idx[u]]
        f = alpha * c + (1 - alpha) * s
    return {
        (nodes[i], labels[j]): f[i, j]
        for i in range(n)
        for j in range(m)
        if f[i, j] > 0
    }


LP_EDGES = [
    # two communities bridged by one edge
    ("a", "b"), ("b", "c"), ("a", "c"),
    ("x", "y"), ("y", "z"), ("x", "z"),
    ("c", "x"),
]
LP_SEEDS = {"a": "L1", "z": "L2"}


def test_label_propagation_matches_numpy(spark):
    from record_linkage_spark.operators.graph_rank import label_propagation

    edges = spark.createDataFrame(LP_EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        list(LP_SEEDS.items()), "node string, label string"
    )
    got = {
        (r["node"], r["label"]): r["score"]
        for r in label_propagation(edges, seeds, num_iters=8).collect()
    }
    want = _numpy_label_spreading(LP_EDGES, LP_SEEDS, num_iters=8)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_dominant_labels_split_communities(spark):
    from record_linkage_spark.operators.graph_rank import (
        dominant_labels,
        label_propagation,
    )

    edges = spark.createDataFrame(LP_EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        list(LP_SEEDS.items()), "node string, label string"
    )
    dom = {
        r["node"]: r["label"]
        for r in dominant_labels(
            label_propagation(edges, seeds, num_iters=12)
        ).collect()
    }
    assert dom["a"] == dom["b"] == "L1"
    assert dom["z"] == dom["y"] == "L2"


def test_label_propagation_partitioning_invariant(spark):
    from record_linkage_spark.operators.graph_rank import label_propagation

    edges = spark.createDataFrame(LP_EDGES, "src string, dst string")
    seeds = spark.createDataFrame(
        list(LP_SEEDS.items()), "node string, label string"
    )
    a = {
        (r["node"], r["label"]): round(r["score"], 12)
        for r in label_propagation(
            edges.repartition(1), seeds, num_iters=5
        ).collect()
    }
    b = {
        (r["node"], r["label"]): round(r["score"], 12)
        for r in label_propagation(
            edges.repartition(9), seeds, num_iters=5
        ).collect()
    }
    assert a == b


def test_label_propagation_bad_alpha(spark):
    from record_linkage_spark.operators.graph_rank import label_propagation

    edges = spark.createDataFrame(LP_EDGES, "src string, dst string")
    seeds = spark.createDataFrame([("a", "L1")], "node string, label string")
    with pytest.raises(ValueError):
        label_propagation(edges, seeds, alpha=1.0)
