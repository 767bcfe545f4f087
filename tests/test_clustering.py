"""Connected-components correctness on hand-built graphs: CC(edges) must
equal the transitive closure (SURVEY.md §7 build-order item 6)."""

from __future__ import annotations

from record_linkage_spark.operators.clustering import (
    assign_entities,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.conv_id: r.entity_id for r in connected_components(df).collect()
    }


def test_chain(spark):
    got = _cc(spark, [("b", "a"), ("b", "c"), ("c", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_two_components_and_duplicate_edges(spark):
    got = _cc(spark, [("a", "b"), ("b", "a"), ("x", "y"), ("y", "z"), ("x", "z")])
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x"}


def test_long_path_converges(spark):
    ids = [f"n{i:02d}" for i in range(12)]
    edges = list(zip(ids, ids[1:]))
    got = _cc(spark, edges)
    assert set(got.values()) == {"n00"} and len(got) == 12


def test_star_graph(spark):
    edges = [("hub", f"s{i}") for i in range(6)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"hub"} and len(got) == 7


def test_assign_entities_singletons(spark):
    ids = spark.createDataFrame([("a",), ("b",), ("c",), ("lonely",)], "conv_id string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.conv_id: r.entity_id for r in assign_entities(ids, edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "lonely": "lonely"}


def test_agreement_with_greedy_transitive_closure(spark):
    """Randomized graph: CC output equals a driver-side union-find closure
    (the reference's greedy M7 generalized)."""
    import random

    rng = random.Random(42)
    nodes = [f"v{i:03d}" for i in range(60)]
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(45)]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent[find(s)] = find(d)
    expected = {}
    for n in nodes:
        root = find(n)
        expected.setdefault(root, []).append(n)
    exp_clusters = {min(v): sorted(v) for v in expected.values() if len(v) > 1}

    got = _cc(spark, edges)
    got_clusters = {}
    for member, ent in got.items():
        got_clusters.setdefault(ent, []).append(member)
    got_clusters = {k: sorted(v) for k, v in got_clusters.items()}
    assert got_clusters == exp_clusters
