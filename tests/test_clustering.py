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


def test_greedy_within_block_clusters(spark):
    """M7 semantics (ground_truth.py:95-177): first-wins greedy clustering
    within blocks, NaN==NaN field comparison, max_diff threshold."""
    from record_linkage_spark.operators.clustering import (
        greedy_within_block_clusters,
    )

    rows = [
        # block k1: a,b identical attrs -> one cluster rep a; c differs in
        # both fields -> its own cluster
        ("a", "k1", "x", "p"),
        ("b", "k1", "x", "p"),
        ("c", "k1", "y", "q"),
        # block k2: null==null counts equal, d/e cluster together
        ("d", "k2", None, "p"),
        ("e", "k2", None, "p"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, key string, f1 string, f2 string")
    out = greedy_within_block_clusters(
        df, "key", ["f1", "f2"], max_diff=0, id_col="conv_id"
    )
    got = {r.conv_id: r.cluster_rep for r in out.collect()}
    assert got["a"] == got["b"] == "a"
    assert got["c"] == "c"
    assert got["d"] == got["e"] == "d"

    # max_diff=1 lets one differing field through: c (differs in 2) still
    # alone, but a row differing in 1 joins
    rows2 = rows + [("f", "k1", "x", "z")]
    df2 = spark.createDataFrame(rows2, "conv_id string, key string, f1 string, f2 string")
    out2 = greedy_within_block_clusters(
        df2, "key", ["f1", "f2"], max_diff=1, id_col="conv_id"
    )
    got2 = {r.conv_id: r.cluster_rep for r in out2.collect()}
    assert got2["f"] == "a"


def test_greedy_agrees_with_cc_on_transitive_free_blocks(spark):
    """Where blocks contain exact-equal attribute groups (no transitive
    chains), greedy clusters == connected components of the exact-match
    edge set (SURVEY §7 item 6)."""
    from record_linkage_spark.operators.clustering import (
        connected_components,
        greedy_within_block_clusters,
    )
    from pyspark.sql import functions as F

    rows = [
        ("a", "k", "x"), ("b", "k", "x"), ("c", "k", "y"),
        ("d", "k", "y"), ("e", "k", "z"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, key string, f1 string")
    greedy = greedy_within_block_clusters(df, "key", ["f1"], max_diff=0)
    g = {r.conv_id: r.cluster_rep for r in greedy.collect()}

    a = df.select(F.col("conv_id").alias("src"), "key", "f1")
    b = df.select(F.col("conv_id").alias("dst"), "key", "f1")
    edges = a.join(b, ["key", "f1"]).filter(F.col("src") < F.col("dst"))
    cc = connected_components(edges.select("src", "dst"))
    c = {r.conv_id: r.entity_id for r in cc.collect()}
    c["e"] = "e"  # singleton not in any edge
    assert g == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "e"}
    assert {k: v for k, v in c.items()} == g


def test_incremental_components_matches_batch(spark):
    """Folding increments of edges into an existing assignment via the
    contracted entity graph must equal batch CC over all edges seen so
    far, leave untouched entities' ids unchanged, and absorb endpoints
    the assignment has never seen."""
    import random

    from pyspark.sql import functions as F

    from record_linkage_spark.operators.clustering import (
        incremental_components,
    )

    rng = random.Random(7)
    ids = [f"r{i:03d}" for i in range(120)]
    all_edges = []
    for _ in range(140):
        a, b = rng.sample(ids, 2)
        all_edges.append((a, b))
    batches = [all_edges[:60], all_edges[60:100], all_edges[100:]]

    ids_df = spark.createDataFrame([(i,) for i in ids], "conv_id string")
    # seed assignment: batch CC over the first edge batch
    seen = list(batches[0])
    assign = assign_entities(
        ids_df, spark.createDataFrame(seen, "src string, dst string")
    ).localCheckpoint()

    for batch in batches[1:]:
        before = {r.conv_id: r.entity_id for r in assign.collect()}
        new_df = spark.createDataFrame(batch, "src string, dst string")
        assign = incremental_components(assign, new_df).localCheckpoint()
        seen += batch
        expected = {
            r.conv_id: r.entity_id
            for r in assign_entities(
                ids_df, spark.createDataFrame(seen, "src string, dst string")
            ).collect()
        }
        got = {r.conv_id: r.entity_id for r in assign.collect()}
        assert got == expected
        # stability: records whose entity wasn't touched by this batch
        # keep their id
        touched_entities = {
            before[x] for e in batch for x in e if x in before
        }
        for rid, ent in before.items():
            if ent not in touched_entities:
                assert got[rid] == ent


def test_incremental_components_new_endpoints(spark):
    """Edges whose endpoints the assignment never saw create/join
    entities correctly (the streaming-linkage arrival case)."""
    from record_linkage_spark.operators.clustering import (
        incremental_components,
    )

    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("z", "z")], "conv_id string, entity_id string"
    )
    new = spark.createDataFrame(
        [("q", "b"), ("q", "r")], "src string, dst string"
    )
    got = {
        r.conv_id: r.entity_id
        for r in incremental_components(assign, new).collect()
    }
    assert got == {"a": "a", "b": "a", "q": "a", "r": "a", "z": "z"}
