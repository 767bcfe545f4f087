"""Transitive clustering of match edges -> entity IDs.

The reference's only clustering is a greedy within-VIN-group pass
(M7, ``ground_truth.py:95-177``). At 10^12-turn scale the north_rule
replaces it with an iterative **large-star / small-star** connected-
components algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) expressed purely as DataFrame joins/aggregations:

  large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
  small-star(u): N = smaller neighbors {v ∈ N(u) : v < u};
                 m = min(N ∪ {u}); emit (v, m) for v ∈ N ∪ {u}

Iterate E <- small-star(large-star(E)) until the canonical edge set is
stable; then every node's neighbor IS its component minimum. Each round is
two aggregate+join passes; ``localCheckpoint`` cuts lineage so plans don't
grow with iterations. Components here are small by construction (bounded
by blocking), so rounds converge fast; the loop is still O(log n)-bounded
for adversarial chains.

Entity id = min conv_id of the component (FIXTURES.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.config import CC_MAX_ITERATIONS


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected canonical form: (u, v) with u > v, no loops, distinct."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """Input/output: canonical (u, v) edges."""
    sym = canon.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        canon.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    m = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_minb"))
        .withColumn("m", F.least("_minb", "a"))
        .select("a", "m")
    )
    out = (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))  # re-point only larger neighbors
        .select(F.col("b").alias("src"), F.col("m").alias("dst"))
    )
    return _canon(out)


def _small_star(canon: DataFrame) -> DataFrame:
    """Input/output: canonical (u, v) edges (u > v: v is a smaller nbr)."""
    m = (
        canon.groupBy("u")
        .agg(F.min("v").alias("_minv"))
        .withColumn("m", F.least("_minv", "u"))
        .select("u", "m")
    )
    joined = canon.join(m, "u")
    re_pointed = joined.select(F.col("v").alias("src"), F.col("m").alias("dst"))
    self_links = m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return _canon(re_pointed.union(self_links))


def connected_components(
    match_edges: DataFrame,
    max_iterations: int = CC_MAX_ITERATIONS,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, dst) match edges -> (conv_id, entity_id), entity_id = min of
    each connected component."""
    edges = _canon(
        match_edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).localCheckpoint()

    for _ in range(max_iterations):
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        changed = (
            new_edges.exceptAll(edges).limit(1).count()
            + edges.exceptAll(new_edges).limit(1).count()
        )
        edges = new_edges
        if changed == 0:
            break

    # at fixpoint every edge is (node, component_min); nodes that ARE the
    # min map to themselves
    members = edges.select(F.col("u").alias("conv_id"), F.col("v").alias("entity_id"))
    roots = edges.select(F.col("v").alias("conv_id"), F.col("v").alias("entity_id"))
    return members.union(roots).groupBy("conv_id").agg(
        F.min("entity_id").alias("entity_id")
    )


def assign_entities(
    all_ids: DataFrame, match_edges: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Every record gets an entity id; singletons map to themselves."""
    cc = connected_components(match_edges)
    return (
        all_ids.select(F.col(id_col).alias("conv_id"))
        .distinct()
        .join(cc, "conv_id", "left")
        .withColumn("entity_id", F.coalesce("entity_id", "conv_id"))
    )
