"""Link-graph ranking for corpus curation: distributed PageRank.

Web-scale training-data pipelines weight documents by host/page graph
centrality (e.g. Common Crawl ranks hosts to pick crawl frontiers and
quality tiers). This module implements the classic damped PageRank
(Page, Brin, Motwani & Winograd 1999) as pure DataFrame power
iteration — no GraphX, no RDDs, no driver-side numerics.

Scale shape per iteration (the whole loop is ``num_iters`` of this):
- ONE equality hash join of the edge list against the current rank
  vector on ``src`` (both sides keyed alike, co-partitioned after the
  first round) and ONE map-side-combinable ``groupBy(dst)`` sum. The
  edge list is the O(graph) payload and it shuffles on stable keys.
- Dangling-node mass (ranks with no out-links) is ONE single-row
  aggregate attached by crossJoin — the established single-row-attach
  pattern; nothing collects to the driver inside the loop.
- ``localCheckpoint`` every ``checkpoint_every`` rounds bounds lineage
  exactly like the connected-components loop.

Rank mass is conserved (sums to 1 every iteration, dangling mass
redistributed uniformly), so convergence needs no normalization pass.
Everything is deterministic arithmetic — no sampling, no
``monotonically_increasing_id`` — so outputs are identical at any
parallelism (floating-point sum order is the only nondeterminism;
consumers rank by values rounded to 6 decimals, as the oracle does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    num_iters: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Damped PageRank over a directed edge list. Returns
    ``(node, r)`` with ``sum(r) == 1``. Parallel edges collapse to one
    (``distinct``) so out-degree counts structural links, not
    multiplicity."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_df = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for i in range(num_iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        dangling = ranks.join(
            deg, ranks["node"] == deg["src"], "left_anti"
        ).agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
        ranks = (
            nodes.crossJoin(n_df)
            .crossJoin(dangling)
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dm") / F.col("n_nodes")
                    )
                ).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and num_iters - i - 1 >= 2:
            # LAZY, and skipped when fewer than 2 iterations remain:
            # a checkpoint exists to bound lineage for the iterations
            # BEHIND it — near the end it only splits the fused
            # terminal job (the materialization barrier cost ~4 s of
            # the 11.8 s stage at sf0.1 / 5 iterations; values are
            # checkpoint-invariant). The rank chain is linear, so the
            # terminal action computes each iteration exactly once
            # (the CC/Lloyd job-fusion pattern).
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def top_ranked(
    ranks: DataFrame, k: int = 50, round_to: int = 6
) -> DataFrame:
    """Deterministic top-k view ``(node, r)``: rank by the ROUNDED
    score (so float sum-order noise below the rounding grain cannot
    reorder ties across engines/parallelism), then node. The rank
    window is single-partition but its input is one row per node with
    two columns — a rank-vector-sized sort, not a corpus sort; at true
    100 TB graph scale swap in orderBy().limit(k), which Spark executes
    as per-partition top-k + a k-row final heap."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("r_round"), "node")
    return (
        ranks.select("node", F.round("r", round_to).alias("r_round"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("node", F.col("r_round").alias("r"))
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    num_iters: int = 10,
    alpha: float = 0.8,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Label spreading (Zhu & Ghahramani 2002 / Zhou et al. 2004) over
    an undirected graph: a few labeled seed nodes propagate soft label
    scores to their neighborhoods —  in ER terms, a handful of
    clerically-confirmed matches push their entity labels through the
    candidate-pair graph. Returns sparse ``(node, label, score)`` rows
    (absent = 0), ``f_{t+1} = alpha * D^-1 A f_t + (1-alpha) * seed``.

    Scale shape mirrors :func:`pagerank`: per iteration ONE edge-state
    equality join + ONE map-side-combinable ``groupBy(dst, label)``,
    then a full-outer merge with the (small) seed table. State is one
    row per (node, reachable label) — sparse, never nodes x labels.
    ``localCheckpoint`` every ``checkpoint_every`` rounds bounds
    lineage. Deterministic arithmetic throughout; consumers rank on
    rounded scores like :func:`top_ranked`."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    half = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    e = (
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seed = (
        seeds.select(
            F.col(node_col).cast("string").alias("node"),
            F.col(label_col).cast("string").alias("label"),
        )
        .distinct()
        .withColumn("s", F.lit(1.0))
        .localCheckpoint()
    )
    f = seed.select("node", "label", F.col("s").alias("score"))
    for i in range(num_iters):
        contrib = (
            e.join(f, e["src"] == f["node"])
            .join(deg, "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.sum(F.col("score") / F.col("deg")).alias("c"))
        )
        f = (
            contrib.join(seed, ["node", "label"], "full_outer")
            .select(
                "node",
                "label",
                (
                    alpha * F.coalesce("c", F.lit(0.0))
                    + (1.0 - alpha) * F.coalesce("s", F.lit(0.0))
                ).alias("score"),
            )
            .filter(F.col("score") > 0.0)
        )
        if (i + 1) % checkpoint_every == 0 and num_iters - i - 1 >= 2:
            # lazy + end-skipped for the same reason as the pagerank loop
            f = f.localCheckpoint(eager=False)
    return f


def dominant_labels(state: DataFrame, round_to: int = 6) -> DataFrame:
    """Argmax view of :func:`label_propagation` output: one
    ``(node, label, score)`` row per node, ties broken by label ASC on
    the ROUNDED score (engine-portable, like :func:`top_ranked`). The
    rank window partitions by node — no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(
        F.desc("score_r"), F.col("label")
    )
    return (
        state.select(
            "node", "label", F.round("score", round_to).alias("score_r")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("node", "label", F.col("score_r").alias("score"))
    )
