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


def _canon(edges: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Undirected canonical form: (u, v) with u > v, no loops, distinct.

    n_parts: explicit shuffle width for the dedup — a repartition on
    (u, v) satisfies distinct's clustering requirement, so the dedup runs
    at that width without touching session-level shuffle-partition conf
    (which would leak to concurrent queries on the same SparkSession).
    """
    e = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    if n_parts:
        e = e.repartition(n_parts, "u", "v")
    return e.distinct()


def _large_star(canon: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Input/output: canonical (u, v) edges."""
    sym = canon.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        canon.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    if n_parts:
        # clustering on "a" feeds BOTH the groupBy and the join below with
        # no further exchange (the shared shuffle is reused by Catalyst)
        sym = sym.repartition(n_parts, "a")
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
    return _canon(out, n_parts)


def _small_star(canon: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Input/output: canonical (u, v) edges (u > v: v is a smaller nbr)."""
    if n_parts:
        canon = canon.repartition(n_parts, "u")
    m = (
        canon.groupBy("u")
        .agg(F.min("v").alias("_minv"))
        .withColumn("m", F.least("_minv", "u"))
        .select("u", "m")
    )
    joined = canon.join(m, "u")
    re_pointed = joined.select(F.col("v").alias("src"), F.col("m").alias("dst"))
    self_links = m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return _canon(re_pointed.union(self_links), n_parts)


def connected_components(
    match_edges: DataFrame,
    max_iterations: int = CC_MAX_ITERATIONS,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, dst) match edges -> (conv_id, entity_id), entity_id = min of
    each connected component."""
    # LAZY localCheckpoint throughout the loop: the convergence-signature
    # aggregate right below is the action that materializes each round's
    # checkpoint, so a round costs ONE job, not a materialization job
    # plus a signature job. At the bench's edge scale (27k edges,
    # single-task stages) the per-job scheduling latency is the whole
    # stage cost — fusing jobs cut the stage 4.1 s -> 3.1 s at sf0.1
    # with bit-identical assignments (the round-3 "+43% CC drift" was
    # exactly this fixed per-round job overhead compounding, not data
    # work).
    edges = _canon(
        match_edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).localCheckpoint(eager=False)

    def _sig(e: DataFrame):
        # canonical edge sets are equal iff (count, order-insensitive hash
        # sum) match — one aggregate job per iteration instead of two
        # exceptAll shuffles
        # decimal sum: long-sum of 64-bit hashes overflows under ANSI mode
        r = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(20,0)")).alias("h"),
        ).first()
        return (r.n, r.h)

    # one job: materializes the canon checkpoint, sizes the loop AND
    # seeds the convergence signature
    prev_sig = _sig(edges)
    n_edges = prev_sig[0]

    # size the iteration's shuffles to the edge set: blocking bounds
    # components to a few members, so the edge table is often tiny
    # relative to spark.sql.shuffle.partitions and each of the ~4
    # shuffles per round would pay full-width task-scheduling overhead.
    # ~100k edges per partition, applied as explicit repartitions on the
    # groupBy/dedup keys INSIDE the star passes (a per-query override —
    # never session-conf mutation, which would leak to queries planned
    # concurrently on the same SparkSession). Large graphs keep the
    # session's parallelism (loop_parts=None → no forced repartition).
    spark = edges.sparkSession
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "64"))
    loop_parts = max(min(default_parts, n_edges // 100_000 + 1), 1)
    if loop_parts >= default_parts:
        loop_parts = None

    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges, loop_parts), loop_parts).localCheckpoint(
            eager=False
        )
        new_sig = _sig(edges)
        if new_sig == prev_sig:
            break
        prev_sig = new_sig

    # at fixpoint every edge is (node, component_min); nodes that ARE the
    # min map to themselves
    members = edges.select(F.col("u").alias("conv_id"), F.col("v").alias("entity_id"))
    roots = edges.select(F.col("v").alias("conv_id"), F.col("v").alias("entity_id"))
    return members.union(roots).groupBy("conv_id").agg(
        F.min("entity_id").alias("entity_id")
    )


def greedy_within_block_clusters(
    records: DataFrame,
    block_col: str,
    attr_cols: list[str],
    max_diff: int = 3,
    order_col: str | None = None,
    id_col: str = "conv_id",
) -> DataFrame:
    """M7 — the reference's greedy within-key clustering
    (``ground_truth.py:95-177``): inside each exact-key block, scan rows in
    recency order; a row joins the FIRST existing cluster whose
    representative differs in at most ``max_diff`` of ``attr_cols``
    (NaN==NaN — None equals None), else it founds a new cluster whose
    representative it becomes. Returns (id, cluster_rep).

    Runs as ``applyInPandas`` per block — blocks are same-exact-key groups,
    bounded by construction (an entity has few records), so the grouped
    pass is skew-safe; the large-star/small-star CC
    (:func:`connected_components`) is the scale path for transitive
    clustering over arbitrary match graphs.
    """
    import pandas as pd  # noqa: F401 — required by applyInPandas workers

    cols = [id_col, block_col, *attr_cols] + ([order_col] if order_col else [])
    src = records.select(*dict.fromkeys(cols))

    def cluster(pdf):
        if order_col:
            pdf = pdf.sort_values(order_col, ascending=False, kind="mergesort")
        else:
            pdf = pdf.sort_values(id_col, kind="mergesort")
        reps: list[tuple] = []  # (rep_id, rep_attrs)
        out_ids, out_reps = [], []
        for row in pdf.itertuples(index=False):
            attrs = tuple(getattr(row, c) for c in attr_cols)
            rid = getattr(row, id_col)
            assigned = None
            for rep_id, rep_attrs in reps:
                diff = 0
                for x, y in zip(attrs, rep_attrs):
                    # NaN==NaN / None==None counts as equal (reference
                    # ground_truth.py:118-119)
                    both_missing = (x is None or x != x) and (y is None or y != y)
                    if not both_missing and x != y:
                        diff += 1
                        if diff > max_diff:
                            break
                if diff <= max_diff:
                    assigned = rep_id
                    break
            if assigned is None:
                reps.append((rid, attrs))
                assigned = rid
            out_ids.append(rid)
            out_reps.append(assigned)
        import pandas as pd

        return pd.DataFrame({id_col: out_ids, "cluster_rep": out_reps})

    return src.groupBy(block_col).applyInPandas(
        cluster, schema=f"{id_col} string, cluster_rep string"
    )


def correlation_clustering(
    match_edges: DataFrame,
    seed: int = 42,
    max_iterations: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Pivot-based correlation clustering (QwickCluster) of match edges —
    the noise-robust alternative to :func:`connected_components`.

    CC computes the TRANSITIVE closure: one false positive edge between
    two real entities fuses them, and a chain a-b, b-c, c-d collapses into
    a single entity even when a and d share nothing. The pivot algorithm
    (Ailon/Charikar/Newman JACM'08) bounds that damage: clusters are a
    pivot plus a subset of its DIRECT neighbors (radius 1), so a noisy
    chain breaks into multiple clusters instead of snowballing. This is
    the standard 3-approximation for correlation clustering on +/- graphs
    where the match edges are the "+" set.

    Distributed shape is the parallel-pivot simulation (Chierichetti,
    Dalvi, Kumar KDD'14): under a fixed random permutation pi, every
    round all nodes that are local minima of pi among their still-active
    neighbors become pivots at once; each remaining node adjacent to a
    pivot joins its smallest-pi pivot; assigned nodes leave the graph.
    The output is IDENTICAL to the sequential greedy scan of nodes in pi
    order (asserted in tests), but needs only O(log n) rounds w.h.p. —
    each round is one groupBy + one join on node id, no global sort.

    pi is hash-derived (``xxhash64(seed, node)``, ties broken by node
    id), never ``rand()``, so the clustering is bit-identical across
    parallelism levels and reruns. Per-round frames are
    ``localCheckpoint``-ed to cut plan lineage, mirroring
    :func:`connected_components`.

    Returns (conv_id, entity_id) for every node that appears in an edge;
    entity_id is the cluster pivot's id. Use :func:`assign_entities`-style
    left-join + coalesce for corpus singletons.
    """
    edges = _canon(
        match_edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    ).select(F.col("u").alias("a"), F.col("v").alias("b")).localCheckpoint()

    def rank(col: str):
        # sortable permutation position: (hash, id) struct — struct
        # comparison is field-wise, so distinct ids never tie
        return F.struct(
            F.xxhash64(F.lit(seed), F.col(col)).alias("h"),
            F.col(col).alias("i"),
        )

    return _dominant_rounds(
        edges.select("a", "b", rank("a").alias("ra"), rank("b").alias("rb")),
        max_iterations,
        "correlation_clustering",
    )


def _dominant_rounds(
    edges_ranked: DataFrame, max_iterations: int, label: str
) -> DataFrame:
    """Shared locally-dominant greedy simulation over rank-annotated
    undirected edges (a, b, ra, rb): every round, nodes whose rank
    precedes all active neighbors' ranks become cluster centers at once;
    remaining nodes adjacent to a center join their best-ranked center;
    assigned nodes leave the graph. Output is IDENTICAL to the
    sequential greedy scan of nodes in rank order (asserted in tests
    for both rank families) — rounds are O(log n) w.h.p. when the rank
    carries a hash component. Rank structs compare field-wise and must
    end with the node id (field ``i``) so distinct nodes never tie."""
    # Phase 1 — centers: the parallel lexicographic-MIS simulation
    # (Blelloch/Fineman/Shun 2012). Each round, nodes preceding ALL
    # still-active neighbors enter the MIS; MIS nodes AND their
    # neighbors leave the graph. The resulting center set equals the
    # sequential greedy scan's centers exactly. Members are NOT
    # assigned per round: a member's best adjacent center can surface
    # in a LATER round than its removal (its earlier rounds' centers
    # merely blocked it), so per-round assignment diverges from the
    # sequential scan — membership is resolved globally in phase 2.
    edges_ranked = edges_ranked.localCheckpoint()
    sym_all = edges_ranked.union(
        edges_ranked.select(
            F.col("b").alias("a"),
            F.col("a").alias("b"),
            F.col("rb").alias("ra"),
            F.col("ra").alias("rb"),
        )
    )
    all_nodes = sym_all.select(F.col("a").alias("conv_id")).distinct()
    pivot_parts: list[DataFrame] = []
    active = edges_ranked
    converged = False
    for _ in range(max_iterations):
        if active.isEmpty():
            converged = True
            break
        sym = active.union(
            active.select(
                F.col("b").alias("a"),
                F.col("a").alias("b"),
                F.col("rb").alias("ra"),
                F.col("ra").alias("rb"),
            )
        )
        # best rank among each node's active neighbors
        nbr_min = sym.groupBy("a", "ra").agg(F.min("rb").alias("_mn"))
        pivots = (
            nbr_min.filter(F.col("ra") < F.col("_mn"))
            .select(F.col("a").alias("pivot"))
            .localCheckpoint()
        )
        pivot_parts.append(pivots)
        removed = (
            sym.join(pivots, sym["b"] == pivots["pivot"])
            .select(F.col("a").alias("_done"))
            .union(pivots.select(F.col("pivot").alias("_done")))
            .distinct()
        )
        active = (
            active.join(removed, active["a"] == removed["_done"], "left_anti")
            .join(removed, active["b"] == removed["_done"], "left_anti")
            .localCheckpoint()
        )
    if not converged and not active.isEmpty():
        raise RuntimeError(f"{label} did not converge in {max_iterations} rounds")

    if not pivot_parts:
        # no edges at all: empty assignment with the input's id type
        return edges_ranked.select(
            F.col("a").alias("conv_id"), F.col("a").alias("entity_id")
        ).limit(0)
    centers = pivot_parts[0]
    for part in pivot_parts[1:]:
        centers = centers.union(part)

    # Phase 2 — membership over the ORIGINAL graph: every non-center
    # joins its best-ranked adjacent center (sequentially, the first
    # adjacent center processed claims it — i.e. the global min-rank
    # one, since a node stays active until an adjacent center appears).
    # Centers are pairwise non-adjacent (MIS), so no center shows up on
    # the member side; MIS maximality gives every non-center an
    # adjacent center, so nothing is left unassigned.
    members = (
        sym_all.join(centers, sym_all["b"] == centers["pivot"])
        .groupBy("a")
        .agg(F.min("rb").alias("_mp"))
        .select(F.col("a").alias("conv_id"), F.col("_mp.i").alias("entity_id"))
    )
    out = members.unionByName(
        centers.select(
            F.col("pivot").alias("conv_id"), F.col("pivot").alias("entity_id")
        )
    )
    # safety net (should be empty by maximality)
    leftovers = all_nodes.join(out, "conv_id", "left_anti").select(
        "conv_id", F.col("conv_id").alias("entity_id")
    )
    return out.unionByName(leftovers)


def star_clustering(
    match_edges: DataFrame,
    seed: int = 42,
    max_iterations: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Star clustering of match edges (Aslam/Pelekhov/Rus 2004; the ER
    benchmark form in Hassanzadeh & Miller's dedup-clustering study):
    the highest-DEGREE unassigned node becomes a star center and its
    unassigned neighbors become satellites, repeatedly. Well-connected
    records — the ones with the most independent match evidence — anchor
    the clusters, so a single high-scoring noise edge cannot make a
    peripheral record the representative; like the pivot clusterer,
    clusters have radius 1 and noisy chains cannot snowball.

    Distributed shape: the same locally-dominant simulation as
    :func:`correlation_clustering` (one degree aggregation up front,
    then per-round one groupBy + one join), with the STATIC total order
    (degree desc, hash, id) instead of a random permutation. Degrees
    are computed once on the input graph, matching the sequential
    definition; the hash tiebreak keeps equal-degree runs (paths,
    grids) from serializing into O(n) rounds — id-only ties would make
    a 100-node path take ~50 rounds; hash ties keep it O(log n) w.h.p.
    Output equals the sequential greedy scan in that order (asserted
    in tests).

    ``weight_col`` switches the anchor order from plain degree to
    SUMMED EDGE WEIGHT (e.g. match scores): centers are then the
    records with the most *total* match evidence, so ten 0.6-score
    edges outrank three 0.99 ones only if that is what the scores say.

    Returns (conv_id, entity_id = center id) for every node in an edge.
    """
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("_w"))
    canon = _canon(match_edges.select(*cols))
    if weight_col is not None:
        # _canon dedupes on the canonical pair; re-attach max weight per
        # undirected pair from the input (deterministic under dup edges)
        wsrc = match_edges.select(*cols)
        wmax = (
            wsrc.select(
                F.greatest("src", "dst").alias("u"),
                F.least("src", "dst").alias("v"),
                "_w",
            )
            .groupBy("u", "v")
            .agg(F.max("_w").alias("_w"))
        )
        canon = canon.select("u", "v").join(wmax, ["u", "v"])
    edges = canon.select(
        F.col("u").alias("a"),
        F.col("v").alias("b"),
        *([F.col("_w")] if weight_col is not None else []),
    ).localCheckpoint()
    if weight_col is not None:
        sym = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"), "_w")
        )
        deg_expr = F.sum("_w")
    else:
        sym = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        deg_expr = F.count("*").cast("double")
    ranks = (
        sym.groupBy("a")
        .agg(deg_expr.alias("_deg"))
        .select(
            F.col("a").alias("_n"),
            F.struct(
                (-F.col("_deg")).alias("d"),
                F.xxhash64(F.lit(seed), F.col("a")).alias("h"),
                F.col("a").alias("i"),
            ).alias("_r"),
        )
    )
    er = (
        edges.select("a", "b")
        .join(ranks.select(F.col("_n").alias("a"), F.col("_r").alias("ra")), "a")
        .join(ranks.select(F.col("_n").alias("b"), F.col("_r").alias("rb")), "b")
        .select("a", "b", "ra", "rb")
    )
    return _dominant_rounds(er, max_iterations, "star_clustering")


def _avg_linkage_labels(members, dist, cut):
    """Sequential UPGMA (average-linkage) agglomeration over a dense
    distance matrix, cut at cophenetic distance ``cut`` — the in-memory
    kernel :func:`hierarchical_clusters` runs per connected component.

    ``members`` is SORTED; cluster ``i`` always occupies the slot of its
    smallest member index, so numpy's row-major argmin realizes the
    canonical "(smallest label_i, smallest label_j)" tie-break and the
    result is independent of input row order. Lance-Williams update for
    the average method: d(i∪j, k) = (n_i·d(i,k) + n_j·d(j,k))/(n_i+n_j),
    which keeps d(A, B) == mean over all cross-pairs of the ORIGINAL
    matrix (asserted against a from-scratch recompute in tests).

    Returns a list mapping member index -> entity label (the smallest
    member id of its final sub-cluster).
    """
    import numpy as np

    n = len(members)
    d = dist.astype("float64").copy()
    np.fill_diagonal(d, np.inf)
    sizes = np.ones(n)
    active = np.ones(n, dtype=bool)
    # union-find-ish: slot i's current member set, tracked as labels
    owner = list(range(n))  # member index -> active slot
    for _ in range(n - 1):
        idx = np.flatnonzero(active)
        if len(idx) < 2:
            break
        sub = d[np.ix_(idx, idx)]
        k = int(np.argmin(sub))
        i_, j_ = divmod(k, len(idx))
        if i_ > j_:  # keep the smaller slot as survivor
            i_, j_ = j_, i_
        best = sub[i_, j_]
        if not (best <= cut):
            break
        i, j = int(idx[i_]), int(idx[j_])
        ni, nj = sizes[i], sizes[j]
        merged = (ni * d[i, :] + nj * d[j, :]) / (ni + nj)
        d[i, :] = merged
        d[:, i] = merged
        d[i, i] = np.inf
        sizes[i] = ni + nj
        active[j] = False
        for m in range(n):
            if owner[m] == j:
                owner[m] = i
    return [members[owner[m]] for m in range(n)]


def hierarchical_clusters(
    scored_pairs: DataFrame,
    threshold: float,
    src_col: str = "conv_id_a",
    dst_col: str = "conv_id_b",
    score_col: str = "score",
    max_component: int = 1000,
) -> DataFrame:
    """Score-aware agglomerative clustering of scored pairs — the Dedupe
    library's ``partition`` semantics (connected components over scored
    pairs, then hierarchical clustering per component cut at distance
    1 − threshold), re-expressed for Spark.

    Connected components treats every above-threshold edge as gospel:
    a chain a−b (0.95), b−c (0.95), c−d (0.55-but-kept) fuses a..d. HAC
    with AVERAGE linkage instead merges groups only while their *mean*
    pairwise distance stays within the cut, so weakly-bridged groups
    split — the score-aware middle ground between CC (uses no scores)
    and :func:`correlation_clustering` (uses no scores either, only
    edge presence).

    Distributed shape: components come from the audited large-star/
    small-star loop (:func:`connected_components`); each component's
    pairs then cluster independently inside one ``applyInPandas`` group
    — blocking bounds component sizes, so the grouped pass is skew-safe,
    and the numpy kernel is O(m²) memory / O(m³) flops only within a
    component. Components larger than ``max_component`` fall back to the
    transitive (CC) answer — one entity, min-id label — instead of
    attempting a dense matrix; at 100 TB such a component signals a
    blocking bug, not a clustering problem (same crossover documented at
    :func:`incremental_components`).

    Pairs the component's edge list never scored get distance 1.0 (never
    directly mergeable; reachable only through average linkage), matching
    dedupe's condensed-matrix default. Duplicate/reversed pairs collapse
    to their max score. Returns (conv_id, entity_id) for every node that
    appears in a pair; entity_id = smallest member id of the sub-cluster
    (FIXTURES.md §5 discipline, stable across partitioning — asserted).

    Reference anchor: dedupe's cluster step (vendor
    ``dedupe/clustering.py:cluster``, centroid linkage + fcluster cut);
    average linkage chosen for its exact Lance-Williams recursion —
    centroid linkage inverts (non-monotone dendrograms) and its cut is
    ill-defined, which dedupe itself papers over.
    """
    import pandas as pd  # noqa: F401 — applyInPandas workers

    cut = 1.0 - float(threshold)
    pairs = (
        scored_pairs.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
            F.col(score_col).cast("double").alias("score"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.max("score").alias("score"))
    )
    comp = connected_components(pairs, src_col="u", dst_col="v").select(
        F.col("conv_id").alias("u"), F.col("entity_id").alias("_comp")
    )
    withc = pairs.join(comp, "u")

    def cluster(pdf):
        import numpy as np
        import pandas as pd

        members = sorted(set(pdf["u"]) | set(pdf["v"]))
        n = len(members)
        if n > max_component:
            ent = members[0]
            return pd.DataFrame({"conv_id": members, "entity_id": [ent] * n})
        pos = {m: i for i, m in enumerate(members)}
        dist = np.ones((n, n), dtype="float64")
        np.fill_diagonal(dist, 0.0)
        for u, v, s in zip(pdf["u"], pdf["v"], pdf["score"]):
            d = min(max(1.0 - float(s), 0.0), 1.0)
            i, j = pos[u], pos[v]
            d = min(d, dist[i, j])  # max score == min distance
            dist[i, j] = dist[j, i] = d
        labels = _avg_linkage_labels(members, dist, cut)
        return pd.DataFrame({"conv_id": members, "entity_id": labels})

    id_type = dict(withc.dtypes)["u"]
    return withc.groupBy("_comp").applyInPandas(
        cluster, schema=f"conv_id {id_type}, entity_id {id_type}"
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


def incremental_components(
    assignments: DataFrame,
    new_edges: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fold NEW match edges (e.g. from ``link_increment``) into an
    existing (record -> entity) assignment without re-running connected
    components over the accumulated edge set.

    At 10^12-turn scale the record graph's full CC is a scheduled batch
    job; between runs the match table grows by increments whose edges
    touch a tiny fraction of entities. The maintenance trick is graph
    CONTRACTION: map each new edge's endpoints to their current entity
    ids (unseen records stand as their own singleton entity), drop
    now-internal edges, and run large-star/small-star on the contracted
    entity-level graph — its size is O(touched entities), independent of
    corpus size. Records of untouched entities are never reshuffled: the
    final remap is a broadcast-sized left join of the assignment table
    against the (touched-entity -> merged-entity) mapping.

    ``entity_id`` stays the component-min record id, so ids are STABLE
    under increments: an entity's id changes only when its component
    absorbs a smaller-id member. Result equals the batch rerun
    ``assign_entities(all_ids, old_edges ∪ new_edges)`` (asserted in
    tests).

    The remap broadcast is a deliberate hint: it sizes with TOUCHED
    entities, and the whole point is that the assignment table never
    shuffles. If an increment is so large that its touched-entity map
    outgrows executor memory, incremental maintenance is the wrong tool
    — run the scheduled full CC instead (the same crossover the
    reference's batch design implies).

    Returns the updated full assignment (conv_id, entity_id), including
    rows for edge endpoints the assignment table had never seen."""
    edges = new_edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    a = assignments.select(
        F.col(id_col).alias("conv_id"), F.col(cluster_col).alias("entity_id")
    )
    # endpoint -> current entity (unseen endpoint -> itself)
    def ent_of(col: str, out: str) -> DataFrame:
        return (
            edges.select(F.col(col).alias("conv_id"))
            .distinct()
            .join(a, "conv_id", "left")
            .select(
                F.col("conv_id").alias(col),
                F.coalesce("entity_id", "conv_id").alias(out),
            )
        )

    contracted = (
        edges.join(ent_of("src", "e_src"), "src")
        .join(ent_of("dst", "e_dst"), "dst")
        .select("e_src", "e_dst")
        .filter(F.col("e_src") != F.col("e_dst"))
    )
    # merged ids on the contracted graph only (O(touched entities))
    merged = connected_components(
        contracted, src_col="e_src", dst_col="e_dst"
    ).select(
        F.col("conv_id").alias("entity_id"), F.col("entity_id").alias("_new")
    )
    # remap: untouched assignments pass through the left join unchanged;
    # the mapping side is touched-entities-sized (broadcastable)
    new_endpoints = (
        edges.select(F.col("src").alias("conv_id"))
        .union(edges.select("dst"))
        .distinct()
        .join(a, "conv_id", "left_anti")
        .select("conv_id", F.col("conv_id").alias("entity_id"))
    )
    return (
        a.unionByName(new_endpoints)
        .join(F.broadcast(merged), "entity_id", "left")
        .select(
            "conv_id",
            F.coalesce("_new", "entity_id").alias("entity_id"),
        )
    )
