"""Similarity search over embedding columns (array<float>).

Two paths, both over an ``embeddings``-shaped table (vec_id, embedding):
  * brute-force cosine top-k — correctness baseline: a (broadcast) join of
    queries against the corpus with the dot product computed by
    ``aggregate``/``zip_with`` built-ins (JVM), top-k via window row_number
  * LSH-bucketed ANN — scale path: random-hyperplane signatures (planes
    derived deterministically from xxhash64 of (plane, dim) — no stored
    model needed), band buckets, candidate join within buckets, exact
    re-rank. At 100 TB the bucket join replaces the corpus-wide cross
    product; recall is tunable via bands/planes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_sim(a, b) -> Column:
    """Cosine similarity of two array<float|double> columns via zip_with +
    aggregate (JVM built-ins; 0.0 when either norm is 0)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set
    against the corpus; per-query top-k via window. Returns
    (query_id, neighbor_id, cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _plane_coeff(plane: int, dim_index: Column) -> Column:
    """Deterministic pseudo-gaussian hyperplane coefficient in [-1, 1):
    xxhash64(plane, dim) scaled — reproducible on any executor, no
    broadcast state."""
    h = F.xxhash64(F.lit(int(plane)), dim_index)
    return (F.pmod(h, F.lit(2_000_001)) - F.lit(1_000_000)) / F.lit(1_000_000.0)


def rhp_signature(vec_col, num_planes: int = 16) -> Column:
    """Random-hyperplane (SimHash) bit signature of a vector as a long."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    idx = F.sequence(F.lit(0), F.size(v) - 1)

    def _proj(plane: int):
        # closure factory: pyspark higher-order lambdas must take exactly
        # the declared arguments (no bound defaults)
        return lambda x, i: x * _plane_coeff(plane, i)

    bits = []
    for p in range(num_planes):
        dot = F.aggregate(
            F.zip_with(v, idx, _proj(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 16,
    num_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: RHP signature -> band buckets -> candidate join ->
    exact cosine re-rank within candidates."""
    bits_per_band = num_planes // num_bands

    def banded(df: DataFrame, role: str) -> DataFrame:
        sig = rhp_signature(F.col(vec_col), num_planes)
        bands = F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(str(i)),
                    F.shiftright(sig, i * bits_per_band)
                    .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                    .cast("string"),
                )
                for i in range(num_bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_v"),
            F.explode(bands).alias("bucket"),
        )

    cq = banded(queries, "query")
    cc = banded(corpus, "neighbor")
    cands = (
        cc.join(cq, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_sim("query_v", "neighbor_v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    cosine_threshold: float = 0.95,
    num_planes: int = 16,
    num_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via the LSH bucket self-join."""
    sig = rhp_signature(F.col(vec_col), num_planes)
    bits_per_band = num_planes // num_bands
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(i)),
                F.shiftright(sig, i * bits_per_band)
                .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                .cast("string"),
            )
            for i in range(num_bands)
        ]
    )
    base = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), F.explode(bands).alias("bucket")
    )
    a = base.select("bucket", F.col("vid").alias("id_A"), F.col("v").alias("va"))
    b = base.select("bucket", F.col("vid").alias("id_B"), F.col("v").alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_A") < F.col("id_B"))
        .dropDuplicates(["id_A", "id_B"])
        .withColumn("cosine", cosine_sim("va", "vb"))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_A", "id_B", "cosine")
    )


def _assign_cells(vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table,
    exact cosine per (vector, centroid), keep the argmax. Output carries
    the winning cosine as ``_csim`` (the SemDeDup keep policy reads it)."""
    scored = (
        vectors.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("_sim", cosine_sim("_v", "centroid"))
    )
    w = Window.partitionBy("_vid").orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("_vid"), F.col("_v"), F.col("cell"), F.col("_sim").alias("_csim"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: hash-seeded initial
    centroids (orderBy xxhash64(id) — parallelism-invariant, no rand()),
    then Lloyd iterations expressed as DataFrame ops: assign ->
    posexplode -> per-(cell, dim) mean -> re-assemble. Returns
    (cell:int, centroid:array<double>). Centroids are tiny (k x dim) —
    the only driver-side state, re-broadcast each iteration."""
    base = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    init = (
        base.orderBy(F.xxhash64(F.col("vid").cast("string")), "vid")
        .limit(n_centroids)
        .select(F.col("v").alias("centroid"))
    )
    w = Window.orderBy(F.xxhash64(F.concat_ws(",", F.transform("centroid", lambda x: x.cast("string")))))
    centroids = init.withColumn("cell", F.row_number().over(w) - 1).select("cell", "centroid")

    for _ in range(iterations):
        assigned = _assign_cells(base, centroids, "vid", "v")
        means = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
        )
        # empty cells drop out; localCheckpoint keeps the loop's lineage flat
        centroids = means.localCheckpoint()
    return centroids


def semantic_duplicate_pairs(
    vectors: DataFrame,
    cosine_threshold: float = 0.95,
    n_clusters: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style candidate generation (Abbas et al. 2023,
    arXiv:2303.09540): k-means-partition the embedding space with the
    deterministic quantizer (``train_ivf_centroids`` — hash-seeded, no
    rand()), then compute exact cosine only WITHIN each cell. Each vector
    lands in exactly one cell, so unlike the banded LSH path there is no
    cross-band dedup and the per-pair cost is paid once. At 100 TB the
    within-cell self-join replaces the corpus-wide cross product; cell
    count scales with the corpus so cells stay bounded.

    Returns (id_A, id_B, cosine, cell) with id_A < id_B."""
    centroids = train_ivf_centroids(vectors, n_clusters, iterations, id_col, vec_col)
    cells = _assign_cells(vectors, centroids, id_col, vec_col)
    a = cells.select("cell", F.col("_vid").alias("id_A"), F.col("_v").alias("va"))
    b = cells.select("cell", F.col("_vid").alias("id_B"), F.col("_v").alias("vb"))
    return (
        a.join(b, "cell")
        .filter(F.col("id_A") < F.col("id_B"))
        .withColumn("cosine", cosine_sim("va", "vb"))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_A", "id_B", "cosine", "cell")
    )


def semantic_deduplicate(
    vectors: DataFrame,
    cosine_threshold: float = 0.95,
    n_clusters: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedup over an embedding column — the SemDeDup policy
    (Abbas et al. 2023): duplicate groups are connected components of the
    within-cell cosine>=tau pair graph, and the member KEPT from each
    group is the one with the LOWEST cosine to its cell centroid (the
    paper keeps the cluster outlier to preserve diversity; ties break to
    the smallest id). Components reuse the audited large-star/small-star
    loop, so the group structure is exactly what the pair graph implies —
    no greedy order dependence.

    Returns one row per input vector:
    (vec_id, cell, centroid_sim, group_id, keep:boolean); singletons
    (no duplicate above tau) always keep=true with group_id = own id."""
    from record_linkage_spark.operators.clustering import connected_components

    centroids = train_ivf_centroids(vectors, n_clusters, iterations, id_col, vec_col)
    cells = _assign_cells(vectors, centroids, id_col, vec_col)
    a = cells.select("cell", F.col("_vid").alias("id_A"), F.col("_v").alias("va"))
    b = cells.select("cell", F.col("_vid").alias("id_B"), F.col("_v").alias("vb"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_A") < F.col("id_B"))
        .withColumn("cosine", cosine_sim("va", "vb"))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_A", "id_B")
    )
    comps = connected_components(pairs, src_col="id_A", dst_col="id_B").select(
        F.col("conv_id").alias("_vid"), F.col("entity_id").alias("group_id")
    )
    members = (
        cells.join(comps, "_vid", "left")
        .withColumn("group_id", F.coalesce("group_id", F.col("_vid")))
    )
    w = Window.partitionBy("group_id").orderBy(F.asc("_csim"), F.asc("_vid"))
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .select(
            F.col("_vid").alias(id_col),
            "cell",
            F.col("_csim").alias("centroid_sim"),
            "group_id",
            (F.col("_rn") == 1).alias("keep"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into inverted
    lists (cells), probe each query's n_probe nearest cells only, exact
    cosine re-rank within the probed lists. The scale path when the
    corpus is too large for brute force and RHP-LSH recall is not
    enough: scanning n_probe/n_centroids of the corpus per query.
    Returns (query_id, neighbor_id, cosine, rank)."""
    centroids = train_ivf_centroids(corpus, n_centroids, iterations, id_col, vec_col)
    corpus_cells = _assign_cells(corpus, centroids, id_col, vec_col).select(
        F.col("_vid").alias("neighbor_id"), F.col("_v").alias("cv"), "cell"
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q_scored = q.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine_sim("qv", "centroid")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        q_scored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )

    cands = (
        corpus_cells.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_sim("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
