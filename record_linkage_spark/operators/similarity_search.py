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


def rhp_signature(vec_col, num_planes: int = 16, plane_base: int = 0) -> Column:
    """Random-hyperplane (SimHash) bit signature of a vector as a long.

    ``plane_base`` offsets the deterministic plane index space so callers
    can draw INDEPENDENT signatures (e.g. one r-bit signature per LSH
    band — ``ann_blocking.banding_plan``'s scale path) without colliding
    with the planes of any other signature."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    idx = F.sequence(F.lit(0), F.size(v) - 1)

    def _proj(plane: int):
        # closure factory: pyspark higher-order lambdas must take exactly
        # the declared arguments (no bound defaults)
        return lambda x, i: x * _plane_coeff(plane, i)

    bits = []
    for p in range(num_planes):
        dot = F.aggregate(
            F.zip_with(v, idx, _proj(plane_base + p)),
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
    # explicit-N repartition on the bucket key: AQE sizes the exchange by
    # the banded input rows and is blind to the within-bucket pair
    # blow-up (same defense as the LSH band joins elsewhere); the blow-up
    # here also carries the vectors, so landing it on few cores is doubly
    # expensive
    n_parts = max(
        vectors.sparkSession.sparkContext.defaultParallelism * 2, 8
    )
    a = base.select(
        "bucket", F.col("vid").alias("id_A"), F.col("v").alias("va")
    ).repartition(n_parts, "bucket")
    b = base.select(
        "bucket", F.col("vid").alias("id_B"), F.col("v").alias("vb")
    ).repartition(n_parts, "bucket")
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
        # empty cells drop out; LAZY localCheckpoint keeps the loop's
        # lineage flat without paying one materialization job per
        # iteration — the first downstream action computes the whole
        # Lloyd chain once (each step runs exactly once: the chain is
        # linear), the same job-fusion that cut the CC loop 4.1->3.1 s
        # (clustering.py). Measured here: training 5.7 s -> ~2 s at
        # sf0.1 where per-job scheduling latency dominates the tiny
        # k x dim state; at real scale the work per job dominates and
        # the fusion is neutral.
        centroids = means.localCheckpoint(eager=False)
    return centroids


def _cell_join_parts(cells: DataFrame, rows_per_part: int = 100_000) -> int | None:
    """Size the within-cell self-join exchange from the BOUNDED per-cell
    count frame (<= n_clusters rows). AQE sizes exchanges by INPUT bytes
    and would coalesce the sum k_i^2 pair blow-up onto few cores, so we
    compute the blow-up EXACTLY (not the balanced-cell estimate — skewed
    cells are precisely when the defense matters) and size for
    ``rows_per_part`` pair rows per partition, floored at the session's
    parallelism. Returns None — no forced repartition — when the whole
    blow-up fits comfortably in one coalesced partition, so the defense
    costs nothing when cells are small (the r4 flat-8s finding: the
    fixed 2x-parallelism repartition cost ~0.25 s at sf0.1 for zero
    benefit at 16 tiny cells). The count agg doubles as the
    materializing action for the lazily-checkpointed assignment, so it
    adds no extra pass over the corpus."""
    rows = cells.groupBy("cell").count().collect()
    est_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in rows)
    if est_pairs <= rows_per_part:
        return None
    sc = cells.sparkSession.sparkContext
    want = -(-est_pairs // rows_per_part)  # ceil
    return max(sc.defaultParallelism, min(want, 8 * sc.defaultParallelism))


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

    Returns (id_A, id_B, cosine, cell) with id_A < id_B.

    NOTE: construction runs ONE bounded sizing job (<= n_clusters rows
    collected — the per-cell counts that size the self-join exchange,
    ``_cell_join_parts``), the same call-time-sizing precedent as
    ``connected_components``' convergence-signature job."""
    centroids = train_ivf_centroids(vectors, n_clusters, iterations, id_col, vec_col)
    cells = _assign_cells(vectors, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    # explicit-N repartition on the cell key: one row per vector goes IN,
    # sum-of-k_i^2 pair rows come OUT — AQE sizes the exchange by the
    # input and would coalesce the within-cell blow-up onto few cores.
    # Sized adaptively from the exact per-cell counts (None = blow-up is
    # small, skip the defense entirely).
    n_parts = _cell_join_parts(cells)
    a = cells.select(
        "cell", F.col("_vid").alias("id_A"), F.col("_v").alias("va")
    )
    b = cells.select(
        "cell", F.col("_vid").alias("id_B"), F.col("_v").alias("vb")
    )
    if n_parts:
        a = a.repartition(n_parts, "cell")
        b = b.repartition(n_parts, "cell")
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
    # lazy checkpoint: cells feeds FOUR consumers (both join sides, the
    # component overlay, the keep window) — materialize the assignment
    # once instead of recomputing the scoring chain per branch
    cells = _assign_cells(vectors, centroids, id_col, vec_col).localCheckpoint(
        eager=False
    )
    # same AQE-blind within-cell blow-up defense as semdedup_candidates,
    # sized adaptively from the exact per-cell counts
    n_parts = _cell_join_parts(cells)
    a = cells.select(
        "cell", F.col("_vid").alias("id_A"), F.col("_v").alias("va")
    )
    b = cells.select(
        "cell", F.col("_vid").alias("id_B"), F.col("_v").alias("vb")
    )
    if n_parts:
        a = a.repartition(n_parts, "cell")
        b = b.repartition(n_parts, "cell")
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


def _l2sq(a, b) -> Column:
    """Squared L2 distance of two array columns (JVM built-ins)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sub_explode(df: DataFrame, vec_col: str, m: int, sub_len: int, out: str) -> DataFrame:
    """(.., sub, <out>) — each vector split into m contiguous sub-vectors.
    The slice runs inside a transform over a BOUND column, so the vector
    is materialized once per row, not once per subspace."""
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.slice(F.col(vec_col), i * sub_len + 1, sub_len),
    )
    return df.select("*", F.posexplode(slices).alias("sub", out)).drop(vec_col)


def train_pq_codebooks(
    corpus: DataFrame,
    m_subspaces: int = 4,
    k_codes: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Product-quantization codebooks (Jegou/Douze/Schmid TPAMI 2011):
    split every vector into ``m_subspaces`` contiguous sub-vectors and
    k-means each subspace independently — a vector then compresses to m
    small codes (m bytes at k<=256) instead of dim floats. At 100 TB of
    embeddings this is the difference between storing/scanning 256-byte
    codes and 3 KB floats; ADC search (:func:`pq_topk`) scores against
    the codes without ever decompressing.

    Deterministic like :func:`train_ivf_centroids`: initial codebook =
    sub-vectors of the first ``k_codes`` vectors in hash order
    (``portable=True`` orders by md5 of the id string so an external
    engine can replay the init; default xxhash64), then Lloyd iterations
    as DataFrame ops (broadcast codebooks -> per-(vid,sub) argmin with
    (dist, code) tie-break -> per-(sub,code,dim) mean).
    ``iterations=0`` returns the init codebook unchanged — the fully
    SQL-replayable configuration the oracle entry uses.

    Returns (sub:int, code:int, centroid:array<double>). Codebook state
    is m x k x (dim/m) — driver/broadcast-sized by construction; the one
    driver scalar read is the vector dimension."""
    dim = corpus.select(F.size(F.col(vec_col)).alias("d")).first().d
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sub_len = dim // m_subspaces
    base = corpus.select(
        F.col(id_col).cast("string").alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    ord_col = (
        F.md5(F.col("vid")) if portable else F.xxhash64(F.col("vid"))
    )
    init = base.orderBy(ord_col, "vid").limit(k_codes).withColumn(
        "code",
        F.row_number().over(Window.orderBy(ord_col, F.col("vid"))) - 1,
    )
    codebooks = _sub_explode(init, "_v", m_subspaces, sub_len, "centroid").select(
        "sub", "code", "centroid"
    )
    if not iterations:
        return codebooks
    subs = _sub_explode(base, "_v", m_subspaces, sub_len, "subv").select(
        "vid", "sub", "subv"
    ).localCheckpoint()
    for _ in range(iterations):
        d = subs.join(F.broadcast(codebooks), "sub").withColumn(
            "_d", _l2sq("subv", "centroid")
        )
        w = Window.partitionBy("vid", "sub").orderBy(F.asc("_d"), F.asc("code"))
        best = d.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        )
        codebooks = (
            best.select("sub", "code", F.posexplode("subv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("sub", "code")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .localCheckpoint()
        )
    return codebooks


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress vectors to PQ codes: per subspace, the nearest codebook
    centroid's code ((dist, code) tie-break). One broadcast join + one
    argmin window + one re-assembly groupBy — the corpus shuffles only
    on its own id to collect the m codes per vector.

    Returns (<id_col>, codes:array<int>) with codes[i] = subspace i's
    code."""
    first = codebooks.select(F.size("centroid").alias("l"), "sub").first()
    sub_len = first.l
    m = codebooks.agg(F.max("sub")).first()[0] + 1
    base = vectors.select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    subs = _sub_explode(base, "_v", m, sub_len, "subv")
    d = subs.join(F.broadcast(codebooks), "sub").withColumn(
        "_d", _l2sq("subv", "centroid")
    )
    w = Window.partitionBy("_vid", "sub").orderBy(F.asc("_d"), F.asc("code"))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("_vid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        .select(F.col("_vid").alias(id_col), "codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m_subspaces: int = 4,
    k_codes: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query builds a
    tiny (m x k) lookup table of sub-vector dot products against the
    codebooks; a corpus vector's approximate inner product is then just
    the sum of m table lookups — the corpus is scanned as CODES, never as
    floats. Queries x LUT stay broadcast-sized; the only corpus shuffle
    is the (query, neighbor) partial-sum aggregation, which combines
    map-side. For cosine semantics, normalize both sides upstream.

    Returns (query_id, neighbor_id, adc:double rounded 6, rank)."""
    codebooks = train_pq_codebooks(
        corpus, m_subspaces, k_codes, iterations, id_col, vec_col, portable
    ).localCheckpoint()
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    sub_len = codebooks.select(F.size("centroid").alias("l")).first().l
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    lut = (
        _sub_explode(q, "_v", m_subspaces, sub_len, "qsub")
        .join(F.broadcast(codebooks), "sub")
        .select("query_id", "sub", "code", _dot("qsub", "centroid").alias("dot"))
    )
    scored = (
        codes.select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("codes").alias("sub", "code"),
        )
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("dot"), 6).alias("adc"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 4,
    k_codes: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (the standard billion-scale ANN layout): the coarse
    quantizer restricts each query's scan to ``n_probe`` of
    ``n_centroids`` inverted lists, and within those lists vectors score
    by ADC over their PQ codes — so the hot loop touches neither the full
    corpus nor any float vector. Corpus-side state per vector is (cell,
    m codes); both quantizers are the deterministic trainers above.

    Scan cost per query ~ (n_probe / n_centroids) x |corpus| x m table
    lookups; the only corpus-wide shuffles are the two encode argmins.
    Returns (query_id, neighbor_id, adc, rank)."""
    centroids = train_ivf_centroids(
        corpus, n_centroids, iterations, id_col, vec_col
    )
    cells = _assign_cells(corpus, centroids, id_col, vec_col).select(
        F.col("_vid").alias("neighbor_id"), "cell"
    )
    codebooks = train_pq_codebooks(
        corpus, m_subspaces, k_codes, iterations, id_col, vec_col
    ).localCheckpoint()
    codes = pq_encode(corpus, codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    sub_len = codebooks.select(F.size("centroid").alias("l")).first().l

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    q_cells = q.crossJoin(F.broadcast(centroids)).withColumn(
        "_sim", cosine_sim("qv", "centroid")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        q_cells.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "cell")
    )
    lut = (
        _sub_explode(q.withColumnRenamed("qv", "_v"), "_v", m_subspaces, sub_len, "qsub")
        .join(F.broadcast(codebooks), "sub")
        .select("query_id", "sub", "code", _dot("qsub", "centroid").alias("dot"))
    )
    cands = (
        codes.join(cells, "neighbor_id")
        .join(F.broadcast(probes), "cell")
        .select(
            "query_id",
            "neighbor_id",
            F.posexplode("codes").alias("sub", "code"),
        )
    )
    scored = (
        cands.join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("dot"), 6).alias("adc"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )
