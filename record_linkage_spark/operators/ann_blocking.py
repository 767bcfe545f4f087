"""Embedding-style (ANN) blocking: vector-similarity candidate pairs.

The modern-ER third leg next to the key-equality cascades (``blocking.
py`` B1/B2) and sorted neighborhood: represent every record as a vector,
bucket by random-hyperplane LSH, and keep bucket-mates whose exact
cosine clears a threshold. With a trained bi-encoder the vector column
is model output; this module supplies the *plumbing* plus a
deterministic stand-in encoder — a signed hashing-trick bag-of-tokens
vector (the hashing vectorizer the batch scorer already uses, here as
pure Catalyst columns so the whole path is SQL-replayable):

- ``hashed_text_vectors``: text -> L2-normalized ``array<double>`` of
  signed token-count buckets. Token hash is the md5-portable pattern
  (``conv(substr(md5(t),1,15),16,10)``) shared with dsir/dedup, so
  DuckDB rebuilds identical vectors.
- ``ann_candidate_pairs``: profiles -> (id_A, id_B, block_key,
  strategy) via RHP-LSH bucket self-join (``similarity_search.
  embedding_near_duplicates``) + exact-cosine verify. Drop-in third
  strategy for the linkage pipeline (``--strategy ANN``).
- ``ann_pair_filter``: the filter form over a hydrated (_A/_B) labeled
  pair table — vectors are built once per DISTINCT text (groupBy path,
  not a per-pair HOF), then joined back by text hash.

Scale shape:
- the vector build is explode -> groupBy(id, bucket) with map-side
  combine (|tokens| rows move once) -> one groupBy(id) to densify;
  no per-row Python anywhere;
- candidate generation is the banded LSH bucket join — each record
  meets only its bucket-mates, never the corpus (the B1/B2 salted
  self-join analogue for vector space);
- the exact-cosine verify runs only on bucket-mates (semi-join
  reduction, same discipline as the MinHash verify).

Reference anchor: the reference blocks exclusively on key equality
(``src/blocking/generate.py``); ANN blocking extends the same
candidate-pair contract to similarity space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.operators.similarity_search import (
    cosine_sim,
    embedding_near_duplicates,
)

ANN_DIM = 64
ANN_COSINE_THRESHOLD = 0.80
ANN_NUM_PLANES = 32
ANN_NUM_BANDS = 4


def _tok_hash(t: Column) -> Column:
    """md5-portable 60-bit token hash (same pattern as dsir/dedup)."""
    return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")


def hashed_text_vectors(
    texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = ANN_DIM,
) -> DataFrame:
    """``(id_col, text_col)`` -> ``(id_col, vec)`` with ``vec`` an
    L2-normalized signed hashing-trick vector of whitespace tokens.

    bucket and sign both come from one hash: ``x = h mod 2*dim``,
    bucket = x div 2, sign = +1/-1 from x mod 2 — one md5 per token,
    trivially replayable. Records with no tokens produce no row (the
    key-cascade analogue of a null block key).
    """
    toks = texts.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
        ).alias("_t"),
    ).filter(F.col("_t") != "")
    x = F.pmod(_tok_hash(F.col("_t")), F.lit(2 * dim))
    signed = toks.select(
        "_id",
        (x / F.lit(2)).cast("int").alias("_bucket"),
        F.when(F.pmod(x, F.lit(2)) == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("_sign"),
    )
    counts = signed.groupBy("_id", "_bucket").agg(
        F.sum("_sign").alias("_val")
    )
    # densify by MAP KEY lookup (buckets are 0-based ids, not positions)
    dense = (
        counts.groupBy("_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_bucket", "_val"))
            ).alias("_m")
        )
        .select(
            "_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                # try_element_at: ANSI mode makes plain map[key] / element_at
                # throw on a missing key; absent buckets must read as 0
                lambda i: F.coalesce(
                    F.try_element_at(F.col("_m"), i), F.lit(0.0)
                ),
            ).alias("_raw"),
        )
    )
    normed = dense.select(
        "_id",
        F.sqrt(
            F.aggregate(
                "_raw", F.lit(0.0), lambda acc, v: acc + v * v
            )
        ).alias("_n"),
        "_raw",
    ).select(
        F.col("_id").alias(id_col),
        F.when(
            F.col("_n") > 0,
            F.transform(F.col("_raw"), lambda v: v / F.col("_n")),
        )
        .otherwise(F.col("_raw"))
        .alias("vec"),
    )
    return normed


def ann_candidate_pairs(
    profiles: DataFrame,
    id_col: str = "conv_id",
    text_cols: tuple[str, ...] = ("first_text_norm", "last_text_norm"),
    dim: int = ANN_DIM,
    cosine_threshold: float = ANN_COSINE_THRESHOLD,
    num_planes: int = ANN_NUM_PLANES,
    num_bands: int = ANN_NUM_BANDS,
) -> DataFrame:
    """Generator form: (id_A, id_B, block_key, strategy) candidate pairs
    whose hashed-text vectors clear ``cosine_threshold``, found via the
    banded RHP-LSH bucket self-join (never all pairs)."""
    texts = profiles.select(
        F.col(id_col),
        F.concat_ws(" ", *[F.coalesce(F.col(c), F.lit("")) for c in text_cols]).alias(
            "_text"
        ),
    )
    vecs = hashed_text_vectors(texts, id_col=id_col, text_col="_text", dim=dim)
    pairs = embedding_near_duplicates(
        vecs,
        cosine_threshold=cosine_threshold,
        num_planes=num_planes,
        num_bands=num_bands,
        id_col=id_col,
        vec_col="vec",
    )
    return pairs.select(
        "id_A",
        "id_B",
        F.lit("ann").alias("block_key"),
        F.lit("ANN").alias("strategy"),
    )


def ann_pair_filter(
    hydrated_pairs: DataFrame,
    text_cols: tuple[str, ...] = ("first_text_norm", "last_text_norm"),
    dim: int = ANN_DIM,
    cosine_threshold: float = ANN_COSINE_THRESHOLD,
) -> DataFrame:
    """Filter form over a hydrated (_A/_B) pair table: keep pairs whose
    hashed-text vectors clear the cosine threshold.

    Vectors are built once per DISTINCT text via the groupBy path and
    joined back on the text's md5 — the per-pair cost is two hash joins,
    not a per-pair O(dim x tokens) expression."""
    a_text = F.concat_ws(
        " ", *[F.coalesce(F.col(f"{c}_A"), F.lit("")) for c in text_cols]
    )
    b_text = F.concat_ws(
        " ", *[F.coalesce(F.col(f"{c}_B"), F.lit("")) for c in text_cols]
    )
    keyed = hydrated_pairs.withColumn("_ka", F.md5(a_text)).withColumn(
        "_kb", F.md5(b_text)
    )
    texts = (
        keyed.select(F.col("_ka").alias("_k"), a_text.alias("_text"))
        .unionByName(keyed.select(F.col("_kb").alias("_k"), b_text.alias("_text")))
        .dropDuplicates(["_k"])
    )
    vecs = hashed_text_vectors(texts, id_col="_k", text_col="_text", dim=dim)
    va = vecs.select(F.col("_k").alias("_ka"), F.col("vec").alias("_va"))
    vb = vecs.select(F.col("_k").alias("_kb"), F.col("vec").alias("_vb"))
    out = (
        keyed.join(va, "_ka")
        .join(vb, "_kb")
        .filter(cosine_sim("_va", "_vb") >= F.lit(cosine_threshold))
    )
    return out.drop("_ka", "_kb", "_va", "_vb")


def brute_force_cosine_pairs(
    texts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = ANN_DIM,
    cosine_threshold: float = ANN_COSINE_THRESHOLD,
) -> DataFrame:
    """Exact all-pairs cosine over hashed-text vectors — the oracle /
    recall baseline for the LSH path (quadratic; slice the input)."""
    vecs = hashed_text_vectors(texts, id_col=id_col, text_col=text_col, dim=dim)
    a = vecs.select(F.col(id_col).alias("id_A"), F.col("vec").alias("_va"))
    b = vecs.select(F.col(id_col).alias("id_B"), F.col("vec").alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_A") < F.col("id_B"))
        .withColumn("cosine", cosine_sim("_va", "_vb"))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_A", "id_B", "cosine")
    )
