"""DSIR: data selection via importance resampling.

Xie, Santurkar, Ma & Liang, "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023): to pick pretraining documents
that LOOK LIKE a target domain, estimate cheap bag-of-hashed-n-gram
distributions for the target and the raw pool, weight every raw
document by its log importance ratio

    log w(d) = sum over d's features f of  c_d(f) * (ln p_tgt(f) - ln p_raw(f))

and resample with Gumbel-top-k (adding an independent Gumbel to each
log weight and taking the k largest == sampling without replacement
proportionally to w). Features are unigrams + bigrams hashed into B
buckets, so both "models" are one count-vector each, no vocabulary.

Determinism: the Gumbel noise derives from a hash of the doc id
(u = hash/2^60, g = -ln(-ln u)) — parallelism-invariant and replayable
from an independent SQL engine; the ``dsir_select`` contract twin
recomputes the full pipeline (features, both distributions, log
weights, Gumbel keys, top-k) in DuckDB.

Scale shape: distribution estimation is one groupBy-count per corpus
over (doc, bucket) rows (map-side combine); log-prob tables are at most
B rows each — they broadcast into the scoring join; per-doc weights are
one aggregation. Selection is a bounded top-k (k is the requested
sample size). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.operators.text_analysis import _tokens

_HEX15 = float(16**15)


def _hash_col(portable: bool, expr: Column, buckets: int) -> Column:
    if portable:
        return (
            F.conv(F.substring(F.md5(expr), 1, 15), 16, 10).cast("long")
            % buckets
        )
    return F.pmod(F.xxhash64(expr), F.lit(buckets))


def hashed_ngram_features(
    docs: DataFrame,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(id, bucket, c) counts of hashed unigram+bigram features. The
    token array is bound once (HOF-lambda re-evaluation, see dedup.py);
    bigrams join with a space."""
    base = docs.select(
        F.col(id_col).alias("_id"), _tokens(F.col(text_col)).alias("_t")
    )
    uni = base.select("_id", F.explode("_t").alias("_f"))
    bi = (
        base.filter(F.size("_t") >= 2)
        .select(
            "_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("_t"), 1, F.size("_t") - 1),
                    F.slice(F.col("_t"), 2, F.size("_t") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("_f"),
        )
    )
    return (
        uni.unionByName(bi)
        .select("_id", _hash_col(portable, F.col("_f"), buckets).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count("*").alias("c"))
        .select(F.col("_id").alias(id_col), "bucket", "c")
    )


def _bucket_logprobs(
    feats: DataFrame, buckets: int, alpha: float
) -> DataFrame:
    """(bucket, logp) over ALL buckets (unseen ones get the smoothing
    floor), normalized with add-alpha over the B-bucket support."""
    spark = feats.sparkSession
    counts = feats.groupBy("bucket").agg(F.sum("c").alias("n"))
    total = feats.agg(F.sum("c").cast("double").alias("tot"))
    support = spark.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    return (
        support.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha))
                / (F.col("tot") + F.lit(alpha * buckets))
            ).alias("logp"),
        )
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(id, n_feats, log_w) for every raw doc with at least one token;
    log_w = sum c_d(b) * (logp_target(b) - logp_raw(b))."""
    raw_f = hashed_ngram_features(raw, buckets, id_col, text_col, portable)
    p_raw = _bucket_logprobs(raw_f, buckets, alpha)
    p_tgt = _bucket_logprobs(
        hashed_ngram_features(target, buckets, id_col, text_col, portable),
        buckets,
        alpha,
    )
    ratio = p_tgt.select(
        "bucket", F.col("logp").alias("_lt")
    ).join(p_raw.select("bucket", F.col("logp").alias("_lr")), "bucket")
    return (
        raw_f.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * (F.col("_lt") - F.col("_lr"))).alias("log_w"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    buckets: int = 1024,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """Gumbel-top-k selection: key = log_w + Gumbel(hash(id)); the k
    largest keys are a without-replacement sample proportional to the
    importance weights. Returns (id, n_feats, log_w, gumbel_key) for
    the selected docs; the top-k is bounded by construction (k = the
    requested sample size), with a (key desc, id) total order so ties
    are deterministic."""
    w = dsir_log_weights(
        raw, target, buckets, alpha, id_col, text_col, portable
    )
    if portable:
        h = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
    else:
        h = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(2**60))
    u = (h.cast("double") + 0.5) / F.lit(_HEX15 if portable else float(2**60))
    key = F.col("log_w") - F.log(-F.log(u))
    ranked = w.select(id_col, "n_feats", "log_w", key.alias("gumbel_key"))
    order = F.struct(
        (-F.col("gumbel_key")).alias("nk"), F.col(id_col).alias("i")
    )
    return (
        ranked.withColumn("_o", order)
        .orderBy("_o")
        .limit(k)
        .drop("_o")
    )
