"""Corpus-trained n-gram LM perplexity scoring (CCNet-style quality
filtering).

Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data" (LREC 2020) rank web documents by the perplexity
of an in-domain language model and keep the low-perplexity head —
the single most load-bearing quality filter in modern pretraining
pipelines. This implements the distributed version with a bigram LM
trained as two Spark aggregations (no external model): unigram counts,
bigram counts, add-alpha smoothing

    p(w2 | w1) = (c(w1, w2) + a) / (c(w1) + a * V)

and per-document cross-entropy H(d) = -mean log2 p over d's bigrams
(BOS-padded, so one-token docs still score). Perplexity = 2^H; callers
cut at a quantile of H exactly as CCNet does (head/middle/tail).
Training on a REFERENCE corpus (``lm_docs``) scores how in-domain each
candidate document is; training on the corpus itself makes H an
outlier/garbage detector (gibberish has no repeated bigrams).

Scale shape: the LM is two groupBy-count aggregations (map-side
combine); scoring joins each doc's exploded bigrams to the count
tables by key — |corpus tokens| rows through two equality joins, the
same order as any tokenizing operator; V and the smoothing constant
ride in a broadcast single-row frame. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.operators.text_analysis import _tokens

_BOS = "\x02"  # out-of-alphabet sentinel: _tokens never emits it


def _bigrams(doc_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) rows, BOS-padded: a doc with tokens [a, b] yields
    (BOS, a), (a, b). Tokenless docs yield nothing (scored NULL)."""
    toks = F.concat(
        F.array(F.lit(_BOS)), _tokens(F.col(text_col))
    )
    base = doc_df.select(F.col(id_col).alias("_id"), toks.alias("_t")).filter(
        F.size("_t") >= 2
    )
    shifted = F.arrays_zip(
        F.slice(F.col("_t"), 1, F.size("_t") - 1),
        F.slice(F.col("_t"), 2, F.size("_t") - 1),
    )
    return base.select("_id", F.explode(shifted).alias("_g")).select(
        "_id", F.col("_g.0").alias("w1"), F.col("_g.1").alias("w2")
    )


def train_bigram_lm(
    lm_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the LM: returns (unigram_counts(w1, c1),
    bigram_counts(w1, w2, c2), vocab(v) single-row). Unigram counts are
    LEFT-CONTEXT counts (how often w1 starts a bigram), which is the
    correct conditional-probability denominator; V counts distinct
    right-hand tokens + 1 for unseen."""
    bg = _bigrams(lm_docs, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    unigram_counts = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = bg.select("w2").distinct().agg(
        (F.count("*") + 1).cast("double").alias("v")
    )
    return unigram_counts, bigram_counts, vocab


def lm_cross_entropy(
    docs: DataFrame,
    lm_docs: DataFrame | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every doc with the bigram-LM cross-entropy (bits/bigram).
    ``lm_docs`` defaults to ``docs`` (self-trained outlier detector).
    Returns (id, n_bigrams, cross_entropy) — docs with no bigrams get
    NULL cross_entropy (nothing to judge them by). Unseen bigrams and
    unseen left contexts fall back to the smoothed floor a / (a*V)."""
    unigram_counts, bigram_counts, vocab = train_bigram_lm(
        lm_docs if lm_docs is not None else docs, id_col, text_col
    )
    bg = _bigrams(docs, id_col, text_col)
    scored = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(unigram_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            (
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
            ).alias("_p"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.avg(F.log2("_p"))).alias("cross_entropy"),
        )
        .select(
            F.col("_id").alias(id_col), "n_bigrams", "cross_entropy"
        )
    )


def perplexity_filter(
    docs: DataFrame,
    keep_quantile: float = 0.7,
    lm_docs: DataFrame | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet head-cut: keep docs whose cross-entropy is at or below the
    corpus ``keep_quantile`` (plus docs too short to score — judging
    them needs a different signal, cf. quality_features). The quantile
    comes from one approx_percentile aggregate (mergeable sketch — the
    100 TB path), collected as a single scalar."""
    ce = lm_cross_entropy(docs, lm_docs=lm_docs, alpha=alpha,
                          id_col=id_col, text_col=text_col)
    cut = ce.agg(
        F.expr(
            f"approx_percentile(cross_entropy, CAST({float(keep_quantile)} AS DOUBLE))"
        ).alias("q")
    ).first().q
    scored = docs.join(ce, id_col, "left")
    return scored.filter(
        F.col("cross_entropy").isNull() | (F.col("cross_entropy") <= F.lit(cut))
    )
