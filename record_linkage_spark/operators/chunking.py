"""Document chunking: split documents into overlapping token windows —
the corpus stage that feeds embedding models, retrieval indexes, and
fixed-context training examples.

Semantics: whitespace tokens; chunk ``i`` covers tokens
``[i * stride, i * stride + chunk_tokens)``; starts run ``0, stride,
2*stride, ...`` while ``start < n_tokens``, so every token is covered
(``stride <= chunk_tokens`` is enforced) and tail chunks may be short.
Offsets (``start_tok``, ``n_tok``) ride along so downstream spans map
back to the source document — the same span discipline as
``dedup.remove_duplicate_spans``.

Scale shape: pure Catalyst — ``split`` + ``sequence`` + ``explode`` +
``slice`` + ``array_join`` fuse into the scan with ZERO shuffle; the
fan-out per document is ``ceil(n_tokens / stride)``, bounded by the
document's own length, so there are no hot keys (a long document costs
its own chunks, never a partition-wide skew). At 100 TB, chunking is a
map-only stage that pipelines into the embedding/batch-score pass.

Oracle parity: DuckDB replays tokenize → generate_series → slice →
re-join exactly (``__spark_entry__`` folds ``chk='chunks'`` with the
boundary tokens embedded in the check key).

Reference (public): the fixed-size overlapping-window chunking used
throughout retrieval-augmented pipelines (e.g. the LangChain/Haystack
text-splitter convention). Reference-repo parity: the reference
serializes whole records (P21); chunking extends that surface to
sub-document granularity the reference does not have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, start_tok, n_tok, chunk_text) — one row per
    overlapping window. Null/empty documents produce no chunks."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}"
        )
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(t, r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("_toks")
    ).filter((F.size("_toks") > 0) & (F.element_at("_toks", 1) != ""))
    starts = F.sequence(
        F.lit(0),
        F.size("_toks") - 1,
        F.lit(stride),
    )
    chunks = base.select(
        "doc_id", "_toks", F.posexplode(starts).alias("chunk_idx", "start_tok")
    )
    piece = F.slice(F.col("_toks"), F.col("start_tok") + 1, chunk_tokens)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        F.size(piece).alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_stats(chunks: DataFrame) -> DataFrame:
    """One-row audit over a :func:`chunk_documents` frame: total chunks,
    docs covered, mean chunks/doc, short-tail fraction (chunks below
    full size) — the numbers that size the downstream embedding job."""
    return chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(
            F.count(F.lit(1)) / F.countDistinct("doc_id"), 6
        ).alias("chunks_per_doc"),
        F.round(
            F.avg(F.col("n_tok").cast("double")), 6
        ).alias("mean_chunk_tokens"),
    )
