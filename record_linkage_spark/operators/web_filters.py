"""C4-style heuristic web filters (Raffel et al., "Exploring the Limits
of Transfer Learning with a Unified Text-to-Text Transformer", JMLR 2020
§2.2) — the classic rule cascade that turned Common Crawl into C4,
re-expressed as pure Catalyst column work so it fuses into the scan:

  line level: keep only lines that end in a terminal punctuation mark
              AND contain at least ``min_words`` words
  doc level:  drop docs with fewer than ``min_sentences`` sentences after
              line filtering, docs mentioning any blocklisted phrase,
              docs containing "lorem ipsum", and docs containing a curly
              brace (code tell)

Everything is regex/HOF expressions over the text column — zero Python,
zero shuffle, predicate-pushdown friendly; at 100 TB this runs at scan
speed like :func:`record_linkage_spark.operators.curation.scrub_pii`.
The line filter uses ``F.filter`` over a BOUND ``split`` column (the
array is projected first — Catalyst HOF lambdas re-evaluate referenced
expression subtrees per element, so binding is the difference between
O(text) and O(text·lines)).

The original C4 also deduplicates three-sentence spans — that is this
repo's :func:`record_linkage_spark.operators.dedup.remove_duplicate_spans`
(span granularity is a parameter), so it is deliberately not repeated
here.

Reference: the rules are from the public C4 description; thresholds are
parameters with the paper's defaults (3 words/line, 5 sentences/doc).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the paper filters on a large public blocklist; default here is a tiny
# illustrative stand-in — pass your own via `blocklist=`
DEFAULT_BLOCKLIST = ("click here to subscribe", "all rights reserved")

TERMINAL_PUNCT = r'[.!?"”]$'


def _kept_lines(text_col: Column, min_words: int) -> Column:
    """Array of lines that end in terminal punctuation and have at least
    ``min_words`` whitespace words."""
    lines = F.split(text_col, r"\n")
    return F.filter(
        lines,
        lambda ln: (
            F.rtrim(ln).rlike(TERMINAL_PUNCT)
            & (F.size(F.split(F.trim(ln), r"\s+")) >= F.lit(min_words))
        ),
    )


def c4_filters(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_sentences: int = 5,
    blocklist: Iterable[str] = DEFAULT_BLOCKLIST,
) -> DataFrame:
    """Annotate ``docs`` with the C4 rule outcomes and the final verdict.

    Adds:
      - ``kept_text``: the doc rebuilt from surviving lines (newline-joined;
        NULL text stays NULL with every count 0 and ``keep`` false)
      - ``n_lines`` / ``n_kept_lines``: before/after the line filter
      - ``n_sentences``: terminal-punctuation marks in ``kept_text`` — the
        paper's sentence proxy, engine-portable
      - ``has_blocked`` / ``has_lorem`` / ``has_brace``: doc-level tells
      - ``keep``: all rules pass

    Filter with ``.filter("keep")`` and project ``kept_text``; the
    annotated form exists so funnel reports can attribute removals per
    rule (same lineage discipline as the curation pipeline stages).
    """
    text = F.col(text_col)
    kept_arr = _kept_lines(text, min_words)
    out = docs.withColumn("_kept_arr", kept_arr)
    lowered = F.lower(F.coalesce(text, F.lit("")))
    blocked = F.lit(False)
    for phrase in blocklist:
        blocked = blocked | lowered.contains(phrase.lower())
    kept_text = F.when(
        text.isNotNull(), F.array_join(F.col("_kept_arr"), "\n")
    )
    out = (
        out.withColumn("kept_text", kept_text)
        .withColumn(
            "n_lines",
            F.when(text.isNotNull(), F.size(F.split(text, r"\n")))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .withColumn(
            "n_kept_lines",
            F.when(text.isNotNull(), F.size("_kept_arr"))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .withColumn(
            "n_sentences",
            F.length(
                F.regexp_replace(F.coalesce("kept_text", F.lit("")), r"[^.!?]", "")
            ).cast("int"),
        )
        .withColumn("has_blocked", blocked)
        .withColumn("has_lorem", lowered.contains("lorem ipsum"))
        .withColumn("has_brace", lowered.contains("{"))
        .drop("_kept_arr")
    )
    keep = (
        text.isNotNull()
        & (F.col("n_sentences") >= F.lit(min_sentences))
        & ~F.col("has_blocked")
        & ~F.col("has_lorem")
        & ~F.col("has_brace")
    )
    return out.withColumn("keep", keep)
