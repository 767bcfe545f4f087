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

import pandas as pd
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


# Gopher's "contains at least min_stop_words of these" rule list
# (Rae et al. 2021, A1.1)
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al., "Scaling Language Models: ...
    Gopher", 2021, Appendix A1.1) — the second classic web-scale rule
    set next to :func:`c4_filters` (and the statistical complement to
    the CCNet perplexity filter in ``operators/lm_quality.py``):

      - word count within [min_words, max_words]
      - mean word length within [min, max]
      - symbol-to-word ratio ('#' chars + '...' occurrences) <= max
      - at most max_bullet_line_frac of lines start with a bullet
      - at most max_ellipsis_line_frac of lines end with '...'
      - at least min_alpha_word_frac of words contain a letter
      - at least min_stop_words distinct stop words present

    Pure Catalyst: the word/line arrays are BOUND as projected columns
    before any HOF touches them (HOF lambdas re-evaluate referenced
    expression subtrees per element — binding keeps this O(text), not
    O(text·words)); symbol counts are length-difference arithmetic, no
    regex backtracking. Zero shuffle — runs at scan speed at 100 TB.

    Adds per-rule metrics (n_words, mean_word_len, symbol_word_ratio,
    bullet_line_frac, ellipsis_line_frac, alpha_word_frac, n_stop_hits)
    and ``keep``; NULL text yields zeroed metrics and keep=false.
    """
    text = F.col(text_col)
    out = docs.withColumn(
        "_words",
        F.filter(
            F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"),
            lambda w: w != F.lit(""),
        ),
    ).withColumn("_lines", F.split(F.coalesce(text, F.lit("")), r"\n"))
    nw = F.size("_words").cast("int")
    nl = F.size("_lines")
    d = lambda c: c.cast("double")  # noqa: E731
    mean_wl = F.when(
        nw > 0,
        d(F.aggregate("_words", F.lit(0), lambda acc, w: acc + F.length(w)))
        / d(nw),
    ).otherwise(F.lit(0.0))
    raw = F.coalesce(text, F.lit(""))
    n_hash = F.length(raw) - F.length(F.replace(raw, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(raw) - F.length(F.replace(raw, F.lit("..."), F.lit("")))
    ) / 3
    sym_ratio = F.when(
        nw > 0, (d(n_hash) + d(n_ellipsis)) / d(nw)
    ).otherwise(F.lit(0.0))
    bullet_frac = F.when(
        nl > 0,
        d(
            F.size(
                F.filter(
                    "_lines", lambda ln: F.ltrim(ln).rlike(r"^[•\-\*]")
                )
            )
        )
        / d(nl),
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        nl > 0,
        d(F.size(F.filter("_lines", lambda ln: F.rtrim(ln).endswith("..."))))
        / d(nl),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        nw > 0,
        d(F.size(F.filter("_words", lambda w: w.rlike("[a-zA-Z]")))) / d(nw),
    ).otherwise(F.lit(0.0))
    out = out.withColumn(
        "_words_lc", F.transform("_words", F.lower)
    ).withColumn(
        "n_stop_hits",
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in GOPHER_STOP_WORDS]),
                lambda s: F.array_contains(F.col("_words_lc"), s),
            )
        ).cast("int"),
    )
    out = (
        out.withColumn("n_words", nw)
        .withColumn("mean_word_len", F.round(mean_wl, 6))
        .withColumn("symbol_word_ratio", F.round(sym_ratio, 6))
        .withColumn("bullet_line_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_line_frac", F.round(ellipsis_frac, 6))
        .withColumn("alpha_word_frac", F.round(alpha_frac, 6))
        .drop("_words", "_lines", "_words_lc")
    )
    keep = (
        text.isNotNull()
        & F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_stop_hits") >= min_stop_words)
    )
    return out.withColumn("keep", keep)


def compression_ratio_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_ratio: float = 1.2,
    max_ratio: float = 12.0,
    level: int = 6,
) -> DataFrame:
    """Compression-ratio quality heuristic (the RefinedWeb / FineWeb
    family's repetition proxy): ``len(utf8) / len(zlib(utf8))``. Very
    compressible text (ratio above ``max_ratio``) is boilerplate or
    generated repetition; near-incompressible text (below
    ``min_ratio``) is usually binary junk or high-entropy noise.

    Unlike the per-pattern Gopher counters this signal is holistic —
    one number catches repetition the n-gram rules miss — at the cost
    of leaving Catalyst: the deflate pass is an Arrow-batched
    ``pandas_udf`` (zlib is stdlib, level fixed for determinism).
    Zero shuffle: the filter fuses into whatever scan feeds it, so at
    100 TB it costs one compression pass over bytes the stage was
    already reading. Adds ``compression_ratio`` (double, rounded to 6)
    and ``keep`` (boolean; null text is dropped)."""
    import zlib

    @F.pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return round(len(raw) / len(zlib.compress(raw, level)), 6)

        return texts.map(one)

    out = docs.withColumn("compression_ratio", _ratio(F.col(text_col)))
    return out.withColumn(
        "keep",
        F.col("compression_ratio").isNotNull()
        & F.col("compression_ratio").between(min_ratio, max_ratio),
    )


def blocklist_filter(
    docs: DataFrame,
    terms,
    text_col: str = "text",
    max_literal_terms: int = 10_000,
) -> DataFrame:
    """C4-style token blocklist ("badwords") filter. ``terms`` is a
    Python list or a single-column DataFrame of lowercase terms; a doc
    is dropped when any whitespace token (lowercased) is listed. Adds
    ``n_blocklist_hits`` (count of DISTINCT listed terms present) and
    ``keep``.

    Two physical paths, chosen by blocklist size, both returning the
    same answer (pinned by tests):
    - ``<= max_literal_terms`` literals: the list compiles into the row
      expression (``array_intersect`` against a literal array) — zero
      shuffle, fuses into the scan like the other rule cascades.
    - larger lists / DataFrame input: tokens explode to DISTINCT
      ``(doc_id, token)`` rows and hash-join the term table (AQE
      broadcasts it when small) — one corpus-token shuffle, no O(n)
      literal expression in the plan.
    """
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    if not isinstance(terms, DataFrame):
        terms = [t.lower() for t in terms]
        if len(terms) <= max_literal_terms:
            hits = F.size(
                F.array_intersect(toks, F.array(*[F.lit(t) for t in terms]))
            )
            out = docs.withColumn(
                "n_blocklist_hits",
                F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(hits),
            )
            return out.withColumn("keep", F.col("n_blocklist_hits") == 0)
        spark = docs.sparkSession
        terms = spark.createDataFrame([(t,) for t in terms], "term string")
    term_df = terms.select(
        F.lower(F.col(terms.columns[0])).alias("term")
    ).distinct()
    id_cols = [c for c in docs.columns]
    hits = (
        docs.select("*", F.explode(toks).alias("term"))
        .join(term_df, "term")
        .groupBy(*id_cols)
        .agg(F.count(F.lit(1)).cast("int").alias("n_blocklist_hits"))
    )
    out = (
        docs.join(hits.select(*id_cols, "n_blocklist_hits"), id_cols, "left")
        .withColumn(
            "n_blocklist_hits",
            F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(
                F.coalesce("n_blocklist_hits", F.lit(0))
            ),
        )
    )
    return out.withColumn("keep", F.col("n_blocklist_hits") == 0)
