"""Distributed byte-pair-encoding (BPE) tokenizer training and encoding.

Implements the subword-merge algorithm of Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units" (ACL
2016), Spark-first. This is a capability layer beyond the reference
engine (which only counts regex word pieces — see
``text_analysis.token_count_bpe_ish``): a 100 TB training-data pipeline
needs the *real* tokenizer loop to budget corpora in model tokens and
to train domain vocabularies.

Scale decomposition — the part that is O(corpus) and the part that is
O(vocabulary) are different jobs:

1. ``word_frequencies`` is the only pass over the corpus: one
   whitespace tokenize + ``groupBy(word)`` shuffle. Its output is the
   distinct-word frequency table, which is tiny relative to the corpus
   (Heaps' law: ~millions of rows for terabytes of text).
2. ``train_bpe`` runs the merge loop over that word table. When the
   table fits the driver budget (``max_driver_words``, a hard row
   bound checked BEFORE collecting) it uses the classic in-memory
   incremental-count loop — this is how production BPE trainers work:
   the big-data stage is the corpus scan, not the merge loop. Above
   the budget it falls back to a fully distributed loop: one
   pair-count aggregation + one higher-order-function merge per round
   over the word table (never the corpus), with a ``localCheckpoint``
   every few rounds to bound lineage. Both paths produce the same
   merge sequence under the same deterministic tie-break
   (count DESC, then pair lexicographic ASC) — pinned by tests.
3. ``encode_bpe`` applies a trained merge list corpus-wide as one
   Arrow-batched ``pandas_udf`` with a per-batch word cache (Zipf:
   most tokens are repeats, so each distinct word is encoded once per
   batch). No shuffle at all — encoding is embarrassingly parallel.

End-of-word is modelled as the explicit symbol ``</w>`` appended to
every word's character sequence (the paper's formulation), so merges
distinguish suffixes from in-word pairs.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"

# Rows the driver-side merge loop may collect. The word table for even
# very large corpora is a few million distinct words; this cap makes
# the collect a deliberate, bounded choice rather than an accident.
MAX_DRIVER_WORDS = 2_000_000


def word_frequencies(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """The single O(corpus) pass: whitespace-tokenize ``text_col`` and
    return the distinct-word frequency table ``(w, n)``. One explode +
    one ``groupBy(w)`` shuffle with map-side partial aggregation; the
    output is O(vocabulary), not O(corpus)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(t, r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """Word table -> ``(w, n, symbols)`` where ``symbols`` is the
    character sequence plus the ``</w>`` end-of-word marker."""
    return words.withColumn(
        "symbols",
        F.concat(
            F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
            F.array(F.lit(EOW)),
        ),
    )


def bpe_pair_counts(syms: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol pair counts ``(a, b, n)``
    over a ``(n, symbols)`` table. Overlapping occurrences count, as in
    the original algorithm (``zip(word, word[1:])``). One explode +
    one groupBy over the word table — never touches the corpus."""
    pairs = F.expr(
        "if(size(symbols) < 2, array(), "
        "transform(sequence(1, size(symbols) - 1), "
        "i -> struct(element_at(symbols, i) AS a, "
        "element_at(symbols, i + 1) AS b)))"
    )
    return (
        syms.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("n"))
    )


def _apply_merge_col(symbols: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with the merged symbol, as a single codegen'd ``aggregate`` fold —
    no Python in the distributed merge step. ``try_element_at`` guards
    the empty accumulator under Spark 4 ANSI mode."""
    merged = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _apply_merge(syms: tuple, a: str, b: str, merged: str) -> tuple:
    """Driver-path twin of :func:`_apply_merge_col`: left-to-right
    non-overlapping merge of adjacent (a, b)."""
    out = []
    i = 0
    m = len(syms)
    while i < m:
        if i + 1 < m and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _train_driver(
    word_counts: dict, num_merges: int, min_count: int
) -> list:
    """Classic incremental-count merge loop over the collected word
    table. Per merge, only words containing the merged pair are
    re-segmented and only their pair counts are adjusted — O(affected
    words), not O(vocabulary), per round."""
    vocab = {w: tuple(w) + (EOW,) for w in word_counts}
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, syms in vocab.items():
        n = word_counts[w]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += n
            pair_words[p].add(w)
    merges = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_count:
            break
        merges.append((a, b))
        merged = a + b
        for w in list(pair_words[(a, b)]):
            syms = vocab[w]
            n = word_counts[w]
            new = _apply_merge(syms, a, b, merged)
            delta: Counter = Counter()
            for p in zip(syms, syms[1:]):
                delta[p] -= n
            for p in zip(new, new[1:]):
                delta[p] += n
            for p, d in delta.items():
                if d == 0:
                    continue
                pair_counts[p] += d
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
                if d > 0:
                    pair_words[p].add(w)
            new_pairs = set(zip(new, new[1:]))
            for p in set(zip(syms, syms[1:])) - new_pairs:
                pair_words[p].discard(w)
            vocab[w] = new
    return merges


def _train_distributed(
    words: DataFrame, num_merges: int, min_count: int
) -> list:
    """Fully distributed merge loop for word tables past the driver
    budget: per round, one pair-count aggregation (collecting exactly
    ONE row — the argmax pair) and one higher-order-function merge map
    over the word table. ``localCheckpoint`` every 8 rounds bounds the
    lineage the per-round fold would otherwise stack up."""
    syms = initial_symbols(words).select("n", "symbols").localCheckpoint()
    merges: list = []
    for r in range(num_merges):
        best = (
            bpe_pair_counts(syms)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        syms = syms.withColumn(
            "symbols", _apply_merge_col(F.col("symbols"), a, b)
        )
        if (r + 1) % 8 == 0:
            syms = syms.localCheckpoint()
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 2,
    lowercase: bool = True,
    max_driver_words: int = MAX_DRIVER_WORDS,
) -> list:
    """Train a BPE merge list on a corpus. Returns ``[(a, b), ...]``
    in merge order. Tie-break is deterministic: count DESC, then pair
    lexicographic ASC — both paths, pinned by tests. The corpus is
    scanned exactly once (``word_frequencies``); the merge loop runs on
    the word table, driver-side when it fits ``max_driver_words``
    (checked before any collect), distributed otherwise."""
    words = word_frequencies(docs, text_col=text_col, lowercase=lowercase)
    if words.count() <= max_driver_words:
        wc = {r["w"]: r["n"] for r in words.collect()}
        return _train_driver(wc, num_merges, min_count)
    return _train_distributed(words, num_merges, min_count)


def encode_bpe(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: per word,
    iteratively merge the present pair with the LOWEST merge rank
    (equivalent to replaying merges in training order, since each
    merged symbol only exists after its rank). Arrow-batched
    ``pandas_udf`` with a per-batch word cache; the ranks dict rides
    the serialized closure (bounded by ``len(merges)``). Zero shuffle."""
    import re as _re

    ranks = {p: i for i, p in enumerate(merges)}
    # ASCII \s to match Spark's Java regex semantics in word_frequencies
    # (Python's \s is Unicode-wide by default; Java's is ASCII-only)
    ws = _re.compile(r"\s+", _re.ASCII)

    def _enc_word(w: str, cache: dict) -> list:
        hit = cache.get(w)
        if hit is not None:
            return hit
        syms = list(w) + [EOW]
        while len(syms) > 1:
            best = None
            best_rank = None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = p, r
            if best is None:
                break
            syms = list(_apply_merge(tuple(syms), best[0], best[1],
                                     best[0] + best[1]))
        cache[w] = syms
        return syms

    @F.pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def one(t):
            if t is None:
                return None
            if lowercase:
                t = t.lower()
            out = []
            for w in ws.split(t):
                if w:
                    out.extend(_enc_word(w, cache))
            return out

        return texts.map(one)

    return df.withColumn(out_col, _enc(F.col(text_col)))
