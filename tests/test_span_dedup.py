"""remove_duplicate_spans: span-granular removal semantics — keep-first
survivor, within-doc repetition, no false removals, partitioning
invariance, and agreement with a pure-python reference implementation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.dedup import remove_duplicate_spans

# tokens are single letters so fixtures are easy to read; the _tokens
# normalizer lowercases and strips non-letters
PARA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens


def _py_reference(docs: list[tuple], window: int, keep_first: bool):
    """Driver-side replay of the documented semantics."""
    toks = {i: t.lower().split() for i, t in docs}
    occ = []  # (doc, pos0, span)
    for i, tt in sorted(toks.items()):
        for p in range(len(tt) - window + 1):
            occ.append((i, p, " ".join(tt[p : p + window])))
    from collections import Counter

    counts = Counter(s for _, _, s in occ)
    removals: dict[int, list[int]] = {i: [] for i, _ in docs}
    seen: set[str] = set()
    for i, p, s in sorted(occ):  # global (doc, pos) order
        if counts[s] >= 2:
            if keep_first and s not in seen:
                seen.add(s)
            else:
                removals[i].append(p)
    out = {}
    for i, tt in toks.items():
        drop = set()
        for p in removals[i]:
            drop.update(range(p, p + window))
        kept = [t for j, t in enumerate(tt) if j not in drop]
        out[i] = (" ".join(kept), len(tt), len(kept), len(removals[i]))
    return out


def _run(spark, docs, window=8, keep_first=True):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_kept_tokens, r.n_removed_spans)
        for r in remove_duplicate_spans(
            df, window=window, keep_first=keep_first
        ).collect()
    }
    return got


def test_copied_paragraph_removed_from_later_doc_only(spark):
    docs = [
        (1, f"one two three {PARA} four five six"),
        (2, f"seven eight nine ten {PARA} eleven twelve"),
        (3, "completely unique content with no overlap whatsoever at all here now"),
    ]
    got = _run(spark, docs, window=8)
    assert got == _py_reference(docs, 8, True)
    # doc 1 (globally first) keeps the paragraph; doc 2 loses exactly it
    assert PARA in got[1][0]
    assert PARA not in got[2][0]
    for w in PARA.split():
        assert w not in got[2][0].split()
    # doc 2's own context survives (boundary-crossing spans not duplicated)
    assert got[2][0].startswith("seven eight nine ten")
    assert got[2][0].endswith("eleven twelve")
    # untouched doc is identical to its normalized tokens
    assert got[3][0] == docs[2][1]
    assert got[3][3] == 0


def test_within_doc_repetition_keeps_first_occurrence(spark):
    phrase = "a b c d e f g h"
    docs = [(1, f"{phrase} filler tokens in the middle {phrase}")]
    got = _run(spark, docs, window=8)
    assert got == _py_reference(docs, 8, True)
    text = got[1][0]
    assert text.startswith(phrase)
    assert text.count("a b c d e f g h") == 1


def test_keep_first_false_removes_every_occurrence(spark):
    docs = [
        (1, f"one two three {PARA} four five six"),
        (2, f"seven eight nine ten {PARA} eleven twelve"),
    ]
    got = _run(spark, docs, window=8, keep_first=False)
    assert got == _py_reference(docs, 8, False)
    for i in (1, 2):
        for w in PARA.split():
            assert w not in got[i][0].split()


def test_short_docs_pass_through(spark):
    docs = [(1, "too short"), (2, "too short")]  # < window tokens
    got = _run(spark, docs, window=8)
    assert got[1] == ("too short", 2, 2, 0)
    assert got[2] == ("too short", 2, 2, 0)


def test_portable_variant_matches_default(spark):
    docs = [
        (1, f"one two three {PARA} four five six"),
        (2, f"seven eight nine ten {PARA} eleven twelve"),
        (3, "totally different words that appear nowhere else in the corpus"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, remove_duplicate_spans(df, window=8).collect()))
    b = sorted(
        map(tuple, remove_duplicate_spans(df, window=8, portable=True).collect())
    )
    assert a == b


def test_partitioning_invariance(spark):
    docs = [
        (i, f"prefix {i} {PARA} suffix tail words here now again more") for i in range(9)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, remove_duplicate_spans(df.repartition(1), window=8).collect()))
    b = sorted(
        map(
            tuple,
            remove_duplicate_spans(
                df.repartition(5, F.col("doc_id")), window=8
            ).collect(),
        )
    )
    assert a == b
    # every doc shares the paragraph; only doc 0 keeps it
    by_id = {t[0]: t for t in a}
    assert PARA in by_id[0][1]
    assert all(PARA not in by_id[i][1] for i in range(1, 9))
