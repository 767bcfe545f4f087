"""Text analysis: language ID heuristic, token counters, quality score,
fingerprint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.text_analysis import (
    doc_fingerprint,
    language_id,
    quality_features,
    token_count_bpe_ish,
    token_count_ws,
)


def test_language_id(spark):
    rows = [
        ("the cat and the dog went to the market in the morning",),
        ("der Hund und die Katze sind nicht in das Haus gegangen",),
        ("le chat est dans la maison pour les vacances",),
        ("zzz qqq xxx",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r.lang for r in df.select(language_id("text").alias("lang")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! It's 42 degrees.",), ("", ), (None,)], "text string")
    rows = df.select(
        token_count_ws("text").alias("ws"), token_count_bpe_ish("text").alias("bpe")
    ).collect()
    assert rows[0].ws == 5
    # pieces: Hello , world ! It ' s 42 degrees .  -> 10
    assert rows[0].bpe == 10
    assert rows[1].ws == 0 and rows[2].ws == 0


def test_quality_features(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog and runs far away."),
            (2, "!!! ??? ... ;;;"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_features(df).collect()}
    assert rows[1].q_score > rows[2].q_score
    assert rows[1].q_stopword_ratio > 0
    assert rows[2].q_alpha_ratio == 0.0
    assert 0.0 <= rows[1].q_score <= 1.0


def test_doc_fingerprint(spark):
    df = spark.createDataFrame(
        [
            ("one two three four five six seven eight nine ten",),
            ("one two three four five six seven eight nine ten",),
            ("totally different words compose this other document here now",),
            (None,),
        ],
        "text string",
    )
    rows = [r.fp for r in df.select(doc_fingerprint("text").alias("fp")).collect()]
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
    assert rows[3] is None


def test_top_idf_tokens(spark):
    from record_linkage_spark.operators.text_analysis import top_idf_tokens

    docs = spark.createDataFrame(
        [
            (1, "common common rare unique"),
            (2, "common rare other"),
            (3, "common filler words"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.top_tokens for r in top_idf_tokens(docs, k=2).collect()}
    # 'common' appears in all docs (idf 0) -> never in top-2 when rarer
    # tokens exist
    assert "unique" in out[1] and "common" not in out[1]
    assert "common" not in out[2]


def test_serialize_record(spark):
    from pyspark.sql import functions as F

    from record_linkage_spark.functions.text import serialize_pair, serialize_record

    df = spark.createDataFrame(
        [("n1", "seg", 5), ("n2", None, 7)],
        "name string, seg string, k int",
    )
    ser = serialize_record([("name", "name"), ("seg", "seg"), ("k", "k")])
    rows = df.select(ser.alias("s")).collect()
    assert rows[0].s == "COL name VAL n1 COL seg VAL seg COL k VAL 5"
    # null field skipped entirely (ditto_format.py:55-74 semantics)
    assert rows[1].s == "COL name VAL n2 COL k VAL 7"

    pair = df.select(
        serialize_pair(ser, ser, F.lit(1)).alias("p")
    ).collect()[0].p
    assert pair.count("\t") == 2 and pair.endswith("\t1")


def test_tfidf_cosine_pairs_matches_numpy_reference(spark):
    """tf * ln(N/df) weights, norms, shared-token dot — checked against
    a hand-rolled reference; identical docs cos 1, disjoint 0, and a
    tokenless doc's pairs surface with 0 (never dropped)."""
    import math
    from collections import Counter

    from record_linkage_spark.operators.text_analysis import tfidf_cosine_pairs

    corpus = {
        1: "apple banana apple",
        2: "apple banana cherry",
        3: "dog elephant fox",
        4: "apple banana apple",
        5: None,
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)], "id_A long, id_B long"
    )
    got = {
        (r.id_A, r.id_B): r.tfidf_cosine
        for r in tfidf_cosine_pairs(pairs, docs).collect()
    }

    tfs = {d: Counter((t or "").split()) for d, t in corpus.items()}
    dfc = Counter(tok for c in tfs.values() for tok in c)
    n = len(corpus)

    def vec(d):
        return {t: c * math.log(n / dfc[t]) for t, c in tfs[d].items()}

    def ref(a, b):
        va, vb = vec(a), vec(b)
        dot = sum(va[t] * vb.get(t, 0.0) for t in va)
        na = math.sqrt(sum(v * v for v in va.values()))
        nb = math.sqrt(sum(v * v for v in vb.values()))
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    assert set(got) == {(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)}
    for k, v in got.items():
        assert v == pytest.approx(ref(*k), abs=1e-9), k
    assert got[(1, 4)] == pytest.approx(1.0)
    assert got[(1, 3)] == 0.0 and got[(1, 5)] == 0.0
