"""Normalizer semantics ported from the reference's _clean_text/_clean_desc
(mediated_schema.py:80-125): lowercase, URL strip, non-alnum strip,
whitespace collapse, null-token canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_linkage_spark.functions.comparators import (
    exact_match,
    field_diff_count,
    gauss_sim,
)
from record_linkage_spark.functions.text import (
    norm_text,
    norm_text_with_urls,
    norm_tokens,
    null_canon,
    prefix_key,
    token_prefix,
)


def _one(spark, col, value, typ="string"):
    df = spark.createDataFrame([(value,)], f"c {typ}")
    return df.select(col.alias("v")).first().v


def test_norm_text(spark):
    assert _one(spark, norm_text(F.col("c")), "  Hello,   WORLD!! 42 ") == "hello world 42"
    assert _one(spark, norm_text(F.col("c")), "!!!") is None
    assert _one(spark, norm_text(F.col("c")), None) is None


def test_norm_text_with_urls(spark):
    got = _one(spark, norm_text_with_urls(F.col("c")), "see http://x.co/a?b=1 NOW; ok")
    assert got == "see now ok"
    got = _one(spark, norm_text_with_urls(F.col("c")), "foo-bar/baz")
    assert got == "foo bar baz"


def test_null_canon(spark):
    for tok in ["nan", "NaN", " None ", "", "<NA>", "n/a"]:
        assert _one(spark, null_canon(F.col("c")), tok) is None
    assert _one(spark, null_canon(F.col("c")), "real") == "real"


def test_norm_tokens_and_prefix(spark):
    df = spark.createDataFrame([("The Quick, brown FOX jumps",)], "c string")
    row = df.select(
        norm_tokens(F.col("c")).alias("toks"),
        token_prefix(norm_tokens(F.col("c")), 3).alias("pfx"),
        prefix_key(F.col("c"), 3).alias("p3"),
    ).first()
    assert row.toks == ["the", "quick", "brown", "fox", "jumps"]
    assert row.pfx == "the quick brown"
    assert row.p3 == "The"
    assert _one(spark, norm_tokens(F.col("c")), None) == []


def test_exact_match(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), (None, "a"), (None, None)], "x string, y string"
    )
    vals = [r.v for r in df.select(exact_match("x", "y").alias("v")).collect()]
    assert vals == [1.0, 0.0, 0.0, 0.0]


def test_gauss_sim(spark):
    import math

    df = spark.createDataFrame(
        [(0.0, 100.0), (0.0, 500.0), (0.0, 2500.0), (None, 1.0)], "x double, y double"
    )
    vals = [r.v for r in df.select(gauss_sim("x", "y", 500.0, 2000.0).alias("v")).collect()]
    assert vals[0] == 1.0 and vals[1] == 1.0
    assert abs(vals[2] - math.exp(-0.5 * 1.0)) < 1e-12
    assert vals[3] == 0.0


def test_field_diff_count(spark):
    df = spark.createDataFrame(
        [("a", "a", None, None, 1, 2)],
        "a1 string, b1 string, a2 string, b2 string, a3 int, b3 int",
    )
    # NaN==NaN semantics: null-vs-null counts as equal (ground_truth.py:118-119)
    v = df.select(
        field_diff_count([("a1", "b1"), ("a2", "b2"), ("a3", "b3")]).alias("v")
    ).first().v
    assert v == 1


def test_phonetic_key_truth_table(spark):
    from record_linkage_spark.functions.text import (
        phonetic_key,
        phonetic_name_key,
    )

    df = spark.createDataFrame(
        [
            ("Robert",), ("Rupert",), ("Smith",), ("Smyth",),
            ("Jones",), ("",), (None,),
        ],
        "s string",
    )
    got = {
        r.s: r.k
        for r in df.select("s", phonetic_key("s").alias("k")).collect()
    }
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got["Smith"] == got["Smyth"] == "S530"
    assert got["Jones"] == "J520" != got["Smith"]
    assert got[""] == "" and got[None] is None

    # multi-word field: key on the first (name-shaped) token
    df2 = spark.createDataFrame(
        [("Robert the builder",), ("Rupert T. Builder",)], "s string"
    )
    ks = [
        r.k for r in df2.select(phonetic_name_key("s").alias("k")).collect()
    ]
    assert ks[0] == ks[1] == "R163"


def test_phonetic_key_feeds_meta_blocking(spark):
    from pyspark.sql import functions as F

    from record_linkage_spark.functions.text import phonetic_name_key
    from record_linkage_spark.operators.blocking import meta_block_prune

    df = spark.createDataFrame(
        [
            (1, "Robert Smith", "london"),
            (2, "Rupert Smith", "london"),   # phonetic + city -> weight 2
            (3, "Robert Jones", "paris"),    # phonetic only -> weight 1
            (4, "Alice Wong", "london"),     # city only -> weight 1
        ],
        "doc_id bigint, name string, city string",
    )
    out = meta_block_prune(
        df,
        {"ph": phonetic_name_key("name"), "city": F.col("city")},
        min_shared=2,
    ).collect()
    assert {(r.id_A, r.id_B) for r in out} == {(1, 2)}
