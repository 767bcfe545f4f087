"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_linkage_spark.operators.dedup import (
    exact_duplicates,
    hamming64,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_duplicates,
    word_ngrams,
)

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the QUICK brown fox, jumps over the lazy dog near the river bank"),  # exact after norm
    (3, "The quick brown fox jumps over the lazy cat near the river bank"),  # near-dup
    (4, "Completely different text about spark query engines and shuffles"),
    (5, "Another unrelated document mentioning databases and indexes only"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    got = exact_duplicates(_docs(spark)).collect()
    assert len(got) == 1
    assert got[0].keep_id == 1 and got[0].dup_ids == [2] and got[0].n_copies == 2


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    row = df.select(word_ngrams(F.col("t"), 3).alias("g")).first()
    assert set(row.g) == {"a b c", "b c d"}


def test_ngram_jaccard_pairs(spark):
    got = {
        (r.id_A, r.id_B)
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()
    }
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert all(p[0] < 4 and p[1] < 4 for p in got)


def test_minhash_near_duplicates(spark):
    got = {
        (r.id_A, r.id_B): r.jaccard
        for r in minhash_near_duplicates(
            _docs(spark), jaccard_threshold=0.6
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1.0  # identical after norm
    assert all(a < 4 and b < 4 for a, b in got)


def test_simhash_properties(spark):
    df = _docs(spark).withColumn("fp", simhash64(F.col("text")))
    fps = {r.doc_id: r.fp for r in df.collect()}
    assert fps[1] == fps[2]  # identical normalized text -> same fingerprint
    d13 = (
        spark.range(1)
        .select(hamming64(F.lit(fps[1]), F.lit(fps[3])).alias("h"))
        .first()
        .h
    )
    d14 = (
        spark.range(1)
        .select(hamming64(F.lit(fps[1]), F.lit(fps[4])).alias("h"))
        .first()
        .h
    )
    assert d13 < d14  # near-dup closer than unrelated


def test_simhash_near_duplicates(spark):
    got = {
        (r.id_A, r.id_B)
        for r in simhash_near_duplicates(_docs(spark), max_hamming=8).collect()
    }
    assert (1, 2) in got
    assert not any(4 in p or 5 in p for p in got)


def test_simhash_portable_fp_matches_semantics(spark):
    from record_linkage_spark.operators.dedup import (
        md5_60,
        simhash_portable_fp,
    )

    fp = simhash_portable_fp(_docs(spark))
    fps = {r.doc_id: r.fp for r in fp.collect()}
    # identical-after-normalization docs -> identical fingerprint
    assert fps[1] == fps[2]
    # 60-bit hash family: fingerprint never sets bits 60..63
    assert all(0 <= v < (1 << 60) for v in fps.values())
    # token hash itself stays inside the signed-long 60-bit window
    h = (
        spark.createDataFrame([("token",)], "t string")
        .select(md5_60("t").alias("h"))
        .first()
        .h
    )
    assert 0 <= h < (1 << 60)


def test_simhash_banded_equals_bruteforce_on_portable_fp(spark):
    """Pigeonhole recall guarantee: with max_hamming <= num_bands - 1 the
    banded join returns EXACTLY the brute-force Hamming<=h pair set."""
    from record_linkage_spark.operators.dedup import (
        simhash_near_duplicates,
        simhash_portable_fp,
    )

    docs = _docs(spark)
    fp = simhash_portable_fp(docs).localCheckpoint()
    got = {
        (r.id_A, r.id_B, r.hamming)
        for r in simhash_near_duplicates(
            docs, max_hamming=3, num_bands=4, fingerprints=fp
        ).collect()
    }
    a = fp.select(F.col("doc_id").alias("id_A"), F.col("fp").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_B"), F.col("fp").alias("fb"))
    brute = {
        (r.id_A, r.id_B, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("id_A") < F.col("id_B"))
        .withColumn("hamming", hamming64("fa", "fb"))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert got == brute
    assert (1, 2, 0) in got


def test_doc_fingerprint_portable(spark):
    from record_linkage_spark.operators.text_analysis import doc_fingerprint

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bank"),
            (2, "THE quick BROWN fox jumps over the lazy dog near the bank"),
            (3, "short text"),  # fewer tokens than the window -> one window
            (4, ""),  # no tokens -> NULL fingerprint
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", doc_fingerprint("text", portable=True).alias("fp")
        ).collect()
    }
    assert rows[1] == rows[2]  # case-insensitive tokenizer
    assert len(rows[1]) == 32 and all(c in "0123456789abcdef" for c in rows[1])
    assert rows[3] is not None and rows[4] is None
    # portable and production variants agree on null/equality structure
    prod = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", doc_fingerprint("text").alias("fp")
        ).collect()
    }
    assert prod[1] == prod[2] and prod[4] is None


def test_minhash_cross_duplicates(spark):
    """Asymmetric scan flags corpus docs near-duplicating reference docs;
    within-source pairs never surface."""
    from record_linkage_spark.operators.dedup import minhash_cross_duplicates

    corpus = _docs(spark)  # docs 1 and 2 are identical after norm
    reference = spark.createDataFrame(
        [
            (100, "the QUICK brown fox jumps over the lazy dog near the river bank"),
            (101, "nothing like anything in the corpus at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.corpus_id, r.reference_id)
        for r in minhash_cross_duplicates(
            corpus, reference, jaccard_threshold=1.0
        ).collect()
    }
    # corpus 1 and 2 both match reference 100 (identical normalized text);
    # the corpus-internal (1,2) duplicate pair must NOT appear
    assert got == {("1", "100"), ("2", "100")}


def test_span_overlap_pairs_planted_copy_and_boilerplate_cap(spark):
    """A doc sharing an 8-token paragraph pairs with its source; docs that
    share only corpus-wide boilerplate (posting list > max_postings) do
    not pair; unrelated docs do not pair."""
    from record_linkage_spark.operators.dedup import span_overlap_pairs

    para = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    boiler = "standard license header applies to this file verbatim"
    rows = [
        (1, f"{para} unique tail one two three four five six seven"),
        (2, f"totally different lead in words here now {para}"),
        (3, f"{boiler} alphaword only"),
        (4, f"{boiler} betaword only"),
        (5, "nothing in common with anything else at all whatsoever today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # 10-token para -> 3 distinct 8-token windows shared by docs 1 and 2
    got = {
        (r.id_A, r.id_B): r.shared_spans
        for r in span_overlap_pairs(docs, window=8, min_shared=2).collect()
    }
    assert got == {(1, 2): 3}
    # with the boilerplate cap lowered to 1 posting, nothing at all pairs
    # through the boiler spans (they sit in 2 docs > cap... cap=1 drops all
    # shared spans, so no pairs survive even between 3 and 4)
    none = span_overlap_pairs(docs, window=8, min_shared=1, max_postings=1).collect()
    assert none == []
    # 3 and 4 share only the boiler prefix: with the default cap they DO
    # pair (2 postings <= 64) — the cap is about corpus-wide templates
    got_all = {
        (r.id_A, r.id_B)
        for r in span_overlap_pairs(docs, window=8, min_shared=1).collect()
    }
    assert (3, 4) in got_all and (1, 2) in got_all and len(got_all) == 2


def test_span_overlap_pairs_portable_matches_default(spark):
    from record_linkage_spark.operators.dedup import span_overlap_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(i, f"doc {i} says {base} plus suffix {i}") for i in range(6)]
    rows.append((99, "entirely disjoint text with no shared windows present here at all"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = {
        (r.id_A, r.id_B, r.shared_spans)
        for r in span_overlap_pairs(docs, window=8, min_shared=2).collect()
    }
    b = {
        (r.id_A, r.id_B, r.shared_spans)
        for r in span_overlap_pairs(docs, window=8, min_shared=2, portable=True).collect()
    }
    assert a == b and len(a) == 15  # all C(6,2) pairs share the base spans


def _brute_jaccard_pairs(spark, docs, tau):
    """All-pairs token-set Jaccard >= tau (reference answer)."""
    from record_linkage_spark.operators.dedup import _norm_tokens

    base = docs.select(
        "doc_id", F.array_distinct(_norm_tokens(F.col("text"))).alias("toks")
    ).filter(F.size("toks") > 0)
    a = base.select(F.col("doc_id").alias("id_A"), F.col("toks").alias("tA"))
    b = base.select(F.col("doc_id").alias("id_B"), F.col("toks").alias("tB"))
    return {
        (r.id_A, r.id_B): round(r.j, 9)
        for r in (
            a.crossJoin(b)
            .filter(F.col("id_A") < F.col("id_B"))
            .withColumn("i", F.size(F.array_intersect("tA", "tB")))
            .withColumn(
                "j",
                F.col("i")
                / (F.size("tA") + F.size("tB") - F.col("i")).cast("double"),
            )
            .filter(F.col("j") >= tau)
            .select("id_A", "id_B", "j")
            .collect()
        )
    }


def test_set_similarity_pairs_equals_brute_force(spark):
    """Guaranteed recall: the prefix-filtered join returns EXACTLY the
    brute-force answer at several thresholds (incl. tau values whose
    ceil() sits near float-rounding boundaries)."""
    from record_linkage_spark.operators.dedup import set_similarity_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for tau in (0.5, 0.6, 0.7, 0.8, 1.0):
        got = {
            (r.id_A, r.id_B): round(r.jaccard, 9)
            for r in set_similarity_pairs(docs, threshold=tau).collect()
        }
        want = _brute_jaccard_pairs(spark, docs, tau)
        assert got == want, f"tau={tau}: {len(got)} vs {len(want)}"


def test_set_similarity_pairs_catches_what_prefix_blocking_misses(spark):
    """Two docs sharing 90% of tokens but DIFFERENT opening words: the
    positional-prefix heuristic (ngram_jaccard_pairs' blocker) cannot
    pair them; the frequency-ordered prefix filter must."""
    from record_linkage_spark.operators.dedup import set_similarity_pairs

    body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"first opening {body}"),
        (2, f"second start {body}"),
        (3, "unrelated content entirely disjoint from the others here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_A, r.id_B)
        for r in set_similarity_pairs(docs, threshold=0.7).collect()
    }
    assert got == {(1, 2)}  # J = 10/14 ≈ 0.714


def test_set_similarity_pairs_plan_shape(spark):
    """No cartesian anywhere; candidate generation is equality joins on
    prefix tokens; the df-annotation join carries only (doc_id, n,
    token) rows."""
    from record_linkage_spark.operators.dedup import set_similarity_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        set_similarity_pairs(docs, threshold=0.7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_set_similarity_pairs_random_corpora_awkward_taus(spark):
    """Seeded random corpora over a tiny vocabulary (dense overlaps,
    repeated tokens, single-token docs, planted exact dups) at
    thresholds whose tau*n products land on ceil() boundaries — the
    prefix/alpha float guards must never cost a pair."""
    import numpy as np

    from record_linkage_spark.operators.dedup import set_similarity_pairs

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(80):
        k = int(rng.integers(1, 12))
        rows.append((i, " ".join(rng.choice(vocab, size=k, replace=True))))
    rows += [(100, rows[0][1]), (101, "w0"), (102, "w0")]  # dups + singles
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for tau in (1.0 / 3.0, 0.5, 2.0 / 3.0, 0.75, 1.0):
        got = {
            (r.id_A, r.id_B): round(r.jaccard, 9)
            for r in set_similarity_pairs(docs, threshold=tau).collect()
        }
        want = _brute_jaccard_pairs(spark, docs, tau)
        assert got == want, f"tau={tau}: {len(got)} vs {len(want)}"
