"""SoftTFIDF comparator (Cohen, Ravikumar & Fienberg 2003): kernel
semantics, agreement with TF-IDF cosine when every match is exact, typo
tolerance where cosine collapses, and partitioning invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.functions.similarity import soft_tfidf_np
from record_linkage_spark.operators.text_analysis import (
    soft_tfidf_pairs,
    tfidf_cosine_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


CORPUS = [
    (1, "alpha consolidated freight services"),
    (2, "alpha consolidated freight services"),          # exact dup of 1
    (3, "alpha consolidatted freight servces"),          # typo'd dup of 1
    (4, "zenith quantum robotics"),
    (5, "zenith quantum robotics holdings"),
    (6, "unrelated maritime insurance brokerage"),
    (7, "freight forwarding alpha division"),
    (8, "quantum zenith robotics"),                      # reordered 4
]


def test_identical_docs_score_one(spark):
    docs = _docs(spark, CORPUS)
    pairs = spark.createDataFrame([(1, 2)], "id_A bigint, id_B bigint")
    row = soft_tfidf_pairs(pairs, docs).collect()[0]
    assert row.soft_tfidf == pytest.approx(1.0, abs=1e-9)
    assert row.st_ab == pytest.approx(row.st_ba, abs=1e-9)


def test_equals_tfidf_cosine_when_all_matches_exact(spark):
    """When every contributing best-match is an exact token (jw == 1) and
    cross-token JW never clears theta, SoftTFIDF degenerates to the
    TF-IDF cosine — pin the two operators to each other."""
    docs = _docs(spark, CORPUS)
    pairs = spark.createDataFrame(
        [(4, 5), (1, 7), (4, 6)], "id_A bigint, id_B bigint"
    )
    st = {
        (r.id_A, r.id_B): r.soft_tfidf
        for r in soft_tfidf_pairs(pairs, docs, theta=0.95).collect()
    }
    cos = {
        (r.id_A, r.id_B): r.tfidf_cosine
        for r in tfidf_cosine_pairs(pairs, docs).collect()
    }
    for k in cos:
        assert st[k] == pytest.approx(cos[k], abs=1e-9), k


def test_typo_tolerance_beats_cosine(spark):
    """The typo'd near-dup (3) shares only two exact tokens with (1);
    SoftTFIDF recovers the two typo'd tokens via JW and must land far
    above the cosine, near the exact-dup score."""
    docs = _docs(spark, CORPUS)
    pairs = spark.createDataFrame([(1, 3)], "id_A bigint, id_B bigint")
    st = soft_tfidf_pairs(pairs, docs).collect()[0].soft_tfidf
    cos = tfidf_cosine_pairs(pairs, docs).collect()[0].tfidf_cosine
    assert st > cos + 0.2
    assert st > 0.9


def test_reordering_invariance(spark):
    """Token order never enters (bag semantics): 4 vs 8 is a pure
    reorder and must score 1.0 — wait, 4 and 8 have identical token SETS
    but tf-identical bags too, so both directions are exact."""
    docs = _docs(spark, CORPUS)
    pairs = spark.createDataFrame([(4, 8)], "id_A bigint, id_B bigint")
    row = soft_tfidf_pairs(pairs, docs).collect()[0]
    assert row.soft_tfidf == pytest.approx(1.0, abs=1e-9)


def test_tokenless_side_scores_zero(spark):
    docs = _docs(spark, CORPUS + [(99, "12345 !!!")])  # normalizes to empty
    pairs = spark.createDataFrame([(1, 99)], "id_A bigint, id_B bigint")
    row = soft_tfidf_pairs(pairs, docs).collect()[0]
    assert row.soft_tfidf == 0.0 and row.st_ab == 0.0 and row.st_ba == 0.0


def test_partitioning_invariance(spark):
    docs = _docs(spark, CORPUS)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (4, 8), (1, 6)], "id_A bigint, id_B bigint"
    )
    a = {
        (r.id_A, r.id_B): (r.st_ab, r.st_ba)
        for r in soft_tfidf_pairs(pairs.coalesce(1), docs.coalesce(1)).collect()
    }
    b = {
        (r.id_A, r.id_B): (r.st_ab, r.st_ba)
        for r in soft_tfidf_pairs(
            pairs.repartition(7), docs.repartition(5)
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12), k


def test_kernel_hand_computed():
    """Two tokens each, one exact match, one typo above theta: hand-roll
    the expected sum."""
    from record_linkage_spark.functions.similarity import jaro_winkler_np

    ta = [["acme", "freight"]]
    tb = [["acmee", "freight"]]
    va = [[0.6, 0.8]]
    vb = [[0.5, 0.87]]
    jw = jaro_winkler_np(["acme"], ["acmee"])[0]
    assert jw > 0.9
    ab, ba = soft_tfidf_np(ta, va, tb, vb, theta=0.9)
    assert ab[0] == pytest.approx(0.6 * 0.5 * jw + 0.8 * 0.87 * 1.0, abs=1e-12)
    assert ba[0] == pytest.approx(0.5 * 0.6 * jw + 0.87 * 0.8 * 1.0, abs=1e-12)
    # below theta nothing contributes
    ab2, _ = soft_tfidf_np([["acme"]], [[1.0]], [["zzzz"]], [[1.0]], theta=0.9)
    assert ab2[0] == 0.0
    # empty / null sides
    ab3, ba3 = soft_tfidf_np([[], None], [[], None], [["x"], ["y"]], [[1.0], [1.0]])
    assert np.all(ab3 == 0.0) and np.all(ba3 == 0.0)
