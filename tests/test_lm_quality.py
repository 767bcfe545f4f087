"""CCNet-style bigram-LM perplexity scoring: exact agreement with a
pure-python reference, gibberish-vs-template separation, the reference-
corpus (in-domain) mode, the head-cut filter, and invariance."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.lm_quality import (
    lm_cross_entropy,
    perplexity_filter,
)

SCHEMA = "doc_id bigint, text string"
BOS = "\x02"

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the chair"),
    (3, "the dog sat on the mat"),
    (4, "the cat lay on the mat"),
    (5, "zq xv qqj wkp zzv"),        # gibberish: no repeated bigrams
    (6, "mat the on sat cat the"),   # right words, wrong order
    (7, ""),                         # tokenless -> NULL score
]


def _tok(s):
    import re

    s = re.sub(r"[^a-z\s]", " ", s.lower())
    return [t for t in s.split() if t]


def _ref_scores(rows, alpha=0.1):
    bgs = {}
    for rid, text in rows:
        toks = [BOS] + _tok(text)
        bgs[rid] = list(zip(toks, toks[1:]))
    all_bg = [g for v in bgs.values() for g in v]
    c2 = Counter(all_bg)
    c1 = Counter(w1 for w1, _ in all_bg)
    v = len({w2 for _, w2 in all_bg}) + 1
    out = {}
    for rid, gs in bgs.items():
        if not gs:
            out[rid] = None
            continue
        h = -sum(
            math.log2((c2[g] + alpha) / (c1[g[0]] + alpha * v)) for g in gs
        ) / len(gs)
        out[rid] = h
    return out


def test_matches_python_reference_exactly(spark):
    docs = spark.createDataFrame(CORPUS, SCHEMA)
    got = {
        r.doc_id: r.cross_entropy for r in lm_cross_entropy(docs).collect()
    }
    ref = _ref_scores(CORPUS)
    assert 7 not in got  # tokenless doc has no score row
    for rid, h in ref.items():
        if h is not None:
            assert got[rid] == pytest.approx(h, abs=1e-9), rid


def test_gibberish_and_shuffled_score_higher_than_template(spark):
    docs = spark.createDataFrame(CORPUS, SCHEMA)
    h = {r.doc_id: r.cross_entropy for r in lm_cross_entropy(docs).collect()}
    assert h[5] > h[1] and h[5] > h[2]   # gibberish worst
    assert h[6] > h[1]                   # word order matters to a bigram LM


def test_reference_corpus_mode_scores_out_of_domain_higher(spark):
    lm = spark.createDataFrame([r for r in CORPUS if r[0] <= 4], SCHEMA)
    cand = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "purple quantum sandwiches dance")],
        SCHEMA,
    )
    h = {
        r.doc_id: r.cross_entropy
        for r in lm_cross_entropy(cand, lm_docs=lm).collect()
    }
    assert h[11] > h[10] + 1.0


def test_perplexity_filter_head_cut_keeps_short_docs(spark):
    docs = spark.createDataFrame(CORPUS, SCHEMA)
    kept = {r.doc_id for r in perplexity_filter(docs, keep_quantile=0.6).collect()}
    assert 5 not in kept           # gibberish tail is cut
    assert 7 in kept               # unscorable doc passes through
    assert {1, 2, 3} <= kept       # template head survives


def test_parallelism_invariance(spark):
    docs = spark.createDataFrame(CORPUS, SCHEMA)
    a = {
        r.doc_id: round(r.cross_entropy, 12)
        for r in lm_cross_entropy(docs.coalesce(1)).collect()
    }
    b = {
        r.doc_id: round(r.cross_entropy, 12)
        for r in lm_cross_entropy(docs.repartition(7)).collect()
    }
    assert a == b
