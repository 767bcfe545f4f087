"""DSIR importance resampling: exact agreement with a pure-python
reference (portable hashing), target-likeness ordering, Gumbel-top-k
selection bias, and parallelism invariance."""

import hashlib
import math
import re
from collections import Counter

import pytest

from record_linkage_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
)

SCHEMA = "doc_id bigint, text string"
B = 64
ALPHA = 0.5

TARGET = [
    (101, "spark shuffles data across the cluster"),
    (102, "spark partitions data for the cluster"),
    (103, "the cluster runs spark jobs on data"),
]
RAW = [
    (1, "spark shuffles data across the cluster nodes"),   # target-like
    (2, "the cluster runs spark on partitioned data"),     # target-like
    (3, "grandma baked apple pies every sunday morning"),  # off-target
    (4, "the recipe calls for butter sugar and flour"),    # off-target
    (5, "spark data cluster"),                             # short, target-like
]


def _tok(s):
    s = re.sub(r"[^a-z\s]", " ", s.lower())
    return [t for t in s.split() if t]


def _feats(text):
    toks = _tok(text)
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = Counter()
    for g in grams:
        h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B
        out[h] += 1
    return out


def _logprobs(rows):
    agg = Counter()
    for _, text in rows:
        agg.update(_feats(text))
    tot = sum(agg.values())
    return {
        b: math.log((agg.get(b, 0) + ALPHA) / (tot + ALPHA * B))
        for b in range(B)
    }


def _ref_log_w(text, p_tgt, p_raw):
    f = _feats(text)
    return sum(c * (p_tgt[b] - p_raw[b]) for b, c in f.items())


def test_log_weights_match_python_reference(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    got = {
        r.doc_id: r.log_w
        for r in dsir_log_weights(
            raw, tgt, buckets=B, alpha=ALPHA, portable=True
        ).collect()
    }
    p_tgt = _logprobs(TARGET)
    p_raw = _logprobs(RAW)
    for rid, text in RAW:
        assert got[rid] == pytest.approx(
            _ref_log_w(text, p_tgt, p_raw), abs=1e-9
        ), rid


def test_target_like_docs_outweigh_off_target(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    w = {
        r.doc_id: r.log_w
        for r in dsir_log_weights(raw, tgt, buckets=B, portable=True).collect()
    }
    assert min(w[1], w[2]) > max(w[3], w[4])


def test_gumbel_topk_selects_target_like(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    sel = dsir_resample(raw, tgt, k=2, buckets=B, portable=True).collect()
    assert len(sel) == 2
    ids = {r.doc_id for r in sel}
    # the two off-target docs are orders of magnitude down-weighted; the
    # bounded Gumbel noise cannot rescue both
    assert not {3, 4} <= ids


def test_resample_deterministic_and_parallelism_invariant(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    a = sorted(
        (r.doc_id, round(r.gumbel_key, 9))
        for r in dsir_resample(
            raw.coalesce(1), tgt.coalesce(1), k=3, buckets=B, portable=True
        ).collect()
    )
    b = sorted(
        (r.doc_id, round(r.gumbel_key, 9))
        for r in dsir_resample(
            raw.repartition(7), tgt.repartition(5), k=3, buckets=B, portable=True
        ).collect()
    )
    assert a == b


def test_fast_hash_path_same_ordering(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    w = {
        r.doc_id: r.log_w
        for r in dsir_log_weights(raw, tgt, buckets=B, portable=False).collect()
    }
    assert min(w[1], w[2]) > max(w[3], w[4])
