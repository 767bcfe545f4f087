"""Curation operators: PII scrubbing, repetition signals, decontamination."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from record_linkage_spark.operators.curation import (
    decontaminate,
    repetition_features,
    scrub_pii,
)


def test_scrub_pii_all_patterns_and_order(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x.co.uk now"),
            (2, "ssn 123-45-6789 end"),  # must become <ID>, not <PHONE>
            (3, "call +1(555)123-4567 ok"),
            (4, "ip 192.168.0.1 here"),
            (5, "clean text stays clean"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.s
        for r in df.select("doc_id", scrub_pii("text").alias("s")).collect()
    }
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "ssn <ID> end"
    assert got[3] == "call <PHONE> ok"
    assert got[4] == "ip <IP> here"
    assert got[5] == "clean text stays clean"
    assert got[6] is None


def test_repetition_features_truth_table(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # one type, 4 tokens
            (2, "a b c d"),          # all distinct
            (3, "x. x. y."),         # 3 segments, 2 distinct
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert got[1].n_tokens == 4
    assert abs(got[1].dup_token_frac - 0.75) < 1e-9
    assert abs(got[1].top_token_frac - 1.0) < 1e-9
    assert abs(got[2].dup_token_frac - 0.0) < 1e-9
    assert abs(got[2].top_token_frac - 0.25) < 1e-9
    assert abs(got[3].dup_line_frac - (1.0 - 2.0 / 3.0)) < 1e-6


def test_decontaminate_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7 t8 tail here"),   # shares the 8-gram
            (2, "u1 u2 u3 u4 u5 u6 u7 u8 other stuff"),  # disjoint
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("prefix t1 t2 t3 t4 t5 t6 t7 t8",)], "text string"
    )
    got = {r.doc_id: r.n_shared_grams for r in decontaminate(corpus, bench).collect()}
    assert got == {1: 1}
    # broadcast hint present on the benchmark side of the join
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_decontaminate_counts_distinct_shared_grams(spark):
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # grams: w1..w8, w2..w9
    corpus = spark.createDataFrame([(7, text)], "doc_id long, text string")
    bench = spark.createDataFrame([(text,)], "text string")
    got = decontaminate(corpus, bench).collect()
    assert len(got) == 1 and got[0].n_shared_grams == 2


def test_stratified_quota_sample_two_stage_equals_exact(spark):
    """The hash pre-filter must not change the selected sample (it keeps
    the smallest hash values — the rank order) and results must be
    identical across partitionings."""
    from record_linkage_spark.operators.curation import stratified_quota_sample

    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("stratum"),
    )
    kw = dict(strata_cols=["stratum"], quota=7, id_col="doc_id")
    exact = {
        (r.doc_id, r.stratum)
        for r in stratified_quota_sample(df, margin=None, **kw).collect()
    }
    two_stage = {
        (r.doc_id, r.stratum)
        for r in stratified_quota_sample(df, margin=4.0, **kw).collect()
    }
    assert two_stage == exact
    per_stratum = {}
    for _, s in exact:
        per_stratum[s] = per_stratum.get(s, 0) + 1
    assert per_stratum == {"0": 7, "1": 7, "2": 7}
    repart = {
        (r.doc_id, r.stratum)
        for r in stratified_quota_sample(
            df.repartition(13), margin=4.0, **kw
        ).collect()
    }
    assert repart == exact


def test_pack_sequences_prefix_sum_and_invariance(spark):
    from record_linkage_spark.operators.curation import pack_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17 + 3).alias("n_tokens"),
    )
    out = pack_sequences(df, budget=50, portable=True).collect()
    rows = {r.rid: r for r in out}
    assert len(rows) == 200
    # reconstruct the global order independently and check the layout
    import hashlib

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    order = sorted(range(200), key=lambda i: (h(i), str(i)))
    cum = 0
    for i in order:
        r = rows[str(i)]
        assert r.bin_id == cum // 50 and r.bin_offset == cum % 50
        cum += i % 17 + 3
    # total order, not partitioning, determines the layout
    again = {
        r.rid: (r.bin_id, r.bin_offset)
        for r in pack_sequences(
            df.repartition(11), budget=50, portable=True, num_partitions=7
        ).collect()
    }
    assert again == {k: (v.bin_id, v.bin_offset) for k, v in rows.items()}
    # every bin except the last holds >= budget tokens worth of starts
    n_bins = max(r.bin_id for r in out) + 1
    assert n_bins == (cum + 49) // 50


def test_frequent_ngrams_boilerplate_head_and_tiebreak(spark):
    from record_linkage_spark.operators.curation import frequent_ngrams

    banner = "accept all cookies to continue"
    rows = [(i, banner + f" page body {i} unique tail {i * 7}") for i in range(20)]
    rows += [(100 + i, f"standalone document number {i} about topic {i * 3}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = frequent_ngrams(df, ngram=3, k=10).collect()
    assert len(out) == 10
    # banner 3-grams appear in all 20 docs and dominate the head
    head = [(r.gram, r.n_docs) for r in out[:4]]
    assert ("accept all cookies", 20) in head
    assert ("all cookies to", 20) in head
    assert ("cookies to continue", 20) in head
    # within equal counts, grams ascend (total order -> deterministic k-set)
    for a, b in zip(out, out[1:]):
        assert (-a.n_docs, a.gram) < (-b.n_docs, b.gram)
    # per-doc DISTINCT: a gram repeated inside one doc counts once
    rep = spark.createDataFrame(
        [(1, "spam ham eggs spam ham eggs spam ham eggs")],
        "doc_id long, text string",
    )
    got = {r.gram: r.n_docs for r in frequent_ngrams(rep, ngram=3, k=50).collect()}
    assert got["spam ham eggs"] == 1


def test_length_quantiles_exact_matches_numpy_and_approx_runs(spark):
    import numpy as np

    from record_linkage_spark.operators.text_analysis import length_quantiles

    texts = [(i, "x" * (10 + 7 * (i % 13))) for i in range(40)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    lens = np.array([len(t) for _, t in texts], dtype=float)
    probs = (0.25, 0.5, 0.75, 0.9, 0.99)
    exact = {r.p: r.n_chars_q for r in length_quantiles(df, probs, exact=True).collect()}
    for p in probs:
        # Spark `percentile` definition == numpy linear interpolation
        assert exact[p] == pytest.approx(
            round(float(np.percentile(lens, p * 100)), 6), abs=1e-6
        )
    # production sketch path: same schema, values within the value range
    approx = length_quantiles(df, probs, exact=False).collect()
    assert {r.p for r in approx} == set(probs)
    assert all(lens.min() <= r.n_chars_q <= lens.max() for r in approx)


def test_keep_best_per_cluster_one_rep_per_component(spark):
    """Non-transitive chain a~b, b~c: exactly ONE survivor per component,
    picked by the order columns; singletons always survive."""
    from record_linkage_spark.operators.curation import keep_best_per_cluster

    docs = spark.createDataFrame(
        [("a", 5.0), ("b", 9.0), ("c", 7.0), ("d", 1.0), ("e", 3.0), ("f", 2.0)],
        "doc_id string, q double",
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("e", "f")], "src string, dst string"
    )
    kept = keep_best_per_cluster(
        docs, pairs, [F.col("q").desc()], id_col="doc_id"
    ).collect()
    by_id = {r.doc_id: r for r in kept}
    # chain {a,b,c} -> best-quality b; {e,f} -> e; singleton d survives
    assert set(by_id) == {"b", "d", "e"}
    assert by_id["b"].n_cluster == 3 and by_id["e"].n_cluster == 2
    assert by_id["d"].n_cluster == 1
    # component label is the min id of the component
    assert by_id["b"].entity_id == "a" and by_id["d"].entity_id == "d"


def test_keep_best_per_cluster_vs_droplist_policy(spark):
    """Contrast with dedup_corpus's drop-list: the drop list removes every
    id_B of a pair; keep_best retains one representative per component."""
    from record_linkage_spark.operators.curation import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "doc_id bigint, q double"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "src bigint, dst bigint"
    )
    kept = {r.doc_id for r in keep_best_per_cluster(
        docs, pairs, [F.col("q").desc()], id_col="doc_id"
    ).collect()}
    assert kept == {3}  # highest quality of the single chain component
    # drop-list policy on the same chain removes BOTH 2 and 3 (ids on the
    # right of any pair), keeping only 1 — documented over-removal
    droplist_kept = {1}
    assert kept != droplist_kept


def test_token_budget_sample_two_stage_equals_exact_and_budget(spark):
    from record_linkage_spark.operators.curation import token_budget_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("stratum"),
        (F.col("id") % 17 + 1).cast("bigint").alias("n_tokens"),
    )
    kw = dict(
        strata_cols=["stratum"], budget_tokens=120, id_col="doc_id",
        token_col="n_tokens",
    )
    exact = {
        (r.doc_id, r.cum_before)
        for r in token_budget_sample(df, margin=None, **kw).collect()
    }
    two_stage = {
        (r.doc_id, r.cum_before)
        for r in token_budget_sample(df, margin=4.0, **kw).collect()
    }
    assert two_stage == exact and len(exact) > 0
    # per-stratum kept tokens reach the budget, overshoot <= one doc
    rows = token_budget_sample(df, margin=None, **kw).collect()
    for s in ("0", "1"):
        srows = [r for r in rows if r.stratum == s]
        total = sum(r.n_tokens for r in srows)
        biggest = max(r.n_tokens for r in srows)
        assert total >= 120 or len(srows) == 250  # budget reached (or stratum exhausted)
        assert total - biggest < 120  # minimal prefix: drop any one doc -> under budget
    # partitioning invariance
    repart = {
        (r.doc_id, r.cum_before)
        for r in token_budget_sample(df.repartition(11), margin=4.0, **kw).collect()
    }
    assert repart == exact
