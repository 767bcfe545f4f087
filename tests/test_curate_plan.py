"""End-to-end test of the corpus-curation plan (plans/curate.py): a small
corpus with planted PII, exact + near duplicates, junk docs, a
multi-language mix and a contaminated doc flows through the full funnel;
each removal stage must catch exactly its plants, and resume must reuse
the committed stages."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.plans.curate import CurationPipeline

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and then walks home "
    "through the quiet forest while the evening light fades slowly away"
)
GOOD_EN2 = (
    "a gentle rain fell on the old stone bridge as the travellers made "
    "their way into the village square looking for a warm place to rest"
)
GOOD_DE = (
    "der schnelle braune fuchs springt gerne und der alte hund schläft "
    "unter dem grossen baum waehrend die kinder mit dem ball spielen"
)
GOOD_PII = (
    "please send the quarterly report to the finance team before friday "
    "morning contact me at alice@example.com for details about the schedule"
)
BENCH_TEXT = (
    "what is the capital of france the capital of france is paris which "
    "has been the seat of government for many centuries of history"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD_EN),
        (2, GOOD_EN2),
        (3, GOOD_DE),
        # exact duplicate of 1 (normalizer-equal)
        (4, GOOD_EN.upper() + "  "),
        # near duplicate of 2 (one word changed)
        (5, GOOD_EN2.replace("warm", "cosy")),
        # junk: one token repeated (top_token_frac = 1)
        (6, "spam " * 40),
        # junk: too short
        (7, "hi"),
        # PII carrier (otherwise good, distinct text)
        (8, GOOD_PII),
        # contaminated: contains the benchmark's 8-gram
        (9, GOOD_EN2 + " " + BENCH_TEXT),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame([(100, BENCH_TEXT)], "doc_id long, text string")


@pytest.fixture(scope="module")
def report_and_wh(spark, corpus, bench_docs, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("curate_wh"))
    pipe = CurationPipeline(
        spark,
        wh,
        docs_df=corpus,
        benchmark_df=bench_docs,
        quota=10,
        pack_budget=30,
        minhash_threshold=0.6,
    )
    return pipe.run(resume=True), wh, pipe


def test_funnel_catches_each_plant(spark, report_and_wh):
    report, wh, pipe = report_and_wh
    kept = {r.doc_id for r in pipe.wh.read("decontaminated").select("doc_id").collect()}
    # survivors: 1,2,3 and the scrubbed PII doc 8
    assert kept == {1, 2, 3, 8}
    # per-stage removals
    assert report["removed"]["quality_filter"] == 2  # docs 6, 7
    assert report["removed"]["dedup"] == 2  # docs 4 (exact), 5 (near)
    assert report["removed"]["decontamination"] == 1  # doc 9
    assert report["stages"]["docs"] == 9


def test_pii_scrubbed_before_signals(report_and_wh):
    _, _, pipe = report_and_wh
    texts = [r.text for r in pipe.wh.read("scrubbed").collect()]
    assert all("alice@example.com" not in t for t in texts)
    assert any("<EMAIL>" in t for t in texts)


def test_sampled_respects_quota_and_strata(report_and_wh):
    _, _, pipe = report_and_wh
    sampled = pipe.wh.read("sampled")
    per = sampled.groupBy("lang").count().collect()
    assert all(r["count"] <= 10 for r in per)
    assert sampled.count() == 4  # quota 10 > stratum sizes: all survive


def test_packed_bins_are_contiguous(report_and_wh):
    report, _, pipe = report_and_wh
    rows = pipe.wh.read("packed").collect()
    # reconstruct the global stream: offsets must be consistent with a
    # single contiguous token layout cut every `budget` tokens
    total = sum(r.n_tokens for r in rows)
    starts = sorted(r.bin_id * 30 + r.bin_offset for r in rows)
    # starts are the exclusive prefix sums of n_tokens in stream order
    lens_in_order = []
    for i, s in enumerate(starts):
        expect = 0 if i == 0 else starts[i - 1] + lens_in_order[-1]
        assert s == expect
        lens_in_order.append(
            next(r.n_tokens for r in rows if r.bin_id * 30 + r.bin_offset == s)
        )
    assert report["n_bins"] == (total - 1) // 30 + 1


def test_report_written_and_resume_reuses_stages(spark, corpus, bench_docs, report_and_wh):
    report, wh, _ = report_and_wh
    with open(os.path.join(wh, "curation_report.json")) as f:
        on_disk = json.load(f)
    assert on_disk["stages"] == report["stages"]
    # resume run: same config -> all stages reused, identical funnel
    pipe2 = CurationPipeline(
        spark,
        wh,
        docs_df=corpus.filter(F.lit(False)),  # would change counts if re-run
        benchmark_df=bench_docs,
        quota=10,
        pack_budget=30,
        minhash_threshold=0.6,
    )
    report2 = pipe2.run(resume=True)
    assert report2["stages"] == report["stages"]


def test_keep_best_policy_one_rep_per_dup_group(spark, corpus, bench_docs, tmp_path_factory):
    """dedup_policy='keep_best': exactly one representative survives per
    duplicate component (picked by q_score), and the funnel runs end to
    end with the same removal counts on this 2-clique corpus."""
    from record_linkage_spark.plans.curate import CurationPipeline

    wh = str(tmp_path_factory.mktemp("curate_wh_kb"))
    pipe = CurationPipeline(
        spark,
        wh,
        docs_df=corpus,
        benchmark_df=bench_docs,
        quota=10,
        pack_budget=30,
        minhash_threshold=0.6,
        dedup_policy="keep_best",
    )
    report = pipe.run(resume=True)
    kept = {r.doc_id for r in pipe.wh.read("deduped").select("doc_id").collect()}
    # one survivor from each planted duplicate pair, everything else kept
    assert len(kept & {1, 4}) == 1 and len(kept & {2, 5}) == 1
    assert {3, 8, 9} <= kept
    assert report["removed"]["dedup"] == 2
    assert report["config"]["dedup_policy"] == "keep_best"


def test_rule_filter_stage_catches_rule_plants(
    spark, bench_docs, tmp_path_factory
):
    """--rule-filters c4,gopher inserts a stage between scrub and signals:
    the C4 line filter rewrites text (unpunctuated lines drop), C4 doc
    rules and Gopher stats drop whole docs, everything else flows on; the
    report attributes the removals and the default graph is untouched."""
    sentence = "the quick brown fox jumps over the lazy dog with glee."
    good = "\n".join([sentence] * 6)
    rows = [
        (1, good),
        # line-filtered, doc survives: one unpunctuated junk line
        (2, good + "\nno punctuation junk line here"),
        # C4 doc rule: lorem ipsum
        (3, good + "\nLorem ipsum dolor sit amet."),
        # Gopher: symbol ratio — the hash line survives the C4 line
        # filter (3 words, terminal '.') so Gopher is what drops the doc
        (4, good + "\n######### and done."),
        # Gopher: no stop words at all
        (5, "\n".join(["alpha beta gamma delta epsilon zeta eta."] * 6)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wh = str(tmp_path_factory.mktemp("rulewh"))
    pipe = CurationPipeline(
        spark, wh, docs_df=docs, benchmark_df=bench_docs,
        rule_filters=("c4", "gopher"),
        gopher_kwargs={"min_words": 20},
        quota=10,
    )
    r = pipe.run(resume=True)
    kept = {
        row.doc_id: row.text
        for row in spark.read.parquet(os.path.join(wh, "rule_filtered")).collect()
    }
    assert set(kept) == {1, 2}
    assert "junk line" not in kept[2]  # C4 line filter rewrote the text
    assert r["removed"]["rule_filters"] == 3
    assert r["stages"]["rule_filtered"] == 2
    assert r["config"]["rule_filters"] == ["c4", "gopher"]
    with pytest.raises(ValueError):
        CurationPipeline(spark, wh, docs_df=docs, rule_filters=("nope",))


def test_unknown_dedup_policy_rejected(spark):
    from record_linkage_spark.plans.curate import CurationPipeline

    with pytest.raises(ValueError, match="unknown dedup_policy"):
        CurationPipeline(spark, "/tmp/never", docs_df=None, dedup_policy="nope")


def test_ssjoin_pair_strategy_exact_recall(spark, corpus, bench_docs, tmp_path_factory):
    """pair_strategy='ssjoin': the exact prefix-filter join drives the
    dedup stage — the planted exact dup and the one-word-changed near
    dup are both dropped (token-set Jaccard of the near pair is 22/24 ≈
    0.92), while doc 9 (doc 2 + appended benchmark text, token-set
    J = 23/37 ≈ 0.62 — token sets score containment-ish pairs higher
    than shingle sets, hence tau=0.8 here) survives to be caught by
    decontamination instead. The report records the strategy."""
    wh = str(tmp_path_factory.mktemp("curate_wh_ss"))
    pipe = CurationPipeline(
        spark,
        wh,
        docs_df=corpus,
        benchmark_df=bench_docs,
        quota=10,
        pack_budget=30,
        minhash_threshold=0.8,
        pair_strategy="ssjoin",
    )
    report = pipe.run(resume=True)
    kept = {r.doc_id for r in pipe.wh.read("deduped").select("doc_id").collect()}
    assert 4 not in kept and 5 not in kept  # exact dup + near dup dropped
    assert {1, 2, 3, 8, 9} <= kept
    assert report["removed"]["dedup"] == 2
    assert report["config"]["pair_strategy"] == "ssjoin"


def test_unknown_pair_strategy_rejected(spark):
    with pytest.raises(ValueError, match="unknown pair_strategy"):
        CurationPipeline(spark, "/tmp/never", docs_df=None, pair_strategy="nope")


def test_zratio_rule_filter_drops_repetition(
    spark, bench_docs, tmp_path_factory
):
    """--rule-filters zratio: the compression-ratio proxy drops the
    hyper-compressible repetition doc the word-level rules would pass,
    keeps prose, and the funnel attributes the removal."""
    sentence = "the quick brown fox jumps over the lazy dog with glee."
    prose = "\n".join(
        f"{sentence} variation {i} keeps the vocabulary moving."
        for i in range(8)
    )
    rows = [
        (1, prose),
        (2, ("spam ham " * 400).strip() + "."),  # compresses ~50x
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wh = str(tmp_path_factory.mktemp("zratiowh"))
    pipe = CurationPipeline(
        spark, wh, docs_df=docs, benchmark_df=bench_docs,
        rule_filters=("zratio",),
        quota=10,
    )
    r = pipe.run(resume=True)
    kept = {
        row.doc_id
        for row in spark.read.parquet(
            os.path.join(wh, "rule_filtered")
        ).collect()
    }
    assert kept == {1}
    assert r["removed"]["rule_filters"] == 1
    assert r["config"]["rule_filters"] == ["zratio"]


def test_report_carries_input_vs_output_drift(report_and_wh):
    report = report_and_wh[0]
    drift = report["drift_vs_input"]
    assert set(drift) == {"n_chars"}
    d = drift["n_chars"]
    # curation changes the corpus, so drift is defined and bounded
    assert d["psi"] >= 0.0
    assert 0.0 <= d["jsd"] <= 0.6932
    assert 0.0 <= d["tv"] <= 1.0


def test_drift_gate_trips_on_shift_and_passes_otherwise(report_and_wh):
    """--max-drift release gate (plans/curate.py:apply_drift_gate): the
    fixture pipeline's quality/dedup stages shift the n_chars
    distribution (a planted shift — 6 of 9 docs removed), so a
    threshold below the measured PSI trips the gate and one above it
    passes; both verdicts land in curation_report.json AND the sampled
    stage's lineage sidecar."""
    import json
    import os

    from record_linkage_spark.plans.curate import apply_drift_gate

    report, wh, pipe = report_and_wh
    psi = report["drift_vs_input"]["n_chars"]["psi"]
    assert psi > 0.0  # the plant: curation DID shift the corpus

    gate = apply_drift_gate(pipe, max_drift=psi + 1.0)
    assert gate["passed"] and gate["breaches"] == {}
    assert pipe.wh.lineage("sampled")["drift_gate"]["passed"] is True

    gate = apply_drift_gate(pipe, max_drift=psi / 2)
    assert not gate["passed"] and set(gate["breaches"]) == {"n_chars"}
    # report file and lineage both carry the failing verdict
    on_disk = json.load(open(os.path.join(pipe.wh.root, "curation_report.json")))
    assert on_disk["drift_gate"]["passed"] is False
    assert pipe.wh.lineage("sampled")["drift_gate"]["passed"] is False
    assert on_disk["drift_gate"]["max_drift"] == psi / 2
