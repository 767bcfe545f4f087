"""Domain-mixture planner/sampler: hand-computed plan arithmetic,
epoch-cap behavior, multiplicity truth table, unbiased token totals,
epoch interleaving tags, determinism across partitioning, and the
no-corpus-shuffle plan pin."""

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.mixing import plan_mixture, sample_mixture

SCHEMA = "doc_id bigint, domain string, n_tokens bigint"


def _docs(spark, n_web=100, n_code=20, n_ref=5):
    rows = (
        [(i, "web", 100) for i in range(n_web)]
        + [(1000 + i, "code", 50) for i in range(n_code)]
        + [(2000 + i, "ref", 40) for i in range(n_ref)]
    )
    return spark.createDataFrame(rows, SCHEMA)


def test_plan_hand_computed(spark):
    # available: web 10000, code 1000, ref 200
    plan = {
        r.domain: r
        for r in plan_mixture(
            _docs(spark), {"web": 6.0, "code": 3.0, "ref": 1.0},
            total_tokens=5000,
        ).collect()
    }
    web = plan["web"]          # target 3000 of 10000 -> 0.3 epochs
    assert web.available_tokens == 10000
    assert web.target_tokens == pytest.approx(3000.0)
    assert (web.n_full_epochs, web.frac_epoch) == (0, pytest.approx(0.3))
    assert web.achieved_tokens == pytest.approx(3000.0)
    code = plan["code"]        # target 1500 of 1000 -> 1.5 epochs
    assert (code.n_full_epochs, code.frac_epoch) == (1, pytest.approx(0.5))
    ref = plan["ref"]          # target 500 of 200 -> 2.5 epochs
    assert (ref.n_full_epochs, ref.frac_epoch) == (2, pytest.approx(0.5))


def test_epoch_cap_binds_visibly(spark):
    plan = {
        r.domain: r
        for r in plan_mixture(
            _docs(spark), {"web": 1.0, "ref": 1.0},
            total_tokens=20000, max_epochs=4.0,
        ).collect()
    }
    ref = plan["ref"]          # target 10000 of 200 -> 50 epochs, capped
    assert (ref.n_full_epochs, ref.frac_epoch) == (4, pytest.approx(0.0))
    assert ref.achieved_tokens == pytest.approx(800.0)  # shortfall visible
    assert "code" not in plan  # unweighted domain dropped


def test_sample_multiplicity_truth_table(spark):
    docs = _docs(spark)
    plan = plan_mixture(
        docs, {"web": 6.0, "code": 3.0, "ref": 1.0}, total_tokens=5000
    )
    out = sample_mixture(docs, plan, portable=True)
    per_doc = {
        (r.domain, r.doc_id): r.cnt
        for r in out.groupBy("domain", "doc_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # web: 0.3 epochs -> sampled docs appear exactly once, most absent
    web_counts = [v for (d, _), v in per_doc.items() if d == "web"]
    assert set(web_counts) == {1} and 10 <= len(web_counts) <= 55
    # code: 1.5 epochs -> every doc 1 or 2 times
    code_counts = [v for (d, _), v in per_doc.items() if d == "code"]
    assert len(code_counts) == 20 and set(code_counts) <= {1, 2}
    # ref: 2.5 epochs -> every doc 2 or 3 times
    ref_counts = [v for (d, _), v in per_doc.items() if d == "ref"]
    assert len(ref_counts) == 5 and set(ref_counts) <= {2, 3}
    # epoch tags are 0..copies-1 per doc (interleavable)
    eps = sorted(
        r.epoch for r in out.filter(F.col("domain") == "ref").collect()
    )
    assert eps[:5] == [0, 0, 0, 0, 0] and max(eps) <= 2


def test_sampled_tokens_near_target(spark):
    # larger corpus so binomial noise is small relative to target
    rows = [(i, "web", 100) for i in range(4000)]
    docs = spark.createDataFrame(rows, SCHEMA)
    plan = plan_mixture(docs, {"web": 1.0}, total_tokens=120_000)
    got = (
        sample_mixture(docs, plan)
        .agg(F.sum("n_tokens").alias("t"))
        .collect()[0]
        .t
    )
    assert got == pytest.approx(120_000, rel=0.1)


def test_deterministic_across_partitioning_and_modes(spark):
    docs = _docs(spark)
    plan = plan_mixture(
        docs, {"web": 2.0, "code": 1.0}, total_tokens=6000
    ).cache()
    for portable in (False, True):
        a = sorted(
            map(tuple, sample_mixture(
                docs.repartition(1), plan, portable=portable
            ).collect())
        )
        b = sorted(
            map(tuple, sample_mixture(
                docs.repartition(13), plan, portable=portable
            ).collect())
        )
        assert a == b and a


def test_no_corpus_shuffle_in_sampling(spark):
    """The corpus side must reach the output through a broadcast join +
    map only — sampling a 100 TB corpus must not exchange it."""
    docs = _docs(spark)
    plan = plan_mixture(docs, {"web": 1.0}, total_tokens=1000)
    sampled = sample_mixture(docs, plan)
    p = sampled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    # the only exchanges allowed are the broadcast of the |domains|-row
    # plan (and the plan's own aggregation) — never a hash exchange of
    # the docs relation feeding the join
    assert "Exchange hashpartitioning(doc_id" not in p
