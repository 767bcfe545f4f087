from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.sketches import (
    bloom_build,
    bloom_member_flags,
    bloom_merge,
    decontaminate_bloom,
    heavy_hitters,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _values_df(spark, n, parts=4, prefix="v"):
    return (
        spark.range(n, numPartitions=parts)
        .select(F.concat(F.lit(prefix), F.col("id").cast("string")).alias("v"))
    )


# ---------------------------------------------------------------- HLL


def test_hll_estimate_within_error_bound(spark):
    n = 5000
    df = _values_df(spark, n)
    regs = hll_registers(df, "v", p=8)
    est = hll_estimate(regs, p=8).first().est_distinct
    # standard error 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_hll_duplicates_do_not_move_the_estimate(spark):
    base = _values_df(spark, 2000)
    dup = base.unionByName(base).unionByName(base)
    e1 = hll_estimate(hll_registers(base, "v", p=8), p=8).first().est_distinct
    e2 = hll_estimate(hll_registers(dup, "v", p=8), p=8).first().est_distinct
    assert e1 == e2  # registers are max-of-rho: duplicates are absorbed


def test_hll_merge_equals_union(spark):
    a = _values_df(spark, 1500, prefix="a")
    b = _values_df(spark, 1500, prefix="b")
    merged = hll_merge([hll_registers(a, "v", p=8), hll_registers(b, "v", p=8)])
    direct = hll_registers(a.unionByName(b), "v", p=8)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_grouped_registers_and_small_range_branch(spark):
    # two groups: one tiny (linear-counting branch), one large (raw branch)
    df = spark.range(3000).select(
        F.when(F.col("id") < 40, F.lit("small")).otherwise(F.lit("big")).alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    out = {
        r.g: r.est_distinct
        for r in hll_estimate(hll_registers(df, "v", ["g"], p=8), ["g"], p=8).collect()
    }
    assert abs(out["small"] - 40) / 40 < 0.25
    assert abs(out["big"] - 2960) / 2960 < 0.26


def test_hll_registers_partitioning_invariant(spark):
    df1 = _values_df(spark, 1000, parts=1)
    df8 = _values_df(spark, 1000, parts=8)
    r1 = sorted(hll_registers(df1, "v", p=8).collect())
    r8 = sorted(hll_registers(df8, "v", p=8).collect())
    assert r1 == r8


# ------------------------------------------------------- heavy hitters


def test_heavy_hitters_exact_when_capacity_suffices(spark):
    df = spark.range(1000, numPartitions=4).select(
        F.concat(F.lit("k"), F.pmod(F.col("id"), F.lit(10)).cast("string")).alias("v")
    )
    got = {r.v: r.est_count for r in heavy_hitters(df, "v", capacity=64).collect()}
    assert got == {f"k{i}": 100 for i in range(10)}


def test_heavy_hitters_guarantee_under_tight_capacity(spark):
    # skewed stream: one value holds 40% of the mass, long uniform tail
    n_hot = 4000
    hot = spark.range(n_hot, numPartitions=4).select(F.lit("HOT").alias("v"))
    tail = spark.range(6000, numPartitions=4).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("v")
    )
    df = hot.unionByName(tail)
    cap = 50
    rows = heavy_hitters(df, "v", capacity=cap).collect()
    got = {r.v: (r.est_count, r.err_bound) for r in rows}
    n = 10000
    assert "HOT" in got  # freq 4000 >> n/(cap+1) ~ 196 -> must surface
    est, err = got["HOT"]
    assert est <= n_hot  # never overestimates
    assert est >= n_hot - n / (cap + 1) - 1e-9  # MG lower bound
    # every reported count is a valid lower bound
    assert all(c <= n_hot if v == "HOT" else c <= 1 for v, (c, _) in got.items())


def test_heavy_hitters_err_bound_column(spark):
    df = _values_df(spark, 100)
    r = heavy_hitters(df, "v", capacity=9).collect()
    assert all(abs(x.err_bound - 10.0) < 1e-9 for x in r)


# ---------------------------------------------------------------- bloom


def test_bloom_zero_false_negatives_and_low_fp(spark):
    members = _values_df(spark, 500, prefix="m")
    filt = bloom_build(members, "v", n_bits=1 << 14, n_hashes=2)
    probes = members.unionByName(_values_df(spark, 2000, prefix="x"))
    flags = bloom_member_flags(probes, "v", filt, n_bits=1 << 14, n_hashes=2)
    res = flags.groupBy(F.substring("v", 1, 1).alias("kind")).agg(
        F.sum(F.col("bloom_hit").cast("int")).alias("hits"),
        F.count(F.lit(1)).alias("n"),
    )
    by = {r.kind: (r.hits, r.n) for r in res.collect()}
    assert by["m"] == (500, 500)  # no false negatives, ever
    fp_rate = by["x"][0] / by["x"][1]
    # theory: (1 - e^(-kn/m))^k ~ (1-e^(-1000/16384))^2 ~ 0.0035
    assert fp_rate < 0.02


def test_bloom_merge_equals_union_filter(spark):
    a = _values_df(spark, 300, prefix="a")
    b = _values_df(spark, 300, prefix="b")
    merged = bloom_merge(
        [bloom_build(a, "v", n_bits=1 << 13), bloom_build(b, "v", n_bits=1 << 13)]
    )
    direct = bloom_build(a.unionByName(b), "v", n_bits=1 << 13)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_bloom_membership_is_pure_catalyst(spark):
    members = _values_df(spark, 50)
    filt = bloom_build(members, "v", n_bits=1 << 13)
    plan = bloom_member_flags(
        members, "v", filt, n_bits=1 << 13
    )._jdf.queryExecution().executedPlan().toString()
    for tok in ("Python", "Arrow", "FlatMapsInPandas", "BatchEvalPython"):
        assert tok not in plan
    assert "BroadcastHashJoin" in plan


def test_decontaminate_bloom_matches_exact(spark):
    from record_linkage_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again ok"),
            (2, "completely unrelated text with no overlap whatsoever in any gram here"),
            (3, "quick brown fox jumps over the lazy dog again and again more words"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again and again",)],
        "doc_id int, text string",
    )
    exact = {
        r.doc_id: r.n_shared_grams
        for r in decontaminate(docs, bench, ngram=8).collect()
    }
    via_bloom = {
        r.doc_id: r.n_shared_grams
        for r in decontaminate_bloom(docs, bench, ngram=8, n_bits=1 << 14).collect()
    }
    assert via_bloom == exact
    assert 1 in via_bloom and 2 not in via_bloom


def test_bloom_build_word_count_bounded(spark):
    filt = bloom_build(_values_df(spark, 5000), "v", n_bits=1 << 13, n_hashes=2)
    assert filt.count() <= math.ceil((1 << 13) / 62)


# ---------------------------------------------------------------- CountMin


def _skewed_df(spark, parts=4):
    # value f"k{i % 50}" with geometric-ish skew: k0 appears most
    return spark.range(20000, numPartitions=parts).select(
        F.concat(
            F.lit("k"), (F.col("id") % (F.col("id") % 97 + 1) % 50).cast("string")
        ).alias("v")
    )


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    from record_linkage_spark.operators.sketches import cms_build, cms_estimate

    df = _skewed_df(spark)
    truth = {r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    cms = cms_build(df, "v", depth=4, width=1 << 12)
    q = spark.createDataFrame([(k,) for k in truth], "v string")
    est = {
        r.v: r.est_count
        for r in cms_estimate(q, "v", cms, depth=4, width=1 << 12).collect()
    }
    n_total = sum(truth.values())
    for k, t in truth.items():
        assert est[k] >= t  # CMS one-sided error
        assert est[k] <= t + 2.0 * n_total / (1 << 12) * 8  # loose 8x bound


def test_cms_exact_in_no_collision_regime(spark):
    from record_linkage_spark.operators.sketches import cms_build, cms_estimate

    # 20 distinct values, width 4096: collisions essentially impossible
    df = spark.range(2000, numPartitions=3).select(
        F.concat(F.lit("x"), (F.col("id") % 20).cast("string")).alias("v")
    )
    cms = cms_build(df, "v", depth=4, width=1 << 12)
    q = spark.createDataFrame([(f"x{i}",) for i in range(20)], "v string")
    est = cms_estimate(q, "v", cms, depth=4, width=1 << 12).collect()
    assert all(r.est_count == 100 for r in est)


def test_cms_merge_equals_union(spark):
    from record_linkage_spark.operators.sketches import cms_build, cms_merge

    a = _values_df(spark, 1200, prefix="a")
    b = _values_df(spark, 1200, prefix="b")
    merged = cms_merge(
        [cms_build(a, "v", depth=3, width=512), cms_build(b, "v", depth=3, width=512)]
    )
    direct = cms_build(a.unionByName(b), "v", depth=3, width=512)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_weighted_and_absent_values(spark):
    from record_linkage_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "v string, w long"
    )
    cms = cms_build(df, "v", depth=4, width=256, weight_col="w")
    q = spark.createDataFrame([("a",), ("b",), ("zz_never",)], "v string")
    est = {
        r.v: r.est_count
        for r in cms_estimate(q, "v", cms, depth=4, width=256).collect()
    }
    assert est["a"] == 12 and est["b"] >= 1
    # absent value: min over rows is 0 unless ALL its cells collide
    assert est["zz_never"] <= 1


def test_cms_build_partitioning_invariant(spark):
    from record_linkage_spark.operators.sketches import cms_build

    df1 = _skewed_df(spark, parts=2)
    df2 = _skewed_df(spark, parts=13)
    c1 = cms_build(df1, "v", depth=3, width=1024)
    c2 = cms_build(df2, "v", depth=3, width=1024)
    assert c1.exceptAll(c2).count() == 0
    assert c2.exceptAll(c1).count() == 0


def test_cms_estimate_is_pure_catalyst(spark):
    from record_linkage_spark.operators.sketches import cms_build, cms_estimate

    df = _values_df(spark, 500)
    cms = cms_build(df, "v", depth=2, width=128)
    out = cms_estimate(df.limit(50), "v", cms, depth=2, width=128)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan


# ---------------------------------------------------------------- histogram


def _hist_ref_quantile(values, q):
    """Reference for the readout's definition: smallest value whose rank
    reaches ceil(q * N) in the sorted order."""
    import math as _m

    s = sorted(values)
    return s[max(_m.ceil(q * len(s)), 1) - 1]


def test_histogram_exact_region(spark):
    from record_linkage_spark.operators.sketches import (
        histogram_quantiles,
        int_histogram,
    )

    vals = [(i * 37) % 250 for i in range(2000)]  # all < 2^(7+1) = 256
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = int_histogram(df, "v", precision=7)
    got = {
        r.q: r.v_est
        for r in histogram_quantiles(hist, [0.1, 0.5, 0.9, 1.0], precision=7).collect()
    }
    for q in (0.1, 0.5, 0.9, 1.0):
        assert got[q] == _hist_ref_quantile(vals, q)


def test_histogram_relative_error_bound(spark):
    import hashlib

    from record_linkage_spark.operators.sketches import (
        histogram_quantiles,
        int_histogram,
    )

    p = 7
    vals = [
        1 + int(hashlib.md5(f"h:{i}".encode()).hexdigest()[:12], 16) % (10**9)
        for i in range(4000)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    hist = int_histogram(df, "v", precision=p)
    for r in histogram_quantiles(hist, [0.01, 0.25, 0.5, 0.75, 0.99], precision=p).collect():
        ref = _hist_ref_quantile(vals, r.q)
        assert r.v_est <= ref
        assert ref - r.v_est <= max(1, r.v_est >> p)


def test_histogram_bucket_monotone_and_bounded(spark):
    from pyspark.sql import functions as F

    from record_linkage_spark.operators.sketches import _hist_bucket, _hist_lower

    df = spark.range(0, 200000, 17).select(
        F.col("id").alias("v"), _hist_bucket("id", 7)
    )
    rows = df.select("v", "bucket", _hist_lower("bucket", 7).alias("lo")).collect()
    by_v = sorted((r.v, r.bucket) for r in rows)
    assert all(b2 >= b1 for (_, b1), (_, b2) in zip(by_v, by_v[1:]))
    for r in rows:
        assert r.lo <= r.v
        assert r.v - r.lo <= max(1, r.lo >> 7)


def test_histogram_merge_equals_union(spark):
    from record_linkage_spark.operators.sketches import histogram_merge, int_histogram

    a = spark.range(0, 5000).selectExpr("id * id % 100000 AS v")
    b = spark.range(5000, 9000).selectExpr("id * 3 AS v")
    merged = histogram_merge(
        [int_histogram(a, "v", precision=6), int_histogram(b, "v", precision=6)]
    )
    whole = int_histogram(a.unionByName(b), "v", precision=6)
    assert sorted((r.bucket, r.n) for r in merged.collect()) == sorted(
        (r.bucket, r.n) for r in whole.collect()
    )


def test_histogram_grouped_and_invariance(spark):
    from pyspark.sql import functions as F

    from record_linkage_spark.operators.sketches import (
        histogram_quantiles,
        int_histogram,
    )

    df = spark.range(0, 6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 31 % 4096).alias("v"),
    )
    h1 = int_histogram(df, "v", ["g"], precision=9)
    h2 = int_histogram(df.repartition(13), "v", ["g"], precision=9)
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h2.collect()))
    out = histogram_quantiles(h1, [0.5], ["g"], precision=9).collect()
    assert len(out) == 3
    grouped = {}
    for r in df.collect():
        grouped.setdefault(r.g, []).append(r.v)
    for r in out:
        ref = _hist_ref_quantile(grouped[r.g], 0.5)
        assert r.v_est <= ref
        assert ref - r.v_est <= max(1, r.v_est >> 9)


def test_histogram_drops_null_and_negative(spark):
    from record_linkage_spark.operators.sketches import int_histogram

    df = spark.createDataFrame(
        [(None,), (-5,), (3,), (3,)], "v long"
    )
    rows = int_histogram(df, "v", precision=7).collect()
    assert [(r.bucket, r.n) for r in rows] == [(3, 2)]


def test_cms_join_cardinality(spark):
    from pyspark.sql import functions as F

    from record_linkage_spark.operators.sketches import (
        cms_build,
        cms_join_cardinality,
    )

    # keys with known multiplicities: true join size = sum over shared
    # keys of cntA * cntB
    a = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(140)] + [("hot",)] * 60, "v string"
    )
    b = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(50)] + [("hot",)] * 30, "v string"
    )
    true_size = a.join(b, "v").count()
    ca = cms_build(a, "v", depth=4, width=1 << 10)
    cb = cms_build(b, "v", depth=4, width=1 << 10)
    est = cms_join_cardinality(ca, cb, depth=4).collect()[0].est_join_rows
    # upper bound always; exact here (width >> distinct keys, no collisions)
    assert est >= true_size
    assert est == true_size

    # disjoint key sets -> estimate collapses to 0 even when rows are
    # absent from the joined counter table
    c = spark.createDataFrame([("zzz1",), ("zzz2",)], "v string")
    cc = cms_build(c, "v", depth=4, width=1 << 10)
    d = spark.createDataFrame([("qqq1",)], "v string")
    cd = cms_build(d, "v", depth=4, width=1 << 10)
    est0 = cms_join_cardinality(cc, cd, depth=4).collect()[0].est_join_rows
    assert est0 in (0, 1)  # 0 unless every row's cells collide


def test_cms_join_cardinality_never_underestimates(spark):
    import hashlib

    from record_linkage_spark.operators.sketches import (
        cms_build,
        cms_join_cardinality,
    )

    def h(i, s):
        return int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16)

    # tight width forces collisions: estimate must stay an upper bound
    a = spark.createDataFrame(
        [(f"a{h(i, 'x') % 40}",) for i in range(300)], "v string"
    )
    b = spark.createDataFrame(
        [(f"a{h(i, 'z') % 55}",) for i in range(200)], "v string"
    )
    true_size = a.join(b, "v").count()
    est = cms_join_cardinality(
        cms_build(a, "v", depth=3, width=16),
        cms_build(b, "v", depth=3, width=16),
        depth=3,
    ).collect()[0].est_join_rows
    assert est >= true_size


# ---------------------------------------------------------------- KMV


def _kmv_mod(spark):
    from record_linkage_spark.operators.sketches import kmv_sketch

    return kmv_sketch


def test_kmv_exact_below_k(spark):
    from record_linkage_spark.operators.sketches import kmv_estimate, kmv_sketch

    df = _values_df(spark, 40)
    sk = kmv_sketch(df, "v", k=64)
    assert sk.count() == 40
    est = kmv_estimate(sk, k=64).first()
    assert est.n_vals == 40
    assert est.est_distinct == 40.0


def test_kmv_estimate_error_bound(spark):
    from record_linkage_spark.operators.sketches import kmv_estimate, kmv_sketch

    n = 20000
    sk = kmv_sketch(_values_df(spark, n), "v", k=256)
    assert sk.count() == 256
    est = kmv_estimate(sk, k=256).first().est_distinct
    # relative std err ~ 1/sqrt(k-1) ~ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25


def test_kmv_duplicates_do_not_move_the_sketch(spark):
    from record_linkage_spark.operators.sketches import kmv_sketch

    base = _values_df(spark, 3000)
    dup = base.union(base).union(base)
    a = sorted(r.h for r in kmv_sketch(base, "v", k=128).collect())
    b = sorted(r.h for r in kmv_sketch(dup, "v", k=128).collect())
    assert a == b


def test_kmv_merge_equals_sketch_of_union(spark):
    from record_linkage_spark.operators.sketches import kmv_merge, kmv_sketch

    a = _values_df(spark, 2000, prefix="a")
    b = _values_df(spark, 2000, prefix="b")
    merged = sorted(
        r.h
        for r in kmv_merge(
            [kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128)], k=128
        ).collect()
    )
    direct = sorted(r.h for r in kmv_sketch(a.union(b), "v", k=128).collect())
    assert merged == direct


def test_kmv_set_report_recovers_planted_overlap(spark):
    from record_linkage_spark.operators.sketches import kmv_set_report, kmv_sketch

    # A = 0..11999, B = 8000..19999 -> |A∩B| = 4000, |A∪B| = 20000, J = 0.2
    ids = _values_df(spark, 20000)
    a = ids.limit(0).union(ids.filter(F.substring("v", 2, 10).cast("long") < 12000))
    b = ids.filter(F.substring("v", 2, 10).cast("long") >= 8000)
    rep = kmv_set_report(
        kmv_sketch(a, "v", k=512), kmv_sketch(b, "v", k=512), k=512
    ).first()
    assert abs(rep.est_union - 20000) / 20000 < 0.2
    assert abs(rep.jaccard_est - 0.2) < 0.08
    assert abs(rep.est_intersection - 4000) / 4000 < 0.45


def test_kmv_disjoint_sets_report_zero_overlap(spark):
    from record_linkage_spark.operators.sketches import kmv_set_report, kmv_sketch

    a = kmv_sketch(_values_df(spark, 2000, prefix="x"), "v", k=128)
    b = kmv_sketch(_values_df(spark, 2000, prefix="y"), "v", k=128)
    rep = kmv_set_report(a, b, k=128).first()
    assert rep.rho == 0
    assert rep.jaccard_est == 0.0
    assert rep.est_intersection == 0.0


def test_kmv_grouped_and_partitioning_invariant(spark):
    from record_linkage_spark.operators.sketches import kmv_sketch

    df = spark.range(3000, numPartitions=6).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    a = sorted((r.g, r.h) for r in kmv_sketch(df, "v", k=32, group_cols=["g"]).collect())
    b = sorted(
        (r.g, r.h)
        for r in kmv_sketch(df.repartition(11), "v", k=32, group_cols=["g"]).collect()
    )
    assert a == b
    per_g = {}
    for g, _ in a:
        per_g[g] = per_g.get(g, 0) + 1
    assert all(c == 32 for c in per_g.values())


def test_kmv_validation(spark):
    from record_linkage_spark.operators.sketches import kmv_sketch

    with pytest.raises(ValueError):
        kmv_sketch(_values_df(spark, 10), "v", k=1)
