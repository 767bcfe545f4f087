from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.drift import (
    CatSpec,
    HistSpec,
    corpus_drift,
    drift_report,
    drift_scalars,
    snapshot_fractions,
)

SPECS = [
    HistSpec("len", "n", (10, 20)),
    CatSpec("lang", "lang", ("en", "de")),
]


def _snap(spark, rows):
    return spark.createDataFrame(rows, "n int, lang string")


def test_snapshot_fractions_bins_and_totals(spark):
    df = _snap(
        spark,
        [(5, "en"), (15, "en"), (25, "de"), (None, "fr"), (7, None)],
    )
    out = {
        (r.feature, r.bin): (r.n, r.frac)
        for r in snapshot_fractions(df, SPECS).collect()
    }
    # null n dropped from the hist (4 retained), null lang -> __other__
    assert out[("len", "b0")] == (2, 0.5)
    assert out[("len", "b1")] == (1, 0.25)
    assert out[("len", "b2")] == (1, 0.25)
    assert out[("lang", "en")][0] == 2
    assert out[("lang", "__other__")][0] == 2
    assert sum(v[1] for k, v in out.items() if k[0] == "lang") == pytest.approx(1.0)


def test_identical_snapshots_have_zero_drift(spark):
    df = _snap(spark, [(5, "en"), (15, "de"), (25, "en"), (8, "fr")])
    scal = {r.feature: r for r in drift_scalars(drift_report(df, df, SPECS)).collect()}
    for f in ("len", "lang"):
        assert scal[f].psi == 0.0
        assert scal[f].jsd == 0.0
        assert scal[f].tv == 0.0


def test_known_hand_computed_case(spark):
    # len fracs: a = (0.5, 0.5, 0), b = (0.25, 0.25, 0.5)
    a = _snap(spark, [(5, "en"), (5, "en"), (15, "en"), (15, "en")])
    b = _snap(spark, [(5, "en"), (15, "en"), (25, "en"), (25, "en")])
    scal = {r.feature: r for r in drift_scalars(drift_report(a, b, SPECS)).collect()}
    eps = 1e-6
    psi = 2 * (0.5 - 0.25) * math.log(0.5 / 0.25) + (eps - 0.5) * math.log(eps / 0.5)
    assert scal["len"].psi == pytest.approx(psi, abs=1e-6)
    tv = 0.5 * (0.25 + 0.25 + 0.5)
    assert scal["len"].tv == pytest.approx(tv, abs=1e-6)
    # disjoint supports maximize JSD at ln 2; this overlap stays below
    assert 0 < scal["len"].jsd < math.log(2.0)
    assert scal["lang"].psi == 0.0


def test_jsd_hits_ln2_on_disjoint_supports(spark):
    a = _snap(spark, [(5, "en")] * 3)
    b = _snap(spark, [(25, "de")] * 3)
    scal = {r.feature: r for r in drift_scalars(drift_report(a, b, SPECS)).collect()}
    assert scal["len"].jsd == pytest.approx(math.log(2.0), abs=1e-6)
    assert scal["len"].tv == pytest.approx(1.0, abs=1e-6)
    assert scal["lang"].jsd == pytest.approx(math.log(2.0), abs=1e-6)


def test_absent_bins_appear_with_zero_side(spark):
    a = _snap(spark, [(5, "en")])
    b = _snap(spark, [(25, "de")])
    rows = {
        (r.feature, r.bin): r for r in drift_report(a, b, SPECS).collect()
    }
    assert rows[("len", "b0")].n_b == 0
    assert rows[("len", "b0")].frac_b == 0.0
    assert rows[("len", "b2")].n_a == 0


def test_partitioning_invariance(spark):
    rows = [(int(5 + 7 * i) % 40, ["en", "de", "fr"][i % 3]) for i in range(60)]
    a = _snap(spark, rows[:40])
    b = _snap(spark, rows[20:])
    base = sorted(
        map(tuple, drift_report(a, b, SPECS).collect())
    )
    again = sorted(
        map(
            tuple,
            drift_report(a.repartition(7), b.repartition(13), SPECS).collect(),
        )
    )
    assert base == again


def test_corpus_drift_on_documents_shape(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (20 * (i % 50)), ["en", "de", "fr", "pt"][i % 4]) for i in range(80)],
        "doc_id long, text string, lang string",
    ).withColumn("n_chars", F.length("text"))
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("lang") == "en")
    scal = {r.feature: r for r in corpus_drift(a, b).collect()}
    assert set(scal) == {"n_chars", "lang"}
    # b is all-en, a is 25% en: the lang feature must show real drift
    assert scal["lang"].psi > 0.25
    for r in scal.values():
        assert 0.0 <= r.jsd <= math.log(2.0) + 1e-9
        assert 0.0 <= r.tv <= 1.0


def test_empty_spec_list_raises(spark):
    df = _snap(spark, [(5, "en")])
    with pytest.raises(ValueError):
        snapshot_fractions(df, [])


# ------------------------------------------------------- histogram drift


def _hist(spark, vals, group="g"):
    from record_linkage_spark.operators.sketches import int_histogram

    df = spark.createDataFrame([(group, v) for v in vals], "g string, v long")
    return int_histogram(df, "v", ["g"], precision=4)


def test_histogram_drift_zero_on_identical_states(spark):
    from record_linkage_spark.operators.drift import histogram_drift

    h = _hist(spark, [3, 9, 27, 81, 243, 729])
    out = histogram_drift(h, h, ["g"]).first()
    assert out.psi == 0.0 and out.jsd == 0.0 and out.tv == 0.0


def test_histogram_drift_detects_shifted_distribution(spark):
    import math

    from record_linkage_spark.operators.drift import histogram_drift

    a = _hist(spark, [10 + i for i in range(50)])
    b = _hist(spark, [10000 + 7 * i for i in range(50)])
    out = histogram_drift(a, b, ["g"]).first()
    assert out.psi > 0.25  # "action" territory on disjoint ranges
    assert out.jsd == pytest.approx(math.log(2.0), abs=1e-6)
    assert out.tv == pytest.approx(1.0, abs=1e-6)


def test_histogram_drift_matches_drift_report_scalars(spark):
    """histogram_drift over int_histogram states == drift_scalars over
    the equivalent explicit bucket binning: same math, two entry
    points."""
    from record_linkage_spark.operators.drift import histogram_drift

    a_vals = [5, 6, 7, 40, 41, 300]
    b_vals = [5, 6, 40, 300, 301, 302]
    a, b = _hist(spark, a_vals), _hist(spark, b_vals)
    out = histogram_drift(a, b, ["g"]).first()
    # independent python replay over the same bucket ids
    from record_linkage_spark.operators.sketches import _hist_bucket  # noqa

    def buckets(vals):
        rows = (
            spark.createDataFrame([(v,) for v in vals], "v long")
            .select(_hist_bucket("v", 4).alias("b"))
            .collect()
        )
        from collections import Counter

        return Counter(r.b for r in rows)

    import math

    ca, cb = buckets(a_vals), buckets(b_vals)
    na, nb = sum(ca.values()), sum(cb.values())
    keys = set(ca) | set(cb)
    psi = jsd = tv = 0.0
    for k in keys:
        pa, pb = ca.get(k, 0) / na, cb.get(k, 0) / nb
        pac, pbc = max(pa, 1e-6), max(pb, 1e-6)
        psi += (pac - pbc) * math.log(pac / pbc)
        m = (pa + pb) / 2
        if pa > 0:
            jsd += pa * math.log(pa / m) / 2
        if pb > 0:
            jsd += pb * math.log(pb / m) / 2
        tv += abs(pa - pb) / 2
    assert out.psi == pytest.approx(psi, abs=1e-6)
    assert out.jsd == pytest.approx(jsd, abs=1e-6)
    assert out.tv == pytest.approx(tv, abs=1e-6)
    assert out.n_bins == len(keys)
