"""Score calibration: PAV correctness, Platt recovery, ECE improvement,
apply-path plan shape, parallelism invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.calibration import (
    _pav,
    apply_isotonic,
    expected_calibration_error,
    isotonic_calibrate,
    platt_calibrate,
    platt_expr,
    reliability_report,
    score_bins,
)


def _pav_reference(pairs):
    """Independent fixpoint PAV: repeatedly scan for any adjacent
    violation and merge, until monotone. O(n^2) but mechanically
    different from the stack implementation under test."""
    blocks = [[w * y, w, 1] for _, w, y in pairs]
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] >= blocks[i + 1][0] / blocks[i + 1][1]:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                blocks[i][2] += blocks[i + 1][2]
                del blocks[i + 1]
                changed = True
            else:
                i += 1
    out = []
    for swy, sw, cnt in blocks:
        out.extend([swy / sw] * cnt)
    return out


def _hash01(i: int, salt: str) -> float:
    """Deterministic uniform in [0,1) from an integer id."""
    import hashlib

    h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
    return int(h[:12], 16) / float(1 << 48)


def _miscalibrated_rows(n=4000):
    """Scores s ~ U(0,1); true P(y=1) = s^2 — systematically
    overconfident at the top, underconfident nowhere monotone-breaking,
    so isotonic must fix ECE without needing to reorder."""
    rows = []
    for i in range(n):
        s = _hash01(i, "s")
        y = 1 if _hash01(i, "y") < s * s else 0
        rows.append((i, float(s), y))
    return rows


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(
        _miscalibrated_rows(), "id long, score double, label int"
    ).localCheckpoint()


def test_pav_equals_independent_reference():
    for n, salt in ((1, "a"), (2, "b"), (7, "c"), (40, "d"), (200, "e")):
        pairs = [
            (float(i), 1.0 + 3.0 * _hash01(i, salt + "w"), _hash01(i, salt + "y"))
            for i in range(n)
        ]
        got = _pav(pairs)
        want = _pav_reference(pairs)
        assert len(got) == len(want) == n
        for g, w in zip(got, want):
            assert abs(g - w) < 1e-12
        # monotone non-decreasing
        assert all(b >= a - 1e-12 for a, b in zip(got, got[1:]))
        # mass preserved: weighted mean unchanged
        tot_w = sum(p[1] for p in pairs)
        assert abs(
            sum(g * p[1] for g, p in zip(got, pairs)) / tot_w
            - sum(p[1] * p[2] for p in pairs) / tot_w
        ) < 1e-12


def test_score_bins_sufficient_statistic(spark, scored):
    bins = {r.bin: (r.n, r.n_pos) for r in score_bins(scored, n_bins=10).collect()}
    rows = _miscalibrated_rows()
    want = {}
    for _, s, y in rows:
        b = min(max(int(s * 10), 0), 9)
        n, npos = want.get(b, (0, 0))
        want[b] = (n + 1, npos + y)
    assert bins == want


def test_isotonic_mapping_is_monotone_and_bounded(spark, scored):
    m = isotonic_calibrate(scored, n_bins=50).orderBy("bin").collect()
    vals = [r.p_cal for r in m]
    assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:]))
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_isotonic_improves_ece(spark, scored):
    m = isotonic_calibrate(scored, n_bins=50)
    cal = apply_isotonic(scored, m, n_bins=50)
    ece_raw = expected_calibration_error(
        reliability_report(scored, "score", "label")
    ).collect()[0].ece
    ece_cal = expected_calibration_error(
        reliability_report(cal, "p_cal", "label")
    ).collect()[0].ece
    # s^2 miscalibration gives a raw ECE ~0.16; isotonic should crush it
    assert ece_raw > 0.1
    assert ece_cal < ece_raw / 3.0


def test_apply_isotonic_unseen_bin_fallback(spark):
    base = spark.createDataFrame(
        [(i, 0.4 + 0.2 * _hash01(i, "m"), int(_hash01(i, "l") < 0.5)) for i in range(500)],
        "id long, score double, label int",
    )
    m = isotonic_calibrate(base, n_bins=20)
    seen = {r.bin for r in m.collect()}
    assert 0 not in seen and 19 not in seen  # scores confined to [0.4, 0.6)
    probe = spark.createDataFrame(
        [(1, 0.01), (2, 0.99)], "id long, score double"
    )
    got = {r.id: r.p_cal for r in apply_isotonic(probe, m, n_bins=20).collect()}
    lo = m.orderBy("bin").first().p_cal
    hi = m.orderBy(F.desc("bin")).first().p_cal
    assert got[1] == pytest.approx(lo)
    assert got[2] == pytest.approx(hi)


def test_platt_recovers_logistic_link(spark):
    # labels drawn from sigmoid(4*s - 2): Platt should land near (4, -2)
    rows = []
    for i in range(8000):
        s = _hash01(i, "ps")
        p = 1.0 / (1.0 + math.exp(-(4.0 * s - 2.0)))
        rows.append((i, float(s), 1 if _hash01(i, "py") < p else 0))
    df = spark.createDataFrame(rows, "id long, score double, label int")
    a, b = platt_calibrate(df)
    assert a == pytest.approx(4.0, abs=0.6)
    assert b == pytest.approx(-2.0, abs=0.4)
    out = df.select(platt_expr(a, b).alias("p")).agg(
        F.min("p"), F.max("p")
    ).collect()[0]
    assert 0.0 < out[0] < out[1] < 1.0


def test_isotonic_parallelism_invariance(spark, scored):
    m1 = isotonic_calibrate(scored, n_bins=50).collect()
    m2 = isotonic_calibrate(scored.repartition(13), n_bins=50).collect()
    assert sorted((r.bin, round(r.p_cal, 12)) for r in m1) == sorted(
        (r.bin, round(r.p_cal, 12)) for r in m2
    )


def test_apply_path_is_broadcast_no_python(spark, scored):
    m = isotonic_calibrate(scored, n_bins=50)
    plan = (
        apply_isotonic(scored, m, n_bins=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_empty_input(spark):
    empty = spark.createDataFrame([], "id long, score double, label int")
    assert isotonic_calibrate(empty).count() == 0
    assert platt_calibrate(empty) == (1.0, 0.0)


def test_platt_single_bin_falls_back_to_intercept(spark):
    """A saturated scorer (every score in one bin) makes the slope
    unidentifiable; Platt must still recover the base rate via the
    intercept instead of returning the (1, 0) defaults."""
    rows = [(0.999, 1)] * 100 + [(0.9995, 0)] * 200
    df = spark.createDataFrame(rows, "score double, label int")
    a, b = platt_calibrate(df)
    p = 1.0 / (1.0 + math.exp(-(a * 0.9992 + b)))
    assert p == pytest.approx(1.0 / 3.0, abs=0.02)
