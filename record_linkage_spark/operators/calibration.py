"""Match-score calibration: isotonic (PAV) and Platt scaling, plus a
reliability / expected-calibration-error report.

Why this exists: the reference's classifier (M2/M6,
``/root/reference/src/matching/logistic_regression.py``) emits sigmoid
scores and a tuned THRESHOLD — enough for link/non-link decisions, but a
production linkage pipeline also consumes the score as a match
PROBABILITY (review-queue prioritization, expected-error accounting,
cost-weighted clerical routing a la Fellegi-Sunter's error bounds). A
sigmoid trained on a resampled pair set is systematically miscalibrated
(the stratified-negative X2 sampling shifts the base rate), so we ship
the two standard post-hoc calibrators (Platt 1999; Zadrozny & Elkan
KDD'02 for isotonic/PAV) and the diagnostic that shows whether you need
them (reliability diagram + ECE, Guo et al. ICML'17 formulation).

Scale shape (the part that must survive 100 TB of scored pairs):

- Everything that touches the full scored-pair table is ONE map-side-
  combinable groupBy onto ``n_bins`` rows (the score histogram with
  label sums). The bin table is the SUFFICIENT STATISTIC for both
  calibrators AND the reliability report — pairs are never collected,
  never re-shuffled, never iterated over.
- The PAV pool-adjacent-violators merge runs driver-side on the
  <= ``n_bins`` bin rows (same bounded-collect defense as the ECM
  pattern-table fit: the collect size is a constructor constant, not a
  function of data volume). Platt's Newton fit consumes the same bins.
- Applying a calibrator is a broadcast equality join on the bin id
  (isotonic — the mapping table is <= n_bins rows) or a two-literal
  codegen expression (Platt). Zero Python on the data path either way.

The reliability report is plain SQL and rides the driver's DuckDB
oracle (chk='reliab'/'ece' folds); PAV and Platt are iterative and are
pinned by ``tests/test_calibration.py`` against pure-python references.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 100,
) -> DataFrame:
    """Histogram of scores with label sums: ``(bin, n, n_pos)``.

    ``bin = floor(score * n_bins)`` clamped to ``[0, n_bins - 1]`` so a
    score of exactly 1.0 lands in the top bin. One partial-aggregated
    groupBy; the output is <= ``n_bins`` rows regardless of input size —
    the sufficient statistic for every calibrator in this module.
    """
    b = F.floor(F.col(score_col) * n_bins).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    return (
        scored.select(
            b.alias("bin"), F.col(label_col).cast("long").alias("_y")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_pos"))
    )


def _pav(pairs: list[tuple[float, float, float]]) -> list[float]:
    """Pool-adjacent-violators on (x-order, weight, mean) blocks.

    ``pairs`` is [(x, w, y_mean)] sorted ascending by x; returns the
    isotonic (non-decreasing) fitted mean per input element. Pure
    python, O(n) with the classic block stack.
    """
    blocks: list[list[float]] = []  # [sum_wy, sum_w, count]
    for _, w, y in pairs:
        blocks.append([w * y, w, 1])
        while len(blocks) >= 2 and (
            blocks[-2][0] / blocks[-2][1] >= blocks[-1][0] / blocks[-1][1]
        ):
            b2 = blocks.pop()
            blocks[-1][0] += b2[0]
            blocks[-1][1] += b2[1]
            blocks[-1][2] += b2[2]
    out: list[float] = []
    for swy, sw, cnt in blocks:
        out.extend([swy / sw] * cnt)
    return out


def isotonic_calibrate(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 100,
    smoothing: float = 1.0,
) -> DataFrame:
    """Fit isotonic calibration on the bin table; return the mapping
    ``(bin int, p_cal double)`` as a DataFrame (broadcastable, <= n_bins
    rows) for :func:`apply_isotonic`.

    Per-bin rate is Laplace-smoothed (``(n_pos + s/2) / (n + s)``) so
    empty-ish tail bins don't pin the fit to 0/1; PAV then enforces
    monotone non-decreasing probability in score — the shape constraint
    that makes the calibrated score safe to threshold anywhere. The
    only collect is the <= ``n_bins``-row bin table (ECM's bounded-
    driver defense); empty input returns an empty mapping.
    """
    rows = score_bins(scored, score_col, label_col, n_bins).collect()
    if not rows:
        return scored.sparkSession.createDataFrame([], "bin int, p_cal double")
    rows.sort(key=lambda r: r.bin)
    pairs = [
        (
            float(r.bin),
            float(r.n),
            (float(r.n_pos) + smoothing / 2.0) / (float(r.n) + smoothing),
        )
        for r in rows
    ]
    fitted = _pav(pairs)
    data = [(int(r.bin), float(p)) for r, p in zip(rows, fitted)]
    return scored.sparkSession.createDataFrame(data, "bin int, p_cal double")


def apply_isotonic(
    scored: DataFrame,
    mapping: DataFrame,
    score_col: str = "score",
    n_bins: int = 100,
    out_col: str = "p_cal",
) -> DataFrame:
    """Attach the calibrated probability via a broadcast equality join
    on the bin id. Scores falling in bins the fit never saw (possible
    when applying to NEW data) take the nearest seen bin's value —
    implemented as a coalesce over the as-of-style nearest join kept
    deliberately simple: exact bin first, else the global fit bounds.
    """
    b = F.floor(F.col(score_col) * n_bins).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    stats = mapping.agg(
        F.min_by("p_cal", "bin").alias("p_lo"),
        F.max_by("p_cal", "bin").alias("p_hi"),
        F.min("bin").alias("b_lo"),
    ).collect()[0]
    out = scored.withColumn("_bin", b).join(
        F.broadcast(mapping.withColumnRenamed("bin", "_bin")), "_bin", "left"
    )
    fallback = F.when(F.col("_bin") < F.lit(stats.b_lo), F.lit(stats.p_lo)).otherwise(
        F.lit(stats.p_hi)
    )
    return out.withColumn(out_col, F.coalesce("p_cal", fallback)).drop(
        "_bin", *(["p_cal"] if out_col != "p_cal" else [])
    )


def platt_calibrate(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 256,
    max_iter: int = 50,
) -> tuple[float, float]:
    """Platt scaling ``p = sigmoid(A*s + B)`` fit by Newton's method on
    the binned sufficient statistics (bin-midpoint score, n, n_pos) —
    the binning error is <= 1/(2*n_bins) in s, immaterial next to the
    calibration error Platt corrects. Uses Platt's target smoothing
    ((n_pos+1)/(n+2)-style priors per his 1999 recipe, applied at the
    bin level). Returns (A, B) literals for :func:`platt_expr`.
    """
    rows = score_bins(scored, score_col, label_col, n_bins).collect()
    if not rows:
        return 1.0, 0.0
    pts = [
        ((r.bin + 0.5) / n_bins, float(r.n), float(r.n_pos)) for r in rows
    ]
    n_tot = sum(p[1] for p in pts)
    pos_tot = sum(p[2] for p in pts)
    # Platt's smoothed targets at the aggregate level
    t_hi = (pos_tot + 1.0) / (pos_tot + 2.0)
    t_lo = 1.0 / ((n_tot - pos_tot) + 2.0)
    a, b = 1.0, 0.0
    for _ in range(max_iter):
        g_a = g_b = h_aa = h_ab = h_bb = 0.0
        for s, n, npos in pts:
            t = npos / n * t_hi + (1.0 - npos / n) * t_lo
            z = a * s + b
            p = 1.0 / (1.0 + math.exp(-max(-35.0, min(35.0, z))))
            # weighted Bernoulli log-likelihood gradient / Hessian
            g = n * (p - t)
            h = max(n * p * (1.0 - p), 1e-12)
            g_a += g * s
            g_b += g
            h_aa += h * s * s
            h_ab += h * s
            h_bb += h
        det = h_aa * h_bb - h_ab * h_ab
        if abs(det) < 1e-18 or len(pts) == 1:
            # singular Hessian: every score in one bin (a saturated
            # scorer) makes the slope unidentifiable — fall back to an
            # intercept-only Newton step, which still recovers the base
            # rate (p = sigmoid(a*s + B) constant and calibrated)
            da, db = 0.0, g_b / h_bb
        else:
            da = (g_a * h_bb - g_b * h_ab) / det
            db = (g_b * h_aa - g_a * h_ab) / det
        a, b = a - da, b - db
        if abs(da) < 1e-10 and abs(db) < 1e-10:
            break
    return float(a), float(b)


def platt_expr(a: float, b: float, score_col: str = "score") -> F.Column:
    """``sigmoid(a*score + b)`` as a pure codegen expression."""
    z = F.lit(a) * F.col(score_col) + F.lit(b)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def reliability_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table: per non-empty bin ``(bin, n, mean_p,
    frac_pos, gap)`` where ``gap = |mean_p - frac_pos|``. ONE grouped
    aggregation onto <= ``n_bins`` rows; plain SQL (driver-oracled as
    the chk='reliab' fold)."""
    b = F.floor(F.col(score_col) * n_bins).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    out = (
        scored.select(
            b.alias("bin"),
            F.col(score_col).cast("double").alias("_p"),
            F.col(label_col).cast("double").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("_p").alias("mean_p"),
            F.avg("_y").alias("frac_pos"),
        )
    )
    return out.withColumn("gap", F.abs(F.col("mean_p") - F.col("frac_pos")))


def expected_calibration_error(report: DataFrame) -> DataFrame:
    """ECE from a :func:`reliability_report` frame: ``sum(n/N * gap)``
    (Guo et al. ICML'17). One aggregate over <= n_bins rows; returns a
    1-row ``(ece double, n double)`` frame."""
    return report.agg(
        (F.sum(F.col("n") * F.col("gap")) / F.sum("n")).alias("ece"),
        F.sum("n").cast("double").alias("n"),
    )
