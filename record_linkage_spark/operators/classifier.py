"""Fellegi-Sunter-style pairwise classifier (M2/M3/M6/A7).

Training uses ``pyspark.ml`` LogisticRegression over the (by construction
small) labeled GT sample — distributed fit, reference semantics of
``logistic_regression.py:128-174``'s sklearn grid. Scoring NEVER uses the
fitted model object's ``transform``: the learned weights are extracted to
plain floats and scoring is a single codegen'd column expression
``sigmoid(w · f + b)`` — the weight vector rides into executors as
literals, so the 10^12-pair scoring path has zero Python and no ML-lib
overhead (reference M3, ``logistic_regression.py:177-205``).

The decision threshold is tuned with one explode+aggregate sweep
(A7, ``logistic_regression.py:110-125``): thresholds × scored rows ->
groupBy(threshold) -> F1 from conditional sums -> argmax. One shuffle, no
driver loop over thresholds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.config import (
    THRESHOLD_GRID_START,
    THRESHOLD_GRID_STEP,
    THRESHOLD_GRID_STOP,
)
from record_linkage_spark.operators.features import FEATURE_NAMES


@dataclass
class LinearModel:
    weights: list[float]
    intercept: float
    threshold: float = 0.5
    feature_names: tuple[str, ...] = tuple(FEATURE_NAMES)

    def to_dict(self) -> dict:
        return {
            "weights": self.weights,
            "intercept": self.intercept,
            "threshold": self.threshold,
            "feature_names": list(self.feature_names),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LinearModel":
        return cls(
            weights=list(d["weights"]),
            intercept=float(d["intercept"]),
            threshold=float(d.get("threshold", 0.5)),
            feature_names=tuple(d.get("feature_names", FEATURE_NAMES)),
        )


def _fit_lr_numpy(X, y, reg: float = 0.0, max_iter: int = 50, tol: float = 1e-8):
    """Driver-side logistic regression via IRLS (Newton) — deterministic,
    no Spark jobs. X: (n, d) float64, y: (n,) {0,1}. Returns (w, b)."""
    import numpy as np

    n, d = X.shape
    Xb = np.hstack([X, np.ones((n, 1))])
    beta = np.zeros(d + 1)
    lam = np.full(d + 1, reg * n)
    lam[-1] = 0.0  # don't regularize the intercept
    for _ in range(max_iter):
        z = Xb @ beta
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        W = np.maximum(p * (1 - p), 1e-10)
        grad = Xb.T @ (p - y) + lam * beta
        H = (Xb * W[:, None]).T @ Xb + np.diag(lam + 1e-8)
        step = np.linalg.solve(H, grad)
        beta = beta - step
        if float(np.abs(step).max()) < tol:
            break
    return beta[:-1], float(beta[-1])


def train_logistic_regression(
    train_pairs: DataFrame,
    feature_names: list[str] | None = None,
    reg_grid: tuple[float, ...] = (0.0, 0.01, 0.1),
    val_pairs: DataFrame | None = None,
) -> LinearModel:
    """Fit LR on featurized labeled pairs; small grid over regParam picked
    by validation F1 (reference's C x class_weight grid, M2,
    ``logistic_regression.py:128-174``).

    The labeled GT sample is small by construction (the reference fits
    sklearn on one node), so the fit runs driver-side on the collected
    feature matrix — ONE Spark job to collect instead of ~100 treeAggregate
    jobs per regParam from ``pyspark.ml``; scoring stays fully distributed
    via :func:`score_pairs` column expressions.
    """
    import numpy as np

    names = feature_names or FEATURE_NAMES
    rows = train_pairs.select(
        F.array(*[F.col(n).cast("double") for n in names]).alias("fv"),
        F.col("label").cast("double").alias("label"),
    ).collect()
    X = np.array([r.fv for r in rows], dtype=np.float64)
    y = np.array([r.label for r in rows], dtype=np.float64)
    if X.size == 0:
        return LinearModel(
            weights=[0.0] * len(names), intercept=0.0, feature_names=tuple(names)
        )

    best: tuple[float, LinearModel] | None = None
    for reg in reg_grid:
        w, b = _fit_lr_numpy(X, y, reg=reg)
        model = LinearModel(
            weights=[float(v) for v in w], intercept=b, feature_names=tuple(names)
        )
        if val_pairs is None:
            best = (0.0, model)
            break
        scored = score_pairs(val_pairs, model)
        thr, f1 = tune_threshold(scored)
        model.threshold = thr
        if best is None or f1 > best[0]:
            best = (f1, model)
    assert best is not None
    return best[1]


def score_expr(model: LinearModel) -> F.Column:
    """sigmoid(w · features + b) as a pure column expression."""
    z = F.lit(model.intercept)
    for name, w in zip(model.feature_names, model.weights):
        z = z + F.col(name) * F.lit(float(w))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def explain_pairs(
    featurized: DataFrame,
    model: LinearModel,
    top_k: int = 5,
    id_cols: tuple[str, str] = ("id_A", "id_B"),
) -> DataFrame:
    """Per-pair score attribution — the Splink-waterfall analogue for
    the linear scorer: every feature's additive contribution w_i·x_i to
    the log-odds, ranked by |contribution| (ties → feature name asc),
    top_k per pair. The answer to "WHY did these two records match?",
    which a reviewer needs before accepting a merge.

    Pure Catalyst: the contribution structs build in one projected
    array, `array_sort` with a comparator gives the canonical order,
    `slice` bounds the explode to top_k — no window, no shuffle beyond
    whatever produced ``featurized``. Missing features explain as 0
    contribution (the default-0 scoring convention of
    :func:`score_pairs`).

    Returns one row per (pair, rank): id cols, score, rank (1-based),
    feature, value, contribution (value/contribution rounded to 6).
    The intercept is a per-model constant (``model.intercept``), not a
    row."""
    contribs = F.array(
        *[
            F.struct(
                F.lit(name).alias("feature"),
                F.coalesce(F.col(name).cast("double"), F.lit(0.0)).alias(
                    "value"
                ),
                (
                    F.lit(float(w))
                    * F.coalesce(F.col(name).cast("double"), F.lit(0.0))
                ).alias("contribution"),
            )
            for name, w in zip(model.feature_names, model.weights)
        ]
    )

    def cmp(left, right):
        la, ra = F.abs(left["contribution"]), F.abs(right["contribution"])
        return (
            F.when(la > ra, F.lit(-1))
            .when(la < ra, F.lit(1))
            .when(left["feature"] < right["feature"], F.lit(-1))
            .when(left["feature"] > right["feature"], F.lit(1))
            .otherwise(F.lit(0))
        )

    top = F.slice(F.array_sort(contribs, cmp), 1, top_k)
    base = (
        score_pairs(featurized, model)
        .withColumn("_top", top)
        .select(
            *id_cols,
            "score",
            F.posexplode("_top").alias("_r0", "_c"),
        )
    )
    return base.select(
        *id_cols,
        "score",
        (F.col("_r0") + 1).cast("int").alias("rank"),
        F.col("_c.feature").alias("feature"),
        F.round("_c.value", 6).alias("value"),
        F.round("_c.contribution", 6).alias("contribution"),
    )


def score_pairs(featurized: DataFrame, model: LinearModel) -> DataFrame:
    """Add ``score`` and ``pred`` columns; missing-feature pairs score 0
    (reference default-0 convention, ``logistic_regression.py:188-198``)."""
    score = score_expr(model)
    any_null = F.lit(False)
    for name in model.feature_names:
        any_null = any_null | F.col(name).isNull()
    score = F.when(any_null, F.lit(0.0)).otherwise(score)
    return featurized.withColumn("score", score).withColumn(
        "pred", (F.col("score") >= F.lit(model.threshold)).cast("int")
    )


def threshold_grid() -> list[float]:
    grid, t = [], THRESHOLD_GRID_START
    while t <= THRESHOLD_GRID_STOP + 1e-9:
        grid.append(round(t, 2))
        t += THRESHOLD_GRID_STEP
    return grid


def tune_threshold(scored: DataFrame, grid: list[float] | None = None) -> tuple[float, float]:
    """A7 as one explode + conditional aggregate; returns (best_tau, best_f1).

    Ties break toward the lower threshold, matching the reference's
    strictly-greater update in its sweep loop.
    """
    taus = grid or threshold_grid()
    g = scored.select(
        "label",
        "score",
        F.explode(F.array(*[F.lit(t) for t in taus])).alias("tau"),
    )
    agg = (
        g.groupBy("tau")
        .agg(
            F.sum(F.when((F.col("score") >= F.col("tau")) & (F.col("label") == 1), 1).otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("score") >= F.col("tau")) & (F.col("label") == 0), 1).otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("score") < F.col("tau")) & (F.col("label") == 1), 1).otherwise(0)).alias("fn"),
        )
        .withColumn(
            "f1",
            F.when(
                (F.col("tp") + F.col("fp") > 0) & (F.col("tp") + F.col("fn") > 0),
                2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy(F.desc("f1"), F.asc("tau"))
    )
    row = agg.first()
    if row is None:
        return 0.5, 0.0
    return float(row.tau), float(row.f1)
