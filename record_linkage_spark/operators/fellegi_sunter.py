"""Fellegi-Sunter probabilistic record linkage (JASA 1969): the classic
log-likelihood-ratio scorer over a binary comparison vector, with the
original three-way decision rule (link / possible link / non-link).

The engine's main scorer is LR over the 16-dim comparison vector
(``operators/classifier.py``, SURVEY §2 M2/M3 — the reference's model,
``src/matching/logistic_regression.py``); this module adds the textbook
probabilistic alternative every ER toolkit ships (cf. the
``recordlinkage`` library's ECM/NaiveBayes classifiers): per-feature
agreement probabilities m_i = P(agree_i | match) and
u_i = P(agree_i | unmatch) estimated from labeled pairs, each pair
scored by the summed log2 likelihood ratio

    w = Σ_i  agree_i ? log2(m_i / u_i) : log2((1-m_i) / (1-u_i))

and classified against an (upper, lower) threshold band — scores above
``upper`` link, below ``lower`` reject, between them land in the
clerical-review band.

Scale shape: estimation aggregates the (small, labeled) ground-truth
pair table to 2×k numbers and collects ONE row — the same bounded
driver-side fit the LR trainer defends (``classifier.py:103``). Scoring
is a pure column expression (a sum of ``when``s with literal weights):
whole-stage-codegen, zero Python, zero shuffle — it fuses into whatever
plan produced the comparison vectors.
"""

from __future__ import annotations

from math import log, log2
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def estimate_mu(
    labeled: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    smoothing: float = 0.5,
) -> dict[str, tuple[float, float]]:
    """Estimate (m_i, u_i) per feature from a labeled pair table whose
    feature columns are agreement indicators in [0, 1] (values >= 0.5
    count as agreement, matching the comparison-vector convention).
    Laplace-smoothed (``smoothing`` pseudo-agreements and
    pseudo-disagreements per class) so no weight is ever ±inf. One
    aggregate job, one collected row."""
    agree = {c: (F.col(c) >= F.lit(0.5)).cast("double") for c in feature_cols}
    is_m = F.col(label_col) == 1
    aggs = []
    for c in feature_cols:
        aggs.append(F.sum(F.when(is_m, agree[c])).alias(f"m_a_{c}"))
        aggs.append(F.sum(F.when(~is_m, agree[c])).alias(f"u_a_{c}"))
    aggs.append(F.sum(is_m.cast("double")).alias("n_m"))
    aggs.append(F.sum((~is_m).cast("double")).alias("n_u"))
    row = labeled.agg(*aggs).first().asDict()
    out: dict[str, tuple[float, float]] = {}
    for c in feature_cols:
        m = ((row[f"m_a_{c}"] or 0.0) + smoothing) / (row["n_m"] + 2 * smoothing)
        u = ((row[f"u_a_{c}"] or 0.0) + smoothing) / (row["n_u"] + 2 * smoothing)
        out[c] = (m, u)
    return out


def fs_weight_expr(weights: Mapping[str, tuple[float, float]]) -> Column:
    """Summed log2-likelihood-ratio column over agreement indicators,
    with the (m, u) pairs baked in as literals — pure codegen, no UDF."""
    total = F.lit(0.0)
    for c, (m, u) in weights.items():
        agree_w = F.lit(log2(m / u))
        disagree_w = F.lit(log2((1.0 - m) / (1.0 - u)))
        total = total + F.when(F.col(c) >= F.lit(0.5), agree_w).otherwise(
            disagree_w
        )
    return total


def fs_score(
    pairs: DataFrame,
    weights: Mapping[str, tuple[float, float]],
    out_col: str = "fs_weight",
) -> DataFrame:
    """Attach the Fellegi-Sunter composite weight to a comparison-vector
    pair table."""
    return pairs.withColumn(out_col, fs_weight_expr(weights))


def fs_classify(
    pairs: DataFrame,
    weights: Mapping[str, tuple[float, float]],
    upper: float,
    lower: float,
    out_col: str = "fs_decision",
) -> DataFrame:
    """The original three-way decision rule: weight > upper -> 'link',
    weight < lower -> 'non_link', otherwise 'possible' (the clerical
    review band). ``upper >= lower`` is required."""
    if upper < lower:
        raise ValueError(f"upper ({upper}) must be >= lower ({lower})")
    w = fs_weight_expr(weights)
    return pairs.withColumn("fs_weight", w).withColumn(
        out_col,
        F.when(F.col("fs_weight") > upper, "link")
        .when(F.col("fs_weight") < lower, "non_link")
        .otherwise("possible"),
    )


def ecm_estimate(
    pairs: DataFrame,
    feature_cols: Sequence[str],
    max_iter: int = 200,
    tol: float = 1e-7,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
    eps: float = 1e-6,
) -> dict:
    """UNSUPERVISED (m, u, p) estimation — the ECM/EM fit of the
    Fellegi-Sunter mixture (Winkler 1988; the ``recordlinkage`` library's
    ECMClassifier): no labels needed, the comparison vectors themselves
    are modeled as a two-component product-of-Bernoullis mixture with
    match prevalence p.

    Distributed shape: the ONLY cluster job is one aggregation that
    groups pairs by their binarized comparison PATTERN — at most 2^k
    distinct rows for k features, independent of pair count — and EM
    iterates driver-side over that tiny (pattern, count) table. The
    same bounded-driver defense as the LR fit, but here the collected
    table is provably <= 2^k rows, not just "the labeled sample".

    Returns ``{"p": float, "weights": {col: (m, u)}, "iters": int}`` —
    ``weights`` plugs straight into :func:`fs_weight_expr` /
    :func:`fs_classify`."""
    cols = list(feature_cols)
    binarized = [(F.col(c) >= F.lit(0.5)).cast("int").alias(c) for c in cols]
    rows = (
        pairs.select(*binarized)
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    patterns = [([float(r[c]) for c in cols], float(r["_n"])) for r in rows]
    total = sum(n for _, n in patterns)
    if total == 0:
        raise ValueError("ecm_estimate needs at least one pair")

    p = init_p
    m = [init_m] * len(cols)
    u = [init_u] * len(cols)

    def clamp(x: float) -> float:
        return min(1.0 - eps, max(eps, x))

    prev_ll = None
    iters = 0
    for iters in range(1, max_iter + 1):
        # E-step over patterns
        sw = 0.0                       # Σ n·w
        swg = [0.0] * len(cols)        # Σ n·w·g_i
        sug = [0.0] * len(cols)        # Σ n·(1-w)·g_i
        ll = 0.0
        for g, n in patterns:
            pm, pu = p, 1.0 - p
            for i, gi in enumerate(g):
                pm *= m[i] if gi else (1.0 - m[i])
                pu *= u[i] if gi else (1.0 - u[i])
            z = pm + pu
            w = pm / z
            ll += n * log(z)
            sw += n * w
            for i, gi in enumerate(g):
                if gi:
                    swg[i] += n * w
                    sug[i] += n * (1.0 - w)
        # M-step
        p = clamp(sw / total)
        su = total - sw
        m = [clamp(swg[i] / sw) for i in range(len(cols))]
        u = [clamp(sug[i] / su) for i in range(len(cols))]
        if prev_ll is not None and abs(ll - prev_ll) < tol * abs(prev_ll):
            break
        prev_ll = ll

    return {
        "p": p,
        "weights": {c: (m[i], u[i]) for i, c in enumerate(cols)},
        "iters": iters,
    }


def fs_tf_adjusted_score(
    pairs: DataFrame,
    records: DataFrame,
    value_col: str,
    m: float,
    value_a: str | None = None,
    value_b: str | None = None,
    out_col: str = "fs_tf_weight",
    u_floor: float = 1e-9,
) -> DataFrame:
    """Term-frequency-adjusted agreement weight for ONE field (the
    Splink-style tf adjustment): agreeing on a COMMON value is weak
    evidence, agreeing on a rare one is strong, so the agreement weight
    log2(m / u) replaces the global u with the VALUE's own random-match
    probability u_v = tf(v) = count(v) / N. Disagreement keeps the
    global-u weight log2((1-m) / (1-u_bar)) with
    u_bar = Σ tf(v)^2 (the probability two random records agree at all).

    Scale shape: the tf table is one groupBy on the field (map-side
    combinable) carrying (value, tf) only; pairs join it on the agreed
    value — an equality join sized by distinct values, never broadcast-
    assumed. u_bar is a single-row aggregate. Everything else is codegen.

    ``pairs`` must carry the field's two sides (default
    ``{value_col}_A`` / ``{value_col}_B``). Returns ``pairs`` +
    ``out_col`` (double)."""
    va = value_a or f"{value_col}_A"
    vb = value_b or f"{value_col}_B"
    n_total = records.count()
    tf = (
        records.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_tf_v"))
        .agg((F.count(F.lit(1)) / F.lit(float(n_total))).alias("_tf"))
    )
    u_bar_row = tf.agg(F.sum(F.col("_tf") * F.col("_tf")).alias("u")).first()
    u_bar = min(1.0 - 1e-9, max(u_floor, float(u_bar_row.u or u_floor)))
    disagree_w = log2((1.0 - m) / (1.0 - u_bar))

    agree = F.col(va).isNotNull() & F.col(va).eqNullSafe(F.col(vb))
    joined = pairs.join(
        tf, pairs[va] == tf["_tf_v"], "left"
    )
    u_v = F.greatest(F.coalesce(F.col("_tf"), F.lit(u_floor)), F.lit(u_floor))
    w = F.when(
        agree, F.log2(F.lit(float(m)) / u_v)
    ).otherwise(F.lit(disagree_w))
    return joined.withColumn(out_col, w).drop("_tf_v", "_tf")


def fs_thresholds_from_prior(
    p: float,
    link_posterior: float = 0.95,
    non_link_posterior: float = 0.95,
) -> tuple[float, float]:
    """Derive the (upper, lower) decision band from the match prevalence
    ``p`` (e.g. ECM's estimate) and target posteriors — the Fellegi-Sunter
    error-bounded rule in odds form. A pair links when
    P(M | w) >= link_posterior, i.e. when the composite weight exceeds

        upper = log2(odds(link_posterior)) - log2(p / (1 - p))

    and symmetrically for the non-link bound. Plugs ``ecm_estimate``'s
    output straight into :func:`fs_classify`:

        fit = ecm_estimate(pairs, cols)
        hi, lo = fs_thresholds_from_prior(fit["p"])
        fs_classify(pairs, fit["weights"], upper=hi, lower=lo)
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    prior_odds = log2(p / (1.0 - p))
    upper = log2(link_posterior / (1.0 - link_posterior)) - prior_odds
    lower = -log2(non_link_posterior / (1.0 - non_link_posterior)) - prior_odds
    return upper, lower
