"""Global evaluation: reconstruct full-GT predictions and confusion metrics.

Reference ``src/evaluation/compare.py``: every labeled GT pair defaults to
pred=0; candidate predictions are overlaid by the canonical
(min(id), max(id)) pair key (J4, ``compare.py:27-55``); TP/FP/FN/TN and
P/R/F1 come from one conditional-aggregate pass (A6, ``compare.py:58-76``).

Spark shape: a single left join + coalesce + one agg — no per-pair Python,
one shuffle on the canonical pair key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.functions.comparators import canonical_pair


def _canonicalized(df: DataFrame) -> DataFrame:
    lo, hi = canonical_pair("id_A", "id_B")
    return df.withColumn("id_lo", lo).withColumn("id_hi", hi)


def global_predictions(gt: DataFrame, scored_candidates: DataFrame) -> DataFrame:
    """gt(id_A, id_B, label) x candidates(id_A, id_B, pred) -> one row per GT
    pair with pred defaulted to 0 for pairs pruned by blocking."""
    g = _canonicalized(gt)
    c = _canonicalized(scored_candidates).select(
        "id_lo", "id_hi", F.col("pred").alias("_cand_pred")
    )
    j = g.join(c, ["id_lo", "id_hi"], "left")
    return j.withColumn("pred", F.coalesce("_cand_pred", F.lit(0))).drop(
        "_cand_pred", "id_lo", "id_hi"
    )


def confusion_metrics(preds: DataFrame) -> dict:
    """TP/FP/FN/TN + precision/recall/F1 in one pass."""
    row = preds.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("pred") == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("pred") == 0), 1).otherwise(0)).alias("tn"),
    ).first()
    tp, fp, fn, tn = (int(row.tp or 0), int(row.fp or 0), int(row.fn or 0), int(row.tn or 0))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def evaluate_global(gt: DataFrame, scored_candidates: DataFrame) -> dict:
    """End-to-end E3 analogue: overlay + confusion metrics."""
    return confusion_metrics(global_predictions(gt, scored_candidates))


def bcubed_metrics(
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_key",
) -> DataFrame:
    """B-cubed cluster-quality metrics (Bagga & Baldwin 1998): per record,
    precision = |its cluster ∩ its truth class| / |its cluster| and
    recall = |∩| / |its truth class|; the scores average over records.
    The standard extrinsic metric for entity-resolution clusterings —
    unlike pairwise F1 it doesn't quadratically over-weight big clusters.

    Returns one row: (bcubed_precision, bcubed_recall, bcubed_f1, n_records).

    Scale shape: one inner join on the record id, then three aggregations
    keyed on cluster, class, and (cluster, class) — every group is a real
    cluster/class (bounded by blocking), no pair enumeration anywhere; the
    per-record averages fold into a single final aggregate. All joins are
    equality joins; the per-group size frames broadcast when small.
    """
    a = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
    )
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_k"))
    j = a.join(t, "_id")
    nc = j.groupBy("_c").agg(F.count("*").alias("_nc"))
    nk = j.groupBy("_k").agg(F.count("*").alias("_nk"))
    nck = j.groupBy("_c", "_k").agg(F.count("*").alias("_nck"))
    per = (
        j.join(nck, ["_c", "_k"])
        .join(nc, "_c")
        .join(nk, "_k")
        .select(
            (F.col("_nck") / F.col("_nc")).alias("_p"),
            (F.col("_nck") / F.col("_nk")).alias("_r"),
        )
    )
    out = per.agg(
        F.avg("_p").alias("p"),
        F.avg("_r").alias("r"),
        F.count("*").cast("long").alias("n_records"),
    )
    return out.select(
        F.round("p", 6).alias("bcubed_precision"),
        F.round("r", 6).alias("bcubed_recall"),
        F.round(
            F.when(
                F.col("p") + F.col("r") > 0,
                2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("bcubed_f1"),
        "n_records",
    )


def _sum_c2(df: DataFrame, count_col: str):
    """sum over groups of C(n, 2) as decimal(38,0) — pair counts overflow
    a long once any side exceeds ~4.3e9 records, which a 10^12-turn corpus
    does; decimal keeps the arithmetic exact."""
    n = F.col(count_col).cast("decimal(19,0)")
    s = df.agg(F.sum(n * (n - 1)).alias("_s")).select(
        (F.col("_s") / 2).cast("decimal(38,0)").alias("c2")
    )
    return s


def pair_counting_metrics(
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_key",
) -> DataFrame:
    """Pair-counting cluster-quality metrics: pairwise precision/recall/F1,
    Rand index, and Adjusted Rand Index (Hubert & Arabie 1985) — the
    second standard extrinsic ER clustering family next to B-cubed
    (:func:`bcubed_metrics`). Pairwise F1 is what the reference's labeled
    evaluation approximates on its sampled pairs; this computes it exactly
    over ALL implied pairs, and ARI corrects it for chance agreement.

    Everything reduces to three sums of C(n, 2) over the cluster/class
    contingency table: same-cluster-same-class pairs (tp), same-cluster
    pairs, and same-class pairs. Scale shape: ONE shuffle builds the
    (cluster, class, count) contingency frame; cluster and class sizes
    re-aggregate from it (they are its marginals), so no second pass over
    the records; the final combine is a cross join of three single-row
    frames. No pair enumeration anywhere — cost is O(records) + O(distinct
    contingency cells). Pair counts are decimal(38,0) (a long overflows
    at ~4.3e9 records per side).

    Returns one row: n_records, tp/fp/fn/tn pair counts,
    pairwise_precision/recall/f1, rand_index, adjusted_rand (ratios as
    doubles rounded to 6; ARI = 1.0 when both partitions are trivial and
    identical, matching the scikit-learn convention).
    """
    a = assignments.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c"))
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_k"))
    cont = a.join(t, "_id").groupBy("_c", "_k").agg(F.count("*").alias("_n"))
    cont = cont.localCheckpoint()  # reused four times below

    tp = _sum_c2(cont, "_n").withColumnRenamed("c2", "tp")
    pred = _sum_c2(cont.groupBy("_c").agg(F.sum("_n").alias("_n")), "_n")
    pred = pred.withColumnRenamed("c2", "pred_pairs")
    true_ = _sum_c2(cont.groupBy("_k").agg(F.sum("_n").alias("_n")), "_n")
    true_ = true_.withColumnRenamed("c2", "true_pairs")
    n_row = cont.agg(F.sum("_n").cast("decimal(19,0)").alias("n"))
    tot = n_row.select(
        F.col("n"),
        ((F.col("n") * (F.col("n") - 1)) / 2).cast("decimal(38,0)").alias("tot"),
    )

    s = tp.crossJoin(pred).crossJoin(true_).crossJoin(tot)
    s = s.select(
        "*",
        (F.col("pred_pairs") - F.col("tp")).alias("fp"),
        (F.col("true_pairs") - F.col("tp")).alias("fn"),
    ).select(
        "*",
        (F.col("tot") - F.col("pred_pairs") - F.col("fn")).alias("tn"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    expected = d("pred_pairs") * d("true_pairs") / d("tot")
    max_index = (d("pred_pairs") + d("true_pairs")) / 2
    ari = F.when(
        max_index - expected != 0, (d("tp") - expected) / (max_index - expected)
    ).otherwise(F.lit(1.0))  # both partitions trivial and identical
    return s.select(
        F.col("n").cast("decimal(38,0)").alias("n_records"),
        F.col("tp"),
        F.col("fp").cast("decimal(38,0)").alias("fp"),
        F.col("fn").cast("decimal(38,0)").alias("fn"),
        F.col("tn").cast("decimal(38,0)").alias("tn"),
        F.round(
            F.when(d("pred_pairs") > 0, d("tp") / d("pred_pairs")).otherwise(0.0), 6
        ).alias("pairwise_precision"),
        F.round(
            F.when(d("true_pairs") > 0, d("tp") / d("true_pairs")).otherwise(0.0), 6
        ).alias("pairwise_recall"),
        F.round(
            F.when(
                d("pred_pairs") + d("true_pairs") > 0,
                2 * d("tp") / (d("pred_pairs") + d("true_pairs")),
            ).otherwise(0.0),
            6,
        ).alias("pairwise_f1"),
        F.round(
            F.when(d("tot") > 0, (d("tp") + d("tn")) / d("tot")).otherwise(1.0), 6
        ).alias("rand_index"),
        F.round(ari, 6).alias("adjusted_rand"),
    )


def v_measure_metrics(
    assignments: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    truth_col: str = "entity_key",
    beta: float = 1.0,
) -> DataFrame:
    """Entropy-based cluster quality (Rosenberg & Hirschberg EMNLP 2007):
    homogeneity (each cluster holds one class), completeness (each class
    lands in one cluster), their harmonic mean V-measure, plus mutual
    information and sqrt-normalized NMI — the third standard extrinsic
    family next to B-cubed (:func:`bcubed_metrics`) and pair counting
    (:func:`pair_counting_metrics`). Unlike pairwise F1, entropies don't
    quadratically over-weight big clusters, and unlike B-cubed the score
    is symmetric-decomposable into the two failure directions.

    Everything derives from the same (cluster, class, count) contingency
    frame as pair counting: ONE shuffle builds it; cluster/class sizes
    are its re-aggregated marginals; three single-row aggregates combine
    by cross join. Cost is O(records) + O(distinct cells) — no pair
    enumeration, scale-indifferent.

    Conventions match scikit-learn: H(C)=0 → homogeneity 1.0, H(K)=0 →
    completeness 1.0, h+c=0 → v 0.0, H(C)·H(K)=0 → nmi 0.0. Entropies in
    nats, outputs rounded to 6 (computed from unrounded intermediates).

    Returns one row: n_records, h_class, h_cluster,
    h_class_given_cluster, h_cluster_given_class, mutual_info,
    homogeneity, completeness, v_measure, nmi.
    """
    a = assignments.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c"))
    t = truth.select(F.col(id_col).alias("_id"), F.col(truth_col).alias("_k"))
    cont = a.join(t, "_id").groupBy("_c", "_k").agg(F.count("*").alias("_n"))
    cont = cont.localCheckpoint()  # reused by both marginals + the joint agg

    csz = cont.groupBy("_c").agg(F.sum("_n").cast("double").alias("_nc"))
    ksz = cont.groupBy("_k").agg(F.sum("_n").cast("double").alias("_nk"))
    nd = F.col("_n").cast("double")
    joint = (
        cont.join(csz, "_c")
        .join(ksz, "_k")
        .agg(
            F.sum("_n").cast("double").alias("N"),
            F.sum(nd * F.log(nd / F.col("_nc"))).alias("sck"),
            F.sum(nd * F.log(nd / F.col("_nk"))).alias("skc"),
        )
    )
    hk = csz.agg(F.sum(F.col("_nc") * F.log("_nc")).alias("snc"))
    hc = ksz.agg(F.sum(F.col("_nk") * F.log("_nk")).alias("snk"))

    s = joint.crossJoin(hk).crossJoin(hc).select(
        "N",
        (F.log("N") - F.col("snk") / F.col("N")).alias("h_c"),
        (F.log("N") - F.col("snc") / F.col("N")).alias("h_k"),
        (-F.col("sck") / F.col("N")).alias("h_ck"),
        (-F.col("skc") / F.col("N")).alias("h_kc"),
    )
    hom = F.when(F.col("h_c") <= 0, F.lit(1.0)).otherwise(
        1.0 - F.col("h_ck") / F.col("h_c")
    )
    com = F.when(F.col("h_k") <= 0, F.lit(1.0)).otherwise(
        1.0 - F.col("h_kc") / F.col("h_k")
    )
    s = s.select("*", hom.alias("hom"), com.alias("com"))
    b = float(beta)
    v = F.when(
        b * F.col("hom") + F.col("com") > 0,
        (1.0 + b) * F.col("hom") * F.col("com")
        / (b * F.col("hom") + F.col("com")),
    ).otherwise(F.lit(0.0))
    mi = F.col("h_c") - F.col("h_ck")
    nmi = F.when(
        (F.col("h_c") > 0) & (F.col("h_k") > 0),
        mi / F.sqrt(F.col("h_c") * F.col("h_k")),
    ).otherwise(F.lit(0.0))
    return s.select(
        F.col("N").cast("long").alias("n_records"),
        F.round("h_c", 6).alias("h_class"),
        F.round("h_k", 6).alias("h_cluster"),
        F.round("h_ck", 6).alias("h_class_given_cluster"),
        F.round("h_kc", 6).alias("h_cluster_given_class"),
        F.round(mi, 6).alias("mutual_info"),
        F.round("hom", 6).alias("homogeneity"),
        F.round("com", 6).alias("completeness"),
        F.round(v, 6).alias("v_measure"),
        F.round(nmi, 6).alias("nmi"),
    )


def cluster_cohesion(
    assignments: DataFrame,
    scored_pairs: DataFrame,
    threshold: float,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    id_a: str = "id_A",
    id_b: str = "id_B",
    score_col: str = "score",
) -> DataFrame:
    """Per-entity cohesion report — the diagnostics layer for cluster
    REPAIR: transitive closure (or any clustering) can chain records
    together through pairs the scorer itself rated below threshold, and
    blocking leaves many within-cluster pairs never compared at all.
    This surfaces both, per resolved entity:

      n_members        cluster size
      n_scored_within  scored pairs with both endpoints inside the entity
      min_score / avg_score   over those within-pairs (rounded to 6)
      n_conflicts      within-pairs scored BELOW ``threshold`` — evidence
                       the cluster should split
      n_unscored_pairs C(n_members, 2) - n_scored_within — pairs blocking
                       never produced (un-audited glue)

    Entities whose n_conflicts > 0 or whose min_score is far below the
    threshold are split candidates; see :func:`merge_candidates` for the
    dual (cross-entity pairs scoring above threshold).

    Scale shape: two equality joins map pair endpoints to entities (the
    assignment side shuffles on record id — no skew, ids are unique), one
    groupBy per entity for the pair stats, one for sizes, then an equality
    join of two per-entity frames. No pair enumeration beyond the already-
    materialized scored pairs. The unscored count uses decimal C(n, 2)
    (long overflows at ~4.3e9-member clusters).
    """
    a = assignments.select(
        F.col(id_col).alias("_id"), F.col(cluster_col).alias("_e")
    )
    p = scored_pairs.select(
        F.col(id_a).alias("_ia"), F.col(id_b).alias("_ib"), F.col(score_col).alias("_s")
    )
    within = (
        p.join(a.withColumnRenamed("_id", "_ia").withColumnRenamed("_e", "_ea"), "_ia")
        .join(a.withColumnRenamed("_id", "_ib").withColumnRenamed("_e", "_eb"), "_ib")
        .filter(F.col("_ea") == F.col("_eb"))
    )
    pair_stats = within.groupBy(F.col("_ea").alias("entity_id")).agg(
        F.count("*").cast("long").alias("n_scored_within"),
        F.round(F.min("_s"), 6).alias("min_score"),
        F.round(F.avg("_s"), 6).alias("avg_score"),
        F.sum(F.when(F.col("_s") < F.lit(threshold), 1).otherwise(0))
        .cast("long")
        .alias("n_conflicts"),
    )
    sizes = a.groupBy(F.col("_e").alias("entity_id")).agg(
        F.count("*").cast("long").alias("n_members")
    )
    nm = F.col("n_members").cast("decimal(19,0)")
    return (
        sizes.join(pair_stats, "entity_id", "left")
        .select(
            "entity_id",
            "n_members",
            F.coalesce("n_scored_within", F.lit(0)).alias("n_scored_within"),
            "min_score",
            "avg_score",
            F.coalesce("n_conflicts", F.lit(0)).alias("n_conflicts"),
            ((nm * (nm - 1)) / 2).cast("decimal(38,0)").alias("_c2"),
        )
        .withColumn(
            "n_unscored_pairs",
            (F.col("_c2") - F.col("n_scored_within")).cast("decimal(38,0)"),
        )
        .drop("_c2")
    )


def merge_candidates(
    assignments: DataFrame,
    scored_pairs: DataFrame,
    threshold: float,
    id_col: str = "conv_id",
    cluster_col: str = "entity_id",
    id_a: str = "id_A",
    id_b: str = "id_B",
    score_col: str = "score",
) -> DataFrame:
    """The dual of :func:`cluster_cohesion`: entity pairs connected by at
    least one CROSS-entity scored pair at/above ``threshold`` — clusters
    the scorer thinks should merge (e.g. edges a 1:1 constraint or a
    conservative clusterer rejected). Returns one row per unordered
    entity pair: (entity_lo, entity_hi, n_edges, max_score, avg_score).

    Same join shape as cohesion; the groupBy key is the canonical entity
    pair, bounded by the scored-pair count."""
    a = assignments.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_e"))
    p = scored_pairs.select(
        F.col(id_a).alias("_ia"), F.col(id_b).alias("_ib"), F.col(score_col).alias("_s")
    )
    cross = (
        p.join(a.withColumnRenamed("_id", "_ia").withColumnRenamed("_e", "_ea"), "_ia")
        .join(a.withColumnRenamed("_id", "_ib").withColumnRenamed("_e", "_eb"), "_ib")
        .filter(F.col("_ea") != F.col("_eb"))
        .filter(F.col("_s") >= F.lit(threshold))
    )
    return (
        cross.groupBy(
            F.least("_ea", "_eb").alias("entity_lo"),
            F.greatest("_ea", "_eb").alias("entity_hi"),
        )
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.round(F.max("_s"), 6).alias("max_score"),
            F.round(F.avg("_s"), 6).alias("avg_score"),
        )
    )


def average_precision(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    digits: int | None = 6,
) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    interpolation over distinct thresholds — the sklearn
    ``average_precision_score`` definition): AP = sum over distinct
    scores s (descending) of [n_pos(s)/P] * precision_at(s). The PR
    companion to :func:`roc_auc` — preferred when positives are rare
    (linkage pair pools are overwhelmingly negative, so ROC AUC can
    look flattering while precision is poor).

    Same scale shape as roc_auc: pairs aggregate to ONE row per
    distinct rounded score (map-side combine; ``digits`` caps the
    frame's cardinality), the cumulative window runs over that bounded
    frame, never over pairs. Counts stay decimal until the per-row
    precision division. Returns one row (ap, n_pos, n_neg); ap is NULL
    when no positives exist.
    """
    from pyspark.sql.window import Window

    s = (
        F.round(F.col(score_col), digits)
        if digits is not None
        else F.col(score_col)
    )
    g = (
        scored.select(s.alias("_s"), F.col(label_col).alias("_l"))
        .groupBy("_s")
        .agg(
            F.sum(F.when(F.col("_l") == 1, 1).otherwise(0))
            .cast("decimal(19,0)")
            .alias("_np"),
            F.sum(F.when(F.col("_l") == 0, 1).otherwise(0))
            .cast("decimal(19,0)")
            .alias("_nn"),
        )
    )
    w = Window.orderBy(F.col("_s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "_np",
        "_nn",
        F.sum("_np").over(w).alias("_ctp"),
        F.sum("_nn").over(w).alias("_cfp"),
    )
    agg = cum.agg(
        F.sum(
            F.col("_np").cast("double")
            * (
                F.col("_ctp").cast("double")
                / (F.col("_ctp") + F.col("_cfp")).cast("double")
            )
        ).alias("_num"),
        F.sum("_np").alias("_p"),
        F.sum("_nn").alias("_n"),
    )
    return (
        agg.select(
            F.round(
                F.when(
                    F.col("_p") > 0,
                    F.col("_num") / F.col("_p").cast("double"),
                ),
                6,
            ).alias("ap"),
            F.col("_p").cast("decimal(38,0)").alias("n_pos"),
            F.col("_n").cast("decimal(38,0)").alias("n_neg"),
        )
    )


def roc_auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    digits: int | None = 6,
) -> DataFrame:
    """Threshold-free ranking quality: ROC AUC in the Mann-Whitney form
    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg) —
    the natural companion to the fixed-grid threshold sweep (A7), since
    it scores the whole ranking rather than nine operating points.

    Scale shape: NO global sort of the pairs. Scores aggregate to one
    row per DISTINCT score value (pairs_scored -> (score, n_pos, n_neg)
    with map-side combine); the ordered cumulative then runs over that
    bounded frame — ``digits`` rounds scores first, capping distinct
    values at 2*10^digits regardless of corpus size (pass None to rank
    raw scores when their cardinality is known-small). Counts and the
    tie-corrected numerator stay in decimal so 10^12-pair inputs don't
    overflow; the single division happens in double at the end.

    Returns one row: (auc, n_pos, n_neg); auc is NULL when either class
    is absent.
    """
    from pyspark.sql.window import Window

    s = (
        F.round(F.col(score_col), digits)
        if digits is not None
        else F.col(score_col)
    )
    g = (
        scored.select(s.alias("_s"), F.col(label_col).alias("_l"))
        .groupBy("_s")
        .agg(
            F.sum(F.when(F.col("_l") == 1, 1).otherwise(0))
            .cast("decimal(19,0)")
            .alias("_np"),
            F.sum(F.when(F.col("_l") == 0, 1).otherwise(0))
            .cast("decimal(19,0)")
            .alias("_nn"),
        )
    )
    # negatives strictly below each score; the window input is one row
    # per distinct score (bounded by `digits`), not one row per pair
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.withColumn(
        "_cnb",
        F.coalesce(F.sum("_nn").over(w), F.lit(0).cast("decimal(19,0)")),
    )
    agg = cum.agg(
        # 2*numerator = sum np * (2*cum_neg_below + nn) keeps the 0.5 tie
        # credit integral
        F.sum(F.col("_np") * (2 * F.col("_cnb") + F.col("_nn"))).alias("_num2"),
        F.sum("_np").alias("_p"),
        F.sum("_nn").alias("_n"),
    )
    return agg.select(
        F.round(
            F.when(
                (F.col("_p") > 0) & (F.col("_n") > 0),
                F.col("_num2").cast("double")
                / (2 * F.col("_p").cast("double") * F.col("_n").cast("double")),
            ),
            6,
        ).alias("auc"),
        F.col("_p").cast("decimal(38,0)").alias("n_pos"),
        F.col("_n").cast("decimal(38,0)").alias("n_neg"),
    )
