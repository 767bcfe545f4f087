"""Global-eval fixture ported 1:1 from the reference
(``tests/test_compare_metrics.py:7-37``): 4 GT pairs, 2 candidates (one
with swapped id order), preds [1,1] -> global preds [1,1,0,0],
TP=FP=FN=TN=1, P=R=F1=0.5."""

from __future__ import annotations

import pytest

from record_linkage_spark.operators.evaluate import (
    confusion_metrics,
    evaluate_global,
    global_predictions,
)


def test_global_reconstruction_and_metrics(spark):
    gt = spark.createDataFrame(
        [("a", "b", 1), ("c", "d", 1), ("e", "f", 0), ("g", "h", 0)],
        "id_A string, id_B string, label int",
    )
    # one candidate in swapped order — canonical key must still align it
    cand = spark.createDataFrame(
        [("b", "a", 1), ("e", "f", 1)], "id_A string, id_B string, pred int"
    )
    preds = global_predictions(gt, cand).orderBy("id_A")
    got = {(r.id_A, r.id_B): r.pred for r in preds.collect()}
    # swapped-order candidate overlays onto (a,b); non-candidates default 0
    assert got == {("a", "b"): 1, ("c", "d"): 0, ("e", "f"): 1, ("g", "h"): 0}


def test_reference_fixture_exact(spark):
    gt = spark.createDataFrame(
        [("a", "b", 1), ("c", "d", 1), ("e", "f", 0), ("g", "h", 0)],
        "id_A string, id_B string, label int",
    )
    cand = spark.createDataFrame(
        [("b", "a", 1), ("e", "f", 1)], "id_A string, id_B string, pred int"
    )
    m = evaluate_global(gt, cand)
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (1, 1, 1, 1)
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5


def test_confusion_all_correct(spark):
    preds = spark.createDataFrame(
        [(1, 1), (0, 0), (1, 1)], "label int, pred int"
    )
    m = confusion_metrics(preds)
    assert m["f1"] == 1.0 and m["fp"] == 0 and m["fn"] == 0


def test_bcubed_metrics_hand_computed(spark):
    """Bagga-Baldwin worked example: P = 14/21, R = 13/21, F1 = 1092/1701."""
    from record_linkage_spark.operators.evaluate import bcubed_metrics

    a = spark.createDataFrame(
        [(1, "C1"), (2, "C1"), (3, "C1"), (4, "C2"), (5, "C2"), (6, "C3"), (7, "C3")],
        "conv_id long, entity_id string",
    )
    t = spark.createDataFrame(
        [(1, "K1"), (2, "K1"), (4, "K1"), (3, "K2"), (5, "K3"), (6, "K3"), (7, "K3")],
        "conv_id long, entity_key string",
    )
    r = bcubed_metrics(a, t).first()
    assert r.n_records == 7
    assert r.bcubed_precision == round(14 / 21, 6)
    assert r.bcubed_recall == round(13 / 21, 6)
    assert r.bcubed_f1 == round(1092 / 1701, 6)
    # perfect clustering scores 1.0 on all three
    perfect = bcubed_metrics(
        t.withColumnRenamed("entity_key", "entity_id"), t
    ).first()
    assert (perfect.bcubed_precision, perfect.bcubed_recall, perfect.bcubed_f1) == (
        1.0,
        1.0,
        1.0,
    )


def test_bcubed_metrics_matches_bruteforce_on_random_partitions(spark):
    """Randomized cross-check: B-cubed from the grouped-aggregation plan
    must equal the textbook per-record definition computed in Python."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(2, 40)
        ids = list(range(n))
        cl = {i: rng.randint(0, max(1, n // 4)) for i in ids}
        tr = {i: rng.randint(0, max(1, n // 5)) for i in ids}
        from collections import Counter

        csize = Counter(cl.values())
        ksize = Counter(tr.values())
        cksize = Counter((cl[i], tr[i]) for i in ids)
        p = sum(cksize[(cl[i], tr[i])] / csize[cl[i]] for i in ids) / n
        r = sum(cksize[(cl[i], tr[i])] / ksize[tr[i]] for i in ids) / n
        f1 = 2 * p * r / (p + r) if p + r else 0.0

        from record_linkage_spark.operators.evaluate import bcubed_metrics

        a = spark.createDataFrame(
            [(i, str(cl[i])) for i in ids], "conv_id long, entity_id string"
        )
        t = spark.createDataFrame(
            [(i, str(tr[i])) for i in ids], "conv_id long, entity_key string"
        )
        got = bcubed_metrics(a, t).first()
        assert got.n_records == n, trial
        assert abs(got.bcubed_precision - p) < 1e-6, trial
        assert abs(got.bcubed_recall - r) < 1e-6, trial
        assert abs(got.bcubed_f1 - f1) < 1e-6, trial


def test_roc_auc_matches_pair_enumeration(spark):
    """Mann-Whitney AUC with ties must equal the brute-force definition
    AUC = [#(pos>neg) + 0.5*#(pos==neg)] / (P*N)."""
    from record_linkage_spark.operators.evaluate import roc_auc

    rows = [
        (1, 0.9), (1, 0.8), (1, 0.5), (1, 0.5), (1, 0.2),
        (0, 0.8), (0, 0.5), (0, 0.4), (0, 0.1), (0, 0.1), (0, 0.05),
    ]
    wins = ties = 0
    for lp, sp in [r for r in rows if r[0] == 1]:
        for ln, sn in [r for r in rows if r[0] == 0]:
            wins += sp > sn
            ties += sp == sn
    want = (wins + 0.5 * ties) / (5 * 6)
    df = spark.createDataFrame(rows, "label int, score double")
    got = roc_auc(df).first()
    assert got.auc == pytest.approx(want, abs=1e-6)
    assert (int(got.n_pos), int(got.n_neg)) == (5, 6)
    # perfect separation and degenerate single-class inputs
    perfect = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "label int, score double"
    )
    assert roc_auc(perfect).first().auc == 1.0
    onecls = spark.createDataFrame([(1, 0.9)], "label int, score double")
    assert roc_auc(onecls).first().auc is None


def test_average_precision_matches_step_definition(spark):
    """AP must equal the sklearn step definition
    AP = sum_k (R_k - R_{k-1}) * P_k over distinct thresholds
    (descending), with ties grouped into one threshold."""
    from record_linkage_spark.operators.evaluate import average_precision

    def ref_ap(rows):
        from collections import defaultdict

        by_s = defaultdict(lambda: [0, 0])
        for lbl, sc in rows:
            by_s[sc][0 if lbl == 1 else 1] += 1
        P = sum(v[0] for v in by_s.values())
        ctp = cfp = 0
        ap = 0.0
        for sc in sorted(by_s, reverse=True):
            np_, nn_ = by_s[sc]
            ctp += np_
            cfp += nn_
            ap += np_ * (ctp / (ctp + cfp))
        return ap / P

    rows = [
        (1, 0.9), (0, 0.8), (1, 0.7), (1, 0.6),
        (0, 0.5), (1, 0.3), (0, 0.2), (0, 0.1),
    ]
    df = spark.createDataFrame(rows, "label int, score double")
    got = average_precision(df).first()
    assert got.ap == pytest.approx(ref_ap(rows), abs=1e-6)
    assert (int(got.n_pos), int(got.n_neg)) == (4, 4)

    # ties collapse into one threshold (2 pos + 1 neg at 0.5)
    tied = [(1, 0.5), (0, 0.5), (1, 0.5), (0, 0.2)]
    got_t = average_precision(
        spark.createDataFrame(tied, "label int, score double")
    ).first()
    assert got_t.ap == pytest.approx(ref_ap(tied), abs=1e-6) == pytest.approx(2 / 3)

    # perfect ranking -> 1.0; no positives -> NULL
    perfect = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)], "label int, score double"
    )
    assert average_precision(perfect).first().ap == 1.0
    nopos = spark.createDataFrame([(0, 0.9)], "label int, score double")
    assert average_precision(nopos).first().ap is None
