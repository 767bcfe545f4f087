"""GT construction: key validation, positives self-join, stratified
negatives with caps, hash split (reference ground_truth.py semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_linkage_spark.operators.ground_truth import (
    build_ground_truth,
    hydrate_pairs,
    positive_pairs,
    validate_keys,
    with_split,
)
from record_linkage_spark.operators.rollup import rollup_conversations
from record_linkage_spark.synth.transcripts import (
    generate_transcripts,
    hidden_key_table,
    transcripts_table,
)


def _mk_key(entity: int, corrupt: bool = False) -> str:
    digits = f"{entity:010d}"
    weights = [7, 3, 1, 7, 3, 1, 7, 3, 1, 7]
    chk = sum(int(d) * w for d, w in zip(digits, weights)) % 10
    if corrupt:
        chk = (chk + 1) % 10
    return f"EK{digits}{chk}"


def test_validate_keys(spark):
    rows = [
        ("c1", _mk_key(123)),            # valid
        ("c2", _mk_key(123, corrupt=True)),  # bad checksum
        ("c3", "EK111111111" ),          # wrong length
        ("c4", _mk_key(123).lower()),    # case-normalized -> valid
        ("c5", "EK00000000000"),         # placeholder (all-same payload)
        ("c6", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, entity_key string")
    kept = {r.conv_id for r in validate_keys(df).collect()}
    assert kept == {"c1", "c4"}


def test_positive_pairs_canonical(spark):
    df = spark.createDataFrame(
        [("c1", "K1"), ("c2", "K1"), ("c3", "K1"), ("c9", "K2")],
        "conv_id string, entity_key string",
    )
    got = {(r.id_A, r.id_B) for r in positive_pairs(df).collect()}
    assert got == {("c1", "c2"), ("c1", "c3"), ("c2", "c3")}


def test_split_proportions_and_determinism(spark):
    pairs = spark.createDataFrame(
        [(f"a{i}", f"b{i}", i % 2) for i in range(4000)],
        "id_A string, id_B string, label int",
    )
    s1 = with_split(pairs)
    frac = {
        r.split: r.n
        for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(frac.values())
    assert abs(frac["train"] / n - 0.70) < 0.03
    assert abs(frac["val"] / n - 0.10) < 0.02
    assert abs(frac["test"] / n - 0.20) < 0.03
    # deterministic: same assignment on recompute with different partitioning
    s2 = with_split(pairs.repartition(13))
    j = s1.select("id_A", "id_B", "split").join(
        s2.select("id_A", "id_B", F.col("split").alias("s2")), ["id_A", "id_B"]
    )
    assert j.filter(F.col("split") != F.col("s2")).count() == 0


def test_build_ground_truth_end_to_end(spark):
    raw = generate_transcripts(spark, n_entities=120, dup_rate=2.0)
    profiles = rollup_conversations(transcripts_table(raw))
    keys = hidden_key_table(raw).select("conv_id", "entity_key")
    gt = build_ground_truth(profiles, keys, neg_ratio=2.0).cache()

    dist = {r.label: r.n for r in gt.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert dist.get(1, 0) > 0 and dist.get(0, 0) > 0
    # negatives never pair the same entity (valid keys differ)
    truth = hidden_key_table(raw)
    a = truth.select(F.col("conv_id").alias("id_A"), F.col("entity_id").alias("ea"))
    b = truth.select(F.col("conv_id").alias("id_B"), F.col("entity_id").alias("eb"))
    joined = gt.join(a, "id_A").join(b, "id_B")
    assert joined.filter((F.col("label") == 0) & (F.col("ea") == F.col("eb"))).count() == 0
    # positives always same entity
    assert joined.filter((F.col("label") == 1) & (F.col("ea") != F.col("eb"))).count() == 0
    # canonical ordering + no dupes
    assert gt.filter(F.col("id_A") >= F.col("id_B")).count() == 0
    assert gt.count() == gt.dropDuplicates(["id_A", "id_B"]).count()
    # strata present
    strata = {r.stratum for r in gt.select("stratum").distinct().collect()}
    assert "positive" in strata and "hard" in strata

    # hydration carries both sides' attributes
    hyd = hydrate_pairs(gt.limit(50), profiles, ["n_turns", "first_text_norm"])
    assert {"n_turns_A", "n_turns_B", "first_text_norm_A", "first_text_norm_B"} <= set(
        hyd.columns
    )
    assert hyd.count() == 50


def test_ground_truth_plan_has_no_driver_topk(spark):
    """Negative sampling must stay distributed: no TakeOrderedAndProject
    (per-partition top-K collected onto the driver) anywhere in the plan."""
    raw = generate_transcripts(spark, n_entities=120, dup_rate=2.0)
    profiles = rollup_conversations(transcripts_table(raw))
    keys = hidden_key_table(raw).select("conv_id", "entity_key")
    gt = build_ground_truth(profiles, keys, neg_ratio=2.0)
    plan = gt._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert "CollectLimit" not in plan


def test_entity_safe_split_no_leakage_and_proportions(spark):
    from record_linkage_spark.operators.clustering import assign_entities
    from record_linkage_spark.operators.ground_truth import (
        entity_safe_split,
        split_leakage_audit,
    )

    n = 3000
    ids = spark.range(n).select(F.col("id").cast("string").alias("conv_id"))
    # chain-link every block of 3 consecutive ids into one entity
    edges = (
        spark.range(n)
        .filter((F.col("id") % 3 != 0))
        .select(
            F.col("id").cast("string").alias("src"),
            (F.col("id") - 1).cast("string").alias("dst"),
        )
    )
    assign = assign_entities(ids, edges)
    splits = entity_safe_split(assign)

    # every entity lives in exactly one split
    per_entity = splits.groupBy("entity_id").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_entity.filter(F.col("k") > 1).count() == 0

    # proportions roughly 70/10/20 (entity-level routing, 1000 entities)
    frac = {
        r.split: r.n / n
        for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["train"] - 0.7) < 0.08
    assert abs(frac["test"] - 0.2) < 0.08

    # audit: zero cross-split pairs for the entity-safe split...
    pairs = edges.select(
        F.least("src", "dst").alias("id_A"), F.greatest("src", "dst").alias("id_B")
    )
    audit = split_leakage_audit(splits, pairs)
    leaks = audit.filter(F.col("split_A") != F.col("split_B"))
    assert leaks.count() == 0
    assert (
        audit.agg(F.sum("n_pairs")).first()[0] == pairs.count()
    )  # every pair accounted for

    # ...and plenty for a record-hash split over the same pairs
    naive = assign.withColumn(
        "split",
        F.when(F.pmod(F.xxhash64("conv_id"), F.lit(100)) < 70, "train").otherwise(
            "test"
        ),
    )
    naive_leaks = (
        split_leakage_audit(naive, pairs)
        .filter(F.col("split_A") != F.col("split_B"))
        .agg(F.coalesce(F.sum("n_pairs"), F.lit(0)))
        .first()[0]
    )
    assert naive_leaks > 100


def test_entity_safe_split_deterministic_and_salted(spark):
    from record_linkage_spark.operators.ground_truth import entity_safe_split

    assign = spark.range(500).select(
        F.col("id").cast("string").alias("conv_id"),
        (F.col("id") % 100).cast("string").alias("entity_id"),
    )
    s1 = dict(entity_safe_split(assign).select("conv_id", "split").collect())
    s2 = dict(entity_safe_split(assign).select("conv_id", "split").collect())
    assert s1 == s2
    s3 = dict(
        entity_safe_split(assign, salt="other").select("conv_id", "split").collect()
    )
    assert s1 != s3
