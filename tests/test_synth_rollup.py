"""Generator + rollup invariants: determinism across parallelism levels,
stable turn ordering, per-turn text equality for clean duplicate copies."""

from __future__ import annotations

from pyspark.sql import functions as F

from record_linkage_spark.operators.rollup import rollup_conversations
from record_linkage_spark.synth.transcripts import (
    generate_transcripts,
    hidden_key_table,
    transcripts_table,
)


def test_schema_and_shape(spark):
    df = generate_transcripts(spark, n_entities=50, dup_rate=1.6)
    t = transcripts_table(df)
    assert t.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict(t.dtypes)["turn_idx"] == "int"
    n_convs = t.select("conv_id").distinct().count()
    assert n_convs >= 50
    # turn_idx contiguous 0-based within conv
    chk = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"), F.min("turn_idx").alias("mn"))
        .filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
    )
    assert chk.count() == 0


def test_determinism_across_parallelism(spark):
    a = generate_transcripts(spark, n_entities=40, partitions=2).orderBy(
        "conv_id", "turn_idx"
    )
    b = generate_transcripts(spark, n_entities=40, partitions=16).orderBy(
        "conv_id", "turn_idx"
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_ts_monotone_within_conv(spark):
    df = transcripts_table(generate_transcripts(spark, n_entities=30))
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        df.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_duplicates_share_base_text(spark):
    # copy 0 vs copy 1 of the same entity: most turn texts equal at the same
    # slot when severity is mild; at least the majority of tokens shared
    df = generate_transcripts(spark, n_entities=60, dup_rate=2.2)
    prof = rollup_conversations(transcripts_table(df))
    keys = hidden_key_table(df)
    p = prof.join(keys, "conv_id")
    pairs = (
        p.alias("a")
        .join(p.alias("b"), F.col("a.entity_id") == F.col("b.entity_id"))
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.norm_tokens").alias("ta"), F.col("b.norm_tokens").alias("tb")
        )
    )
    from record_linkage_spark.functions.similarity import token_jaccard

    stats = pairs.select(F.avg(token_jaccard("ta", "tb")).alias("j")).first()
    assert stats.j > 0.6


def test_rollup_profile(spark):
    raw = generate_transcripts(spark, n_entities=25)
    t = transcripts_table(raw)
    prof = rollup_conversations(t)
    assert prof.count() == t.select("conv_id").distinct().count()
    row = prof.orderBy("conv_id").first()
    # stable turn ordering inside the rollup
    idxs = [x["turn_idx"] for x in row.turns]
    assert idxs == sorted(idxs) and idxs[0] == 0
    assert row.n_turns == len(row.turns)
    assert row.first_text == row.turns[0]["text"]
    assert row.duration_sec >= 0
    # per-turn text equality under stable turn ordering vs the input
    src = sorted(
        [(r.turn_idx, r.text) for r in t.filter(F.col("conv_id") == row.conv_id).collect()]
    )
    assert [(x["turn_idx"], x["text"]) for x in row.turns] == src


def test_rollup_deterministic_across_partitioning(spark):
    raw = transcripts_table(generate_transcripts(spark, n_entities=30))
    a = rollup_conversations(raw, num_partitions=2).select(
        "conv_id", "n_turns", "token_prefix", "n_tokens"
    )
    b = rollup_conversations(raw.repartition(16), num_partitions=7).select(
        "conv_id", "n_turns", "token_prefix", "n_tokens"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
