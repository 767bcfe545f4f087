"""applyInPandasWithState stateful conversation summaries."""

import os

import pytest
from pyspark.sql import functions as F


def test_stateful_conversation_summaries(spark, tmp_path):
    from record_linkage_spark.streaming.incremental import TRANSCRIPT_SCHEMA
    from record_linkage_spark.streaming.stateful import (
        stateful_conversation_summaries,
    )
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    in_dir = str(tmp_path / "in")
    raw = transcripts_table(generate_transcripts(spark, n_entities=40))
    raw.write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(in_dir)
    out = stateful_conversation_summaries(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_summaries")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.conv_id: r
        for r in spark.sql("select * from conv_summaries").collect()
    }
    expected = {
        r.conv_id: r
        for r in raw.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
            F.sum(
                F.when(
                    F.col("text").isNull(), 0
                ).otherwise(F.size(F.split(F.trim("text"), r"\s+")))
            ).alias("n_tokens"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for cid, exp in expected.items():
        assert got[cid].n_turns == exp.n_turns
        assert got[cid].max_turn_idx == exp.max_turn_idx
        assert got[cid].n_tokens == exp.n_tokens
        assert got[cid].finalized is False
