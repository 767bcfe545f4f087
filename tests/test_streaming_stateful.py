"""applyInPandasWithState stateful conversation summaries."""

import os
import time

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


def test_idle_timeout_finalizes_and_drops_state(spark, tmp_path):
    """idle_timeout_ms > 0 must reach executors (closure-captured, not a
    module global): after a conversation goes idle past the timeout, a
    finalized=True row is emitted and its state dropped."""
    from record_linkage_spark.streaming.incremental import TRANSCRIPT_SCHEMA
    from record_linkage_spark.streaming.stateful import (
        stateful_conversation_summaries,
    )
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    raw = transcripts_table(generate_transcripts(spark, n_entities=10))
    first_conv = raw.select("conv_id").limit(1).collect()[0].conv_id
    batch1 = raw.filter(F.col("conv_id") == first_conv)
    batch1.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "b1"))

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir) + "/*")
    )
    out = stateful_conversation_summaries(stream, idle_timeout_ms=500)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_timeout")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        # wait for batch1 to land
        while time.time() < deadline:
            if spark.sql(
                "select * from conv_timeout where finalized = false"
            ).count():
                break
            time.sleep(0.5)
        # let the conversation go idle past the timeout, then feed a new
        # batch so another micro-batch runs and the timeout can fire
        time.sleep(1.0)
        other = raw.filter(F.col("conv_id") != first_conv).limit(5)
        other.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "b2"))
        finalized = None
        while time.time() < deadline:
            rows = spark.sql(
                "select * from conv_timeout where finalized = true"
            ).collect()
            if rows:
                finalized = rows
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert finalized, "no finalized=True row emitted after idle timeout"
    assert any(r.conv_id == first_conv for r in finalized)
    exp = batch1.count()
    got = [r for r in finalized if r.conv_id == first_conv][0]
    assert got.n_turns == exp
