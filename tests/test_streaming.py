"""Structured Streaming incremental path: file source -> foreachBatch
rollup upsert; windowed streaming aggregate smoke."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from record_linkage_spark.streaming.incremental import (
    stream_profiles,
    windowed_turn_counts,
)
from record_linkage_spark.synth.transcripts import (
    generate_transcripts,
    transcripts_table,
)


def test_stream_profiles_available_now(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    t = transcripts_table(generate_transcripts(spark, n_entities=20))
    t.write.parquet(inp)

    q = stream_profiles(spark, inp, out, chk)
    q.awaitTermination(120)
    assert not q.isActive or q.stop() is None

    got = spark.read.parquet(os.path.join(out, "epoch=0"))
    assert got.count() == t.select("conv_id").distinct().count()
    assert "n_turns" in got.columns


def test_windowed_turn_counts_memory_sink(spark, tmp_path):
    inp = str(tmp_path / "in2")
    t = transcripts_table(generate_transcripts(spark, n_entities=10))
    t.write.parquet(inp)
    agg = windowed_turn_counts(spark, inp)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("turn_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql("SELECT sum(n_turns) AS n FROM turn_counts").first()
    assert res.n == t.count()
