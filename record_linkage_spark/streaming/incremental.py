"""Incremental transcript ingestion via Structured Streaming.

The reference is purely batch (SURVEY.md §2.10) — this module is the
engine's *optional* incremental path: new transcript files land in a
directory, a streaming query rolls them up per micro-batch and upserts
profiles into the warehouse through ``foreachBatch`` (the pattern that, on
a real deployment, becomes a MERGE INTO an Iceberg table; here it is
an overwrite-by-conv_id parquet upsert). Late/out-of-order turns within a
watermark are tolerated because the rollup re-aggregates any conv_id seen
in the batch from the full turn history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from record_linkage_spark.operators.rollup import rollup_conversations

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_profiles(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    history_dir: str | None = None,
):
    """Start a streaming query: parquet file source -> per-batch rollup ->
    profile upsert. Returns the StreamingQuery (caller stops it).

    history_dir: optional directory with previously-seen turns; each batch
    re-rolls affected conversations from history + batch so partial
    conversations converge as more turns arrive.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        turns = batch_df
        if history_dir and os.path.exists(history_dir):
            hist = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(history_dir)
            touched = batch_df.select("conv_id").distinct()
            turns = (
                hist.join(touched, "conv_id", "left_semi")
                .unionByName(batch_df)
                .dropDuplicates(["conv_id", "turn_idx"])
            )
        profiles = rollup_conversations(turns).drop("turns")
        out = os.path.join(output_dir, f"epoch={epoch_id}")
        profiles.write.mode("overwrite").parquet(out)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_turn_counts(
    spark: SparkSession, input_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming windowed aggregate over turn events (watermark + window):
    turns per (5-minute window, role) — the monitoring-side streaming
    surface."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
    )


def stream_link(
    spark: SparkSession,
    input_dir: str,
    base_profiles_dir: str,
    matches_dir: str,
    checkpoint_dir: str,
    model,
    strategy: str = "B1",
):
    """Incremental linkage stream: new transcript files -> per-batch
    rollup -> blocked+scored against the stored profile base
    (operators.incremental_link) -> match edges appended to
    ``matches_dir``; the new profiles are appended to the base so later
    batches link against them too. Returns the StreamingQuery."""
    from record_linkage_spark.operators.incremental_link import (
        HYDRATE_COLS,
        link_increment,
    )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_profiles = rollup_conversations(batch_df).drop("turns").localCheckpoint()
        cols = ["conv_id", *HYDRATE_COLS]
        if os.path.exists(base_profiles_dir):
            base = spark.read.parquet(base_profiles_dir).select(*cols)
        else:
            base = new_profiles.select(*cols).limit(0)
        edges = link_increment(
            new_profiles.select(*cols), base, model, strategy
        ).filter(F.col("pred") == 1)
        edges.write.mode("append").parquet(matches_dir)
        new_profiles.select(*cols).write.mode("append").parquet(base_profiles_dir)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
