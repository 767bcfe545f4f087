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


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    dups_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.8,
):
    """Continuous corpus dedup: new document files -> per-batch MinHash
    scan against the ACCUMULATED corpus (``minhash_cross_duplicates``)
    plus a within-batch self-scan -> flagged (new_id, dup_of, jaccard)
    rows appended to ``dups_dir``; only unflagged survivors append to
    ``corpus_dir``, so later batches dedup against everything kept so
    far. The 100 TB shape is the batch operators': nothing here assumes
    either side is small, and per-batch work is batch x touched-buckets,
    not batch x corpus. Returns the StreamingQuery.

    (In production the corpus side would keep a persisted signature
    table instead of re-shingling — the same upgrade the incremental
    linkage path documents for its profile base.)"""
    from record_linkage_spark.operators.dedup import (
        minhash_cross_duplicates,
        minhash_near_duplicates,
    )

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.dropDuplicates(["doc_id"]).localCheckpoint()
        # within-batch: canonical pairs, larger id is the duplicate
        self_dups = minhash_near_duplicates(
            batch, jaccard_threshold=jaccard_threshold
        ).select(
            F.col("id_B").alias("new_id"),
            F.col("id_A").alias("dup_of"),
            "jaccard",
        )
        if os.path.exists(corpus_dir):
            base = spark.read.schema(DOC_SCHEMA).parquet(corpus_dir)
            cross = minhash_cross_duplicates(
                batch, base, jaccard_threshold=jaccard_threshold
            ).select(
                F.col("corpus_id").alias("new_id"),
                F.col("reference_id").alias("dup_of"),
                "jaccard",
            )
            dups = self_dups.unionByName(cross)
        else:
            dups = self_dups
        dups = dups.localCheckpoint()
        dups.write.mode("append").parquet(dups_dir)
        survivors = batch.join(
            dups.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        survivors.write.mode("append").parquet(corpus_dir)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
