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


def test_stream_dedup_accumulates_and_flags(spark, tmp_path):
    """Two availableNow runs sharing a checkpoint: run 2 must flag a copy
    of a run-1 corpus doc (cross-scan against the accumulated corpus) and
    an in-batch copy, and append only genuine survivors to the corpus."""
    from record_linkage_spark.streaming.incremental import DOC_SCHEMA, stream_dedup

    inp, corpus, dups, ckpt = (
        str(tmp_path / d) for d in ("in", "corpus", "dups", "ckpt")
    )
    t1 = "the first unique document about distributed joins and shuffle planning in spark"
    t2 = "a second unique document describing watermark semantics for late arriving events"
    t3 = "a third document with completely different content about tokenizer vocabularies"

    def put(rows):
        # append part files into the flat source dir; the next availableNow
        # run picks up exactly the files the checkpoint hasn't seen
        spark.createDataFrame(rows, DOC_SCHEMA).write.mode("append").parquet(inp)

    put([("a1", t1), ("b1", t2)])
    q = stream_dedup(spark, inp, corpus, dups, ckpt)
    q.awaitTermination(120)
    got1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got1 == {"a1", "b1"}

    # run 2: c1 copies corpus doc a1; d1 is new; e1 copies d1 in-batch
    put([("c1", t1), ("d1", t3), ("e1", t3)])
    q = stream_dedup(spark, inp, corpus, dups, ckpt)
    q.awaitTermination(120)

    flagged = {(r.new_id, r.dup_of) for r in spark.read.parquet(dups).collect()}
    assert ("c1", "a1") in flagged  # cross-run duplicate caught
    assert ("e1", "d1") in flagged  # within-batch duplicate caught
    assert all(nid in {"c1", "e1"} for nid, _ in flagged)
    got2 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got2 == {"a1", "b1", "d1"}  # only the genuine survivor joined


def test_stream_dedup_never_rereads_corpus_text(spark, tmp_path):
    """The cross-corpus scan must run off the persisted signature table
    alone: delete the accumulated corpus TEXT between batches and the next
    batch still flags duplicates of batch-1 docs. (Round-2 weakness: the
    old implementation re-read and re-shingled corpus_dir every batch —
    O(corpus) per batch at 100 TB.)"""
    import shutil

    from record_linkage_spark.streaming.incremental import DOC_SCHEMA, stream_dedup

    inp, corpus, dups, ckpt = (
        str(tmp_path / d) for d in ("in", "corpus", "dups", "ckpt")
    )
    t1 = "an original reference document about salted self joins and skew handling"

    def put(rows):
        spark.createDataFrame(rows, DOC_SCHEMA).write.mode("append").parquet(inp)

    put([("a1", t1)])
    q = stream_dedup(spark, inp, corpus, dups, ckpt)
    q.awaitTermination(120)

    # corpus text gone; only the signature table remains
    shutil.rmtree(corpus)
    assert spark.read.parquet(corpus + "_sigs").count() > 0

    put([("z1", t1)])
    q = stream_dedup(spark, inp, corpus, dups, ckpt)
    q.awaitTermination(120)

    flagged = {(r.new_id, r.dup_of) for r in spark.read.parquet(dups).collect()}
    assert ("z1", "a1") in flagged
    # and the duplicate never entered the signature table
    sig_ids = {r.doc_id for r in spark.read.parquet(corpus + "_sigs").collect()}
    assert "z1" not in sig_ids and "a1" in sig_ids


def test_stream_histograms_merge_equals_batch(spark, tmp_path):
    """Per-epoch histogram sketches composed across two streamed waves
    equal the batch histogram over all turns — and the second wave's
    query never needs the first wave's raw turns (mergeable-state
    discipline for metric distributions)."""
    from pyspark.sql import functions as F

    from record_linkage_spark.operators.sketches import (
        histogram_quantiles,
        int_histogram,
    )
    from record_linkage_spark.streaming.incremental import (
        merged_histogram,
        stream_histograms,
    )
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    raw = transcripts_table(
        generate_transcripts(spark, n_entities=30, dup_rate=1.5)
    ).localCheckpoint()
    wave = F.substring("conv_id", 1, 8).cast("int") >= 20
    in_dir, hist_dir, ck = (
        str(tmp_path / "in"), str(tmp_path / "hist"), str(tmp_path / "ck")
    )
    args = (spark, in_dir, hist_dir, ck)

    raw.filter(~wave).write.mode("append").parquet(in_dir)
    stream_histograms(*args).awaitTermination()
    raw.filter(wave).write.mode("append").parquet(in_dir)
    stream_histograms(*args).awaitTermination()

    merged = merged_histogram(spark, hist_dir)
    batch = int_histogram(
        raw.select("role", F.expr("length(text)").cast("long").alias("_metric")),
        "_metric",
        ["role"],
        7,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # readout works on the merged state
    qs = histogram_quantiles(merged, [0.5, 0.99], ["role"], precision=7)
    assert qs.count() == raw.select("role").distinct().count() * 2


def test_epoch_drift_from_persisted_sketches_only(spark, tmp_path):
    """epoch_drift answers "did the feed change?" from the per-epoch
    bucket tables alone: drift(wave1, wave1-rerun) == 0 while
    drift(wave1, shifted-wave2) fires — and the raw turns can be
    DELETED before the comparison (state-only discipline)."""
    import shutil

    from pyspark.sql import functions as F

    from record_linkage_spark.streaming.incremental import (
        epoch_drift,
        stream_histograms,
    )
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    raw = transcripts_table(
        generate_transcripts(spark, n_entities=30, dup_rate=1.5)
    ).localCheckpoint()
    wave = F.substring("conv_id", 1, 8).cast("int") >= 20
    in_dir, hist_dir, ck = (
        str(tmp_path / "in"), str(tmp_path / "hist"), str(tmp_path / "ck")
    )
    args = (spark, in_dir, hist_dir, ck)

    raw.filter(~wave).write.mode("append").parquet(in_dir)
    stream_histograms(*args).awaitTermination()
    # wave 2: same conversations but text lengths shifted 10x
    raw.filter(wave).withColumn(
        "text", F.concat_ws("", F.array_repeat(F.col("text"), 10))
    ).write.mode("append").parquet(in_dir)
    stream_histograms(*args).awaitTermination()

    epochs = sorted(
        int(str(p.name).split("=")[1])
        for p in (tmp_path / "hist").iterdir()
        if "epoch=" in str(p.name)
    )
    assert len(epochs) >= 2
    # the raw turns are gone; only the sketch state remains
    shutil.rmtree(in_dir)

    same = epoch_drift(spark, hist_dir, [epochs[0]], [epochs[0]])
    assert all(r.psi == 0.0 and r.tv == 0.0 for r in same.collect())

    moved = epoch_drift(spark, hist_dir, [epochs[0]], epochs[1:])
    by_role = {r.role: r for r in moved.collect()}
    assert any(r.psi > 0.25 for r in by_role.values())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_drift(spark, hist_dir, [], [epochs[0]])
    # a never-written epoch id must error, not read as maximal drift
    with _pytest.raises(ValueError, match="no persisted histogram"):
        epoch_drift(spark, hist_dir, [epochs[0]], [max(epochs) + 99])


def _turn_rows(spark, rows):
    """(conv_id, role, text, ts_string) -> transcript-schema frame."""
    from pyspark.sql import functions as F

    from record_linkage_spark.streaming.incremental import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(
        [
            (cid, 0, role, text, None, ts)
            for cid, role, text, ts in rows
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in TRANSCRIPT_SCHEMA.fields
        ]
    )


def test_stream_histograms_late_data_contract(spark, tmp_path):
    """THE late-data contract for the histogram/drift path:
    stream_histograms epochs by PROCESSING batch, not event time — an
    event arriving a day late by ts lands in its ARRIVAL epoch's bucket
    table (visible to epoch_drift as that epoch's mass) and is NEVER
    dropped: the merged histogram still equals the batch histogram over
    every event regardless of lateness. Watermark-bounded dropping only
    applies to the event-time-windowed surface (windowed_turn_counts,
    pinned below)."""
    from pyspark.sql import functions as F

    from record_linkage_spark.operators.sketches import int_histogram
    from record_linkage_spark.streaming.incremental import (
        merged_histogram,
        stream_histograms,
    )

    on_time = _turn_rows(
        spark,
        [
            ("c1", "user", "hello there", "2024-06-02 12:00:00"),
            ("c2", "assistant", "a longer on-time reply text", "2024-06-02 12:01:00"),
        ],
    )
    late = _turn_rows(
        spark,
        # event time a full DAY before wave 1 — arrives in wave 2
        [("c3", "late_role", "very late arriving row", "2024-06-01 09:00:00")],
    )
    in_dir, hist_dir, ck = (
        str(tmp_path / "in"), str(tmp_path / "hist"), str(tmp_path / "ck")
    )
    args = (spark, in_dir, hist_dir, ck)
    on_time.write.mode("append").parquet(in_dir)
    stream_histograms(*args).awaitTermination()
    late.write.mode("append").parquet(in_dir)
    stream_histograms(*args).awaitTermination()

    # the late row's mass sits in the SECOND epoch's state, not the first
    per_epoch = {
        r.epoch: set(r2.role for r2 in
                     spark.read.parquet(hist_dir).filter(F.col("epoch") == r.epoch)
                     .select("role").distinct().collect())
        for r in spark.read.parquet(hist_dir).select("epoch").distinct().collect()
    }
    epochs = sorted(per_epoch)
    assert len(epochs) == 2
    assert "late_role" not in per_epoch[epochs[0]]
    assert "late_role" in per_epoch[epochs[1]]

    # and nothing is lost: merged == batch over the union
    union = on_time.unionByName(late)
    merged = {
        (r.role, r.bucket): r.n
        for r in merged_histogram(spark, hist_dir).collect()
    }
    batch = {
        (r.role, r.bucket): r.n
        for r in int_histogram(
            union.select("role", F.expr("length(text)").cast("long").alias("_m")),
            "_m",
            ["role"],
        ).collect()
    }
    assert merged == batch


def test_windowed_turn_counts_drops_beyond_watermark(spark, tmp_path):
    """The watermark BOUND on the event-time surface: with a 10-minute
    watermark in append mode, a row arriving after the watermark has
    passed its 5-minute window is dropped from that window's final
    count; the finalized window emits only the on-time rows. (Contrast
    with stream_histograms above, whose processing-time epochs never
    drop late rows.)"""
    from record_linkage_spark.streaming.incremental import windowed_turn_counts

    inp = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run():
        # file sink: the only append-mode sink that recovers from a
        # checkpoint across runs (memory sink can't); emitted rows
        # accumulate under `out` exactly once each
        q = (
            windowed_turn_counts(spark, inp)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # wave 1: three rows in [12:00, 12:05) plus a watermark driver at
    # 12:30 -> checkpointed watermark = 12:20, far past that window
    _turn_rows(
        spark,
        [
            ("a", "user", "x", "2024-06-02 12:00:10"),
            ("b", "user", "x", "2024-06-02 12:01:00"),
            ("c", "user", "x", "2024-06-02 12:04:00"),
            ("d", "user", "x", "2024-06-02 12:30:00"),
        ],
    ).write.mode("append").parquet(inp)
    run()

    # wave 2: one row LATE beyond the watermark (12:01 < 12:20 -> must
    # not resurrect the [12:00,12:05) window) and one advancing the
    # watermark to 12:50 so that window finalizes and emits
    _turn_rows(
        spark,
        [
            ("late", "user", "x", "2024-06-02 12:01:30"),
            ("e", "user", "x", "2024-06-02 13:00:00"),
        ],
    ).write.mode("append").parquet(inp)
    run()

    # wave 3: advances the watermark to 13:20 so the 12:30 window
    # finalizes too (append emits a window one batch AFTER the
    # watermark passes it)
    _turn_rows(
        spark, [("f", "user", "x", "2024-06-02 13:30:00")]
    ).write.mode("append").parquet(inp)
    run()

    rows = (
        spark.read.parquet(out)
        .selectExpr("CAST(window.start AS STRING) AS ws", "n_turns")
        .collect()
    )
    emitted = {}
    for r in rows:
        emitted[r.ws] = emitted.get(r.ws, 0) + int(r.n_turns)
    # finalized [12:00,12:05) counts the 3 on-time rows only — the late
    # row was dropped; the 12:30 window finalized with its 1 row
    assert emitted["2024-06-02 12:00:00"] == 3
    assert emitted["2024-06-02 12:30:00"] == 1
    # the wave-3 watermark (13:20) finalized [13:00,13:05) in the same
    # availableNow run (Spark flushes evictable state before stopping);
    # the 13:30 window is still open — never emitted
    assert emitted["2024-06-02 13:00:00"] == 1
    assert "2024-06-02 13:30:00" not in emitted
