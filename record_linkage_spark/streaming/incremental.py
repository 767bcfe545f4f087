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


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — works on any
    configured filesystem (HDFS/S3A/local), unlike driver-local
    ``os.path.exists`` which silently answers for the wrong filesystem on
    a real cluster."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _latest_profiles(base: DataFrame) -> DataFrame:
    """Latest-wins upsert view over an epoch-partitioned profile table
    (the parquet stand-in for an Iceberg MERGE target): a conversation
    re-rolled in a later epoch supersedes its older rows. One window
    shuffle per read here; on a warehouse deployment the MERGE keeps the
    table unique per conv_id and this view is a plain scan."""
    if "epoch" not in base.columns:
        return base
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy(F.col("epoch").desc())
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def current_matches(
    spark: SparkSession, matches_dir: str, base_profiles_dir: str
) -> DataFrame:
    """The VALID match-edge view under update semantics: an edge derived
    at epoch e is current iff neither endpoint's profile was re-rolled
    after e (e >= the latest profile epoch of both endpoints). An update
    wave thus invalidates the updated conversations' old edges
    wholesale, and the wave's own re-link re-derives exactly the ones
    that still hold — the view equals a batch re-link of the mutated
    corpus (asserted in tests). Seed profiles live at the reserved
    ``epoch=-1``, so edges from any stream epoch (>= 0) stay valid until
    an update supersedes an endpoint.

    Scale shape: one additive groupBy over the profile table for the
    (conv_id -> latest epoch) map, then two endpoint joins. On a
    warehouse deployment the MERGE equality-deletes superseded edges in
    place and this view is a plain scan."""
    edges = spark.read.parquet(matches_dir)
    base = spark.read.parquet(base_profiles_dir)
    if "epoch" not in edges.columns or "epoch" not in base.columns:
        # un-epoched (append-only) layouts have no update provenance —
        # every edge is current
        return edges
    lat = base.groupBy("conv_id").agg(F.max("epoch").alias("_lat"))
    la = lat.select(F.col("conv_id").alias("id_A"), F.col("_lat").alias("_lat_a"))
    lb = lat.select(F.col("conv_id").alias("id_B"), F.col("_lat").alias("_lat_b"))
    return (
        edges.join(la, "id_A", "left")
        .join(lb, "id_B", "left")
        .filter(
            (F.col("epoch") >= F.coalesce("_lat_a", F.lit(-1)))
            & (F.col("epoch") >= F.coalesce("_lat_b", F.lit(-1)))
        )
        .drop("_lat_a", "_lat_b")
    )


def compact_state(
    spark: SparkSession,
    base_profiles_dir: str,
    matches_dir: str,
    out_base_dir: str,
    out_matches_dir: str,
) -> dict:
    """Offline compaction of the epoch-partitioned stream state — the
    parquet stand-in for what Iceberg MERGE + snapshot expiry do
    continuously. Rewrites the profile table latest-wins (dropping
    superseded rows AND delete tombstones: rows whose blocking payload
    is entirely NULL never pair again, so they only exist to invalidate
    old edges — which compaction does for real by deleting those edges)
    and rewrites the match table to exactly the valid edge view. Both
    land under the reserved ``epoch=-1`` partition (a fresh stream's own
    epochs start at 0, so the compacted state is never overwritten) and
    seed a FRESH deployment with new checkpoints — the blue/green
    rollover pattern; compacting under a live stream's feet would desync
    its file-source bookkeeping.

    Scale shape: one latest-wins window over the profile table, one
    groupBy for the epoch map, two endpoint joins — each a single pass,
    run on a maintenance schedule, amortized across every subsequent
    batch that would otherwise re-derive ever-updated conversations.

    Returns {"profiles": n, "tombstones_dropped": n, "matches": n}."""
    base = spark.read.parquet(base_profiles_dir)
    latest = _latest_profiles(base)
    # tombstone = the delete convention's product: a profile rolled from
    # delete-marker turns only — no text payload anywhere (such rows
    # can never form blocking keys, so dropping them loses nothing)
    text_cols = [
        c
        for c in ("first_text", "last_text", "first_text_norm", "last_text_norm")
        if c in latest.columns
    ]
    is_tombstone = F.lit(True)
    for c in text_cols:
        is_tombstone = is_tombstone & F.col(c).isNull()
    if "n_tokens" in latest.columns:
        is_tombstone = is_tombstone & (F.coalesce("n_tokens", F.lit(0)) == 0)
    live = latest.filter(~is_tombstone) if text_cols else latest
    n_tomb = latest.count() - live.count()
    live.drop("epoch").write.mode("overwrite").parquet(
        f"{out_base_dir}/epoch=-1"
    )
    valid = current_matches(spark, matches_dir, base_profiles_dir)
    valid.drop("epoch").write.mode("overwrite").parquet(
        f"{out_matches_dir}/epoch=-1"
    )
    out_p = spark.read.parquet(out_base_dir)
    out_m = spark.read.parquet(out_matches_dir)
    return {
        "profiles": out_p.count(),
        "tombstones_dropped": n_tomb,
        "matches": out_m.count(),
    }


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
        if history_dir and _fs_exists(spark, history_dir):
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
    (operators.incremental_link) -> match edges land in ``matches_dir``;
    the new profiles join the base so later batches link against them
    too. Returns the StreamingQuery.

    UPDATE waves are first-class: a batch that re-sends an existing
    conversation's turns (the full conversation — a CDC-style snapshot
    upsert) re-rolls its profile under the new epoch, which supersedes
    the old rows (latest-wins base view) and invalidates the old edges
    (see ``current_matches``); the batch's re-link derives the updated
    conversation's current edges against the rest of the corpus. The
    maintained edge view equals a batch rerun on the mutated corpus
    (asserted in tests).

    DELETE waves are the degenerate update: send one tombstone turn
    ``(conv_id, turn_idx=-1, text=NULL)``. The re-rolled profile has
    NULL blocking keys, so the conversation forms no new candidate
    pairs, its old edges are epoch-invalidated like any update, and
    downstream ``stream_entities`` drops it from the assignment and
    re-fuses its former entity without it. The ghost profile row stays
    until compaction (an Iceberg MERGE deletes it in place).

    Sinks are idempotent per epoch (``epoch=<id>`` subdirectories written
    with overwrite); seed an initial profile base under a reserved
    partition (e.g. ``epoch=-1``) so the directory layout stays
    consistently partitioned. On a warehouse deployment both writes
    become Iceberg MERGE/append with the same epoch key."""
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
        if _fs_exists(spark, base_profiles_dir):
            base = spark.read.parquet(base_profiles_dir)
            if "epoch" in base.columns:
                # exclude this epoch's own rows: a retried micro-batch that
                # crashed after the profile write must not link against
                # itself (partition pruning makes the exclusion free)
                base = base.filter(F.col("epoch") != epoch_id)
            # latest-wins view, minus rows superseded by THIS batch: an
            # updated conversation must link as its new self only — its
            # stale profile would otherwise self-match
            base = _latest_profiles(base).join(
                new_profiles.select("conv_id"), "conv_id", "left_anti"
            )
            base = base.select(*cols)
        else:
            base = new_profiles.select(*cols).limit(0)
        edges = link_increment(
            new_profiles.select(*cols), base, model, strategy
        ).filter(F.col("pred") == 1)
        # epoch-keyed overwrite: retries replace their own partial output
        # instead of double-appending (exactly-once foreachBatch pattern)
        edges.write.mode("overwrite").parquet(f"{matches_dir}/epoch={epoch_id}")
        new_profiles.select(*cols).write.mode("overwrite").parquet(
            f"{base_profiles_dir}/epoch={epoch_id}"
        )

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
    sig_dir: str | None = None,
    ngram: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
):
    """Continuous corpus dedup: new document files -> per-batch MinHash
    scan against the accumulated corpus plus a within-batch self-scan ->
    flagged (new_id, dup_of, jaccard) rows land in ``dups_dir``; only
    unflagged survivors land in ``corpus_dir``, so later batches dedup
    against everything kept so far. Returns the StreamingQuery.

    Scale shape: survivors' banded signatures ``(doc_id, bucket, sig)``
    are PERSISTED to ``sig_dir`` each epoch, and the cross-corpus scan
    joins the new batch's band rows against that table — the accumulated
    corpus text is never re-read or re-shingled, so per-batch cost is
    batch x touched-buckets regardless of corpus size. Cross-side
    verification is the ``num_hashes``-sample MinHash estimate (exact at
    tau=1.0, see ``minhash_cross_from_bands``); within-batch pairs get
    exact-Jaccard verification (the batch text is at hand).

    Idempotent sinks: every output lands in an ``epoch=<id>``
    subdirectory written with overwrite — a retried micro-batch replaces
    its own partial output instead of double-appending, and the
    signature-table read excludes the current epoch so a retry never
    flags its own first attempt as a duplicate. Existence probes use the
    Hadoop FileSystem API (never driver-local ``os.path``)."""
    from record_linkage_spark.operators.dedup import (
        minhash_band_rows,
        minhash_cross_from_bands,
        minhash_near_duplicates,
        minhash_signature_kernel,
    )

    sig_dir = sig_dir or corpus_dir.rstrip("/") + "_sigs"
    rows_per_band = num_hashes // num_bands
    kernel = minhash_signature_kernel(ngram, num_hashes)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch = batch_df.dropDuplicates(["doc_id"]).localCheckpoint()
        # one kernel pass per batch: the same materialized signatures feed
        # the within-batch scan, the cross scan, and the persisted table
        sigs = (
            batch.select("doc_id", F.col("text").alias("_text"))
            .withColumn("sig", kernel(F.col("_text")))
            .filter(F.col("sig").isNotNull())
            .localCheckpoint()
        )
        # within-batch: canonical pairs, larger id is the duplicate
        self_dups = minhash_near_duplicates(
            batch,
            jaccard_threshold=jaccard_threshold,
            num_hashes=num_hashes,
            num_bands=num_bands,
            ngram=ngram,
            signatures=sigs,
        ).select(
            F.col("id_B").alias("new_id"),
            F.col("id_A").alias("dup_of"),
            "jaccard",
        )
        banded = minhash_band_rows(
            sigs.select("doc_id", "sig"), num_bands, rows_per_band
        ).localCheckpoint()
        if _fs_exists(spark, sig_dir):
            base_bands = (
                spark.read.parquet(sig_dir)
                .filter(F.col("epoch") != epoch_id)
                .select("doc_id", "bucket", "sig")
            )
            cross = minhash_cross_from_bands(
                banded, base_bands, num_hashes, jaccard_threshold
            )
            dups = self_dups.unionByName(cross)
        else:
            dups = self_dups
        dups = dups.localCheckpoint()
        dups.write.mode("overwrite").parquet(f"{dups_dir}/epoch={epoch_id}")
        survivors = batch.join(
            dups.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint()
        survivors.write.mode("overwrite").parquet(f"{corpus_dir}/epoch={epoch_id}")
        banded.join(
            survivors.select("doc_id"), "doc_id", "left_semi"
        ).write.mode("overwrite").parquet(f"{sig_dir}/epoch={epoch_id}")

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_entities(
    spark: SparkSession,
    matches_dir: str,
    base_profiles_dir: str,
    assignment_dir: str,
    golden_dir: str,
    checkpoint_dir: str,
    mode_cols: tuple = ("first_role", "primary_tool"),
    longest_col: str = "last_text_norm",
    sum_cols: tuple = ("n_tokens", "n_turns"),
):
    """Continuous entity maintenance downstream of ``stream_link``: new
    match-edge files fold into the (record -> entity) assignment via
    graph contraction (``clustering.incremental_components``) and only
    the TOUCHED entities re-fuse into golden records
    (``survivorship.incremental_golden_records``) — per-batch work is
    O(increment), never O(corpus).

    UPDATE waves retract edges (``current_matches``), and retraction can
    SPLIT a component — which contraction cannot express — so entities
    containing an updated conversation are rebuilt from the valid edge
    view restricted to their members (O(affected subgraph)); members
    left with no valid edges drop out of the assignment, matching the
    batch contract that only linked records are tracked. Ever-updated
    conversations are detected from the profile table's epoch
    multiplicity and re-derive idempotently each batch until a
    compaction job rewrites the profile table latest-wins (on a
    warehouse deployment the MERGE does this continuously and the
    detection is the MERGE's own changelog).

    State tables (assignment, golden) are snapshot-per-epoch: each batch
    writes the full new state under ``epoch=<id>`` and reads the latest
    PRIOR epoch, so a retried micro-batch overwrites its own snapshot
    instead of compounding (same exactly-once pattern as the other
    sinks; on a warehouse deployment both become Iceberg MERGE on the
    same key). Only records that appear in match edges enter the
    assignment — the golden table covers LINKED entities; unlinked
    singletons stay in the profile base. Returns the StreamingQuery."""
    from record_linkage_spark.operators.clustering import (
        assign_entities,
        incremental_components,
    )
    from record_linkage_spark.operators.survivorship import (
        incremental_golden_records,
        golden_records,
        touched_entities,
    )

    edge_schema = T.StructType(
        [
            T.StructField("id_A", T.StringType(), False),
            T.StructField("id_B", T.StringType(), False),
        ]
    )
    stream = (
        spark.readStream.schema(edge_schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(matches_dir)
    )

    def _latest_epoch(path: str, before: int) -> int | None:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return None
        best = None
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if name.startswith("epoch="):
                e = int(name.split("=", 1)[1])
                if e != before and (best is None or e > best):
                    best = e
        return best

    fuse = dict(
        id_col="conv_id",
        mode_cols=tuple(mode_cols),
        longest_col=longest_col,
        sum_cols=tuple(sum_cols),
    )
    prof_cols = ["conv_id", *mode_cols, longest_col, *sum_cols]

    def _rebuild_updated(assign: DataFrame, updated_ids: DataFrame) -> DataFrame:
        """Recompute components for every entity containing an updated
        conversation against the valid edge view; all other rows pass
        through. Valid edges never cross entity boundaries of ``assign``
        (old edges were intra-entity by construction; this batch's new
        edges were contracted into ``assign`` first), so restricting the
        view to affected members is complete."""
        from record_linkage_spark.operators.clustering import connected_components

        affected = (
            assign.join(F.broadcast(updated_ids), "conv_id", "left_semi")
            .select("entity_id")
            .distinct()
            .localCheckpoint()
        )
        members = assign.join(
            F.broadcast(affected), "entity_id", "left_semi"
        ).select("conv_id")
        valid = current_matches(spark, matches_dir, base_profiles_dir)
        sub = (
            valid.join(
                F.broadcast(members.withColumnRenamed("conv_id", "id_A")),
                "id_A",
                "left_semi",
            )
            .join(
                F.broadcast(members.withColumnRenamed("conv_id", "id_B")),
                "id_B",
                "left_semi",
            )
            .select(F.col("id_A").alias("src"), F.col("id_B").alias("dst"))
        )
        rebuilt = connected_components(sub)
        # the anti-join moves its key to column 0 — restore (conv_id,
        # entity_id) so every epoch snapshot shares one schema order
        return (
            assign.join(F.broadcast(affected), "entity_id", "left_anti")
            .select("conv_id", "entity_id")
            .unionByName(rebuilt)
        )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        base = spark.read.parquet(base_profiles_dir)
        # ever-updated conversations (profile re-rolled in >1 epoch):
        # their entities must rebuild even when the triggering batch
        # carries no edge rows — a DELETE wave is exactly that (the
        # tombstone epoch writes an empty edge file, the batch fires
        # empty, and the retraction still has to propagate)
        updated = None
        if "epoch" in base.columns:
            updated = (
                base.groupBy("conv_id")
                .agg(F.count_distinct("epoch").alias("_n"))
                .filter(F.col("_n") > 1)
                .select("conv_id")
                .localCheckpoint()
            )
        if batch_df.isEmpty() and (updated is None or updated.isEmpty()):
            return
        edges = batch_df.select(
            F.col("id_A").alias("src"), F.col("id_B").alias("dst")
        ).localCheckpoint()
        profiles = _latest_profiles(base).select(*prof_cols)

        prev = _latest_epoch(assignment_dir, before=epoch_id)
        if prev is None:
            # first maintenance batch = the scheduled full CC: assign
            # from the whole currently-valid edge view (the profile
            # table may already carry updates that invalidate part of
            # the streamed edge backlog)
            vedges = current_matches(
                spark, matches_dir, base_profiles_dir
            ).select(F.col("id_A").alias("src"), F.col("id_B").alias("dst"))
            ids = (
                vedges.select(F.col("src").alias("conv_id"))
                .unionByName(vedges.select(F.col("dst").alias("conv_id")))
                .distinct()
            )
            new_assign = assign_entities(ids, vedges).localCheckpoint()
            golden_new = golden_records(profiles, new_assign, **fuse)
        else:
            old_assign = spark.read.parquet(
                f"{assignment_dir}/epoch={prev}"
            )
            # 1) fold NEW edges in via contraction (the append path)
            new_assign = incremental_components(old_assign, edges)
            # 2) rebuild entities whose members were UPDATED — their old
            #    edges are retracted, which can split the component
            if updated is not None and not updated.isEmpty():
                new_assign = _rebuild_updated(new_assign, updated)
            new_assign = new_assign.localCheckpoint()
            old_golden = spark.read.parquet(f"{golden_dir}/epoch={prev}")
            touched = touched_entities(old_assign, new_assign)
            if updated is not None:
                # content-only updates keep their assignment but must
                # still re-fuse their entity's golden record
                touched = (
                    touched.unionByName(
                        new_assign.join(
                            updated, "conv_id", "left_semi"
                        ).select("entity_id")
                    )
                    .distinct()
                )
            golden_new = incremental_golden_records(
                profiles, new_assign, old_golden, touched, **fuse
            )
        new_assign.write.mode("overwrite").parquet(
            f"{assignment_dir}/epoch={epoch_id}"
        )
        golden_new.write.mode("overwrite").parquet(
            f"{golden_dir}/epoch={epoch_id}"
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_histograms(
    spark: SparkSession,
    input_dir: str,
    hist_dir: str,
    checkpoint_dir: str,
    value_expr: str = "length(text)",
    group_cols: tuple[str, ...] = ("role",),
    precision: int = 7,
):
    """Streaming corpus profiling via the mergeable quantile-histogram
    sketch: each micro-batch writes ITS OWN bucket table under
    ``hist_dir/epoch=N`` (state = bucket-bound rows, independent of
    batch size), and readers merge on read with
    :func:`merged_histogram` — the exact composition property
    ``histogram_merge(epochs) == int_histogram(union)`` pinned by
    ``test_sketches.py::test_histogram_merge_equals_union``, applied to
    the streaming epoch layout. Old batches' raw turns are never
    re-read (the signature-table discipline of :func:`stream_dedup`,
    here for the metric distribution instead of the dedup state).

    Epoch-keyed overwrite makes retried batches exactly-once, like
    every other sink in this module. Returns the StreamingQuery.
    """
    from record_linkage_spark.operators.sketches import int_histogram

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def write_hist(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = batch_df.select(
            *group_cols, F.expr(value_expr).cast("long").alias("_metric")
        )
        hist = int_histogram(rows, "_metric", list(group_cols), precision)
        out = os.path.join(hist_dir, f"epoch={epoch_id}")
        hist.write.mode("overwrite").parquet(out)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(write_hist)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merged_histogram(
    spark: SparkSession, hist_dir: str, group_cols: tuple[str, ...] = ("role",)
) -> DataFrame:
    """Merge all persisted epoch histograms (summed union — the
    mergeability property makes this EQUAL the batch histogram over
    every turn ever streamed, without re-reading any turn)."""
    from record_linkage_spark.operators.sketches import histogram_merge

    return histogram_merge(
        [spark.read.parquet(hist_dir).drop("epoch")], list(group_cols)
    )


def epoch_drift(
    spark: SparkSession,
    hist_dir: str,
    epochs_a,
    epochs_b,
    group_cols: tuple[str, ...] = ("role",),
) -> DataFrame:
    """Distribution drift between two sets of streamed epochs, computed
    ENTIRELY from the persisted per-epoch bucket tables — no raw turn
    is ever re-read. ``epochs_a`` / ``epochs_b`` are iterables of epoch
    ids (e.g. yesterday's vs today's); each side merges by summed union
    (the mergeability property) and the comparison is a join of two
    bucket-bound frames (``operators.drift.histogram_drift``). The
    streaming answer to "did the feed change?" at sketch cost."""
    from record_linkage_spark.operators.drift import histogram_drift
    from record_linkage_spark.operators.sketches import histogram_merge

    all_hist = spark.read.parquet(hist_dir)
    # validate BEFORE comparing: a typo'd / never-written epoch id would
    # otherwise read as an empty side and report maximal drift — a
    # confidently wrong "the feed changed" answer
    available = {r.epoch for r in all_hist.select("epoch").distinct().collect()}

    def _side(epochs) -> DataFrame:
        ids = [int(e) for e in epochs]
        if not ids:
            raise ValueError("each side needs at least one epoch id")
        missing = sorted(set(ids) - available)
        if missing:
            raise ValueError(
                f"epochs {missing} have no persisted histogram under "
                f"{hist_dir} (available: {sorted(available)})"
            )
        side = all_hist.filter(F.col("epoch").isin(ids)).drop("epoch")
        return histogram_merge([side], list(group_cols))

    return histogram_drift(_side(epochs_a), _side(epochs_b), list(group_cols))
