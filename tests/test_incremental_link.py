"""Incremental linkage: increment run == batch run restricted to pairs
touching the new ids."""

from pyspark.sql import functions as F


def _profiles(spark, n_entities, dup_rate=1.8):
    from record_linkage_spark.operators.rollup import rollup_conversations
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    raw = generate_transcripts(spark, n_entities=n_entities, dup_rate=dup_rate)
    return rollup_conversations(transcripts_table(raw)).localCheckpoint()


def test_increment_matches_batch_restriction(spark):
    from record_linkage_spark.operators.blocking import candidate_pairs
    from record_linkage_spark.operators.incremental_link import (
        increment_candidates,
    )

    profiles = _profiles(spark, 120)
    # increment = conversations of the last 30 entities (includes dups of
    # "existing" entities only via their own copies -> new-new pairs, plus
    # any cross-block collisions with the base)
    is_new = F.substring("conv_id", 1, 8).cast("int") >= 90
    new_p = profiles.filter(is_new)
    base_p = profiles.filter(~is_new)

    inc = {
        (r.id_A, r.id_B)
        for r in increment_candidates(new_p, base_p, "B1").collect()
    }
    new_ids = {r.conv_id for r in new_p.select("conv_id").collect()}
    batch = {
        (min(r.id_A, r.id_B), max(r.id_A, r.id_B))
        for r in candidate_pairs(profiles, "B1").collect()
        if r.id_A in new_ids or r.id_B in new_ids
    }
    assert inc == batch
    assert len(inc) > 0  # planted duplicates among the new entities


def test_link_increment_scores_and_flags(spark):
    from record_linkage_spark.operators.classifier import LinearModel
    from record_linkage_spark.operators.incremental_link import link_increment

    profiles = _profiles(spark, 80)
    is_new = F.substring("conv_id", 1, 8).cast("int") >= 60
    model = LinearModel(
        weights=[2.0, 1.0, 1.5, 0.8, 0.6, 0.3, 0.5, 1.2, 0.4, 0.3, 0.8, 0.8, 0.8, 0.4, 1.0, 2.0],
        intercept=-6.0,
        threshold=0.5,
    )
    out = link_increment(
        profiles.filter(is_new), profiles.filter(~is_new), model
    ).collect()
    assert len(out) > 0
    assert all(r.id_A < r.id_B for r in out)
    assert any(r.pred == 1 for r in out)  # duplicates of new entities match


def test_link_increment_after_updates_and_deletes(spark):
    """Mutated-base maintenance (the Iceberg MERGE reality at 100 TB):
    conversations get DELETED and UPDATED, not just appended. Re-linking
    only the touched conversations and patching the match-edge table
    (drop edges touching deleted/updated ids, add the increment's edges)
    must equal a full batch rerun on the mutated corpus — and rewritten
    conversations must actually change entity assignment."""
    from record_linkage_spark.operators.blocking import candidate_pairs
    from record_linkage_spark.operators.classifier import LinearModel, score_pairs
    from record_linkage_spark.operators.clustering import assign_entities
    from record_linkage_spark.operators.features import add_features
    from record_linkage_spark.operators.ground_truth import hydrate_pairs
    from record_linkage_spark.operators.incremental_link import (
        HYDRATE_COLS,
        link_increment,
    )
    from record_linkage_spark.operators.rollup import rollup_conversations
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    model = LinearModel(
        weights=[2.0, 1.0, 1.5, 0.8, 0.6, 0.3, 0.5, 1.2, 0.4, 0.3, 0.8, 0.8, 0.8, 0.4, 1.0, 2.0],
        intercept=-6.0,
        threshold=0.5,
    )
    cols = ["conv_id", *HYDRATE_COLS]

    def batch_edges(profiles):
        cands = candidate_pairs(profiles, "B1").select("id_A", "id_B")
        scored = score_pairs(add_features(hydrate_pairs(cands, profiles, HYDRATE_COLS)), model)
        return {
            (r.id_A, r.id_B)
            for r in scored.filter(F.col("pred") == 1).select("id_A", "id_B").collect()
        }

    raw = transcripts_table(
        generate_transcripts(spark, n_entities=60, dup_rate=1.8)
    ).localCheckpoint()
    ent = F.substring("conv_id", 1, 8).cast("int")
    profiles0 = rollup_conversations(raw).select(*cols).localCheckpoint()
    edges0 = batch_edges(profiles0)

    # mutate: DELETE entities < 5, REWRITE the text of entities >= 45
    raw2 = (
        raw.filter(ent >= 5)
        .withColumn(
            "text",
            F.when(
                ent >= 45,
                # per-conv divergent gibberish (md5-derived) so former
                # duplicates no longer block or score together
                F.concat_ws(
                    " ",
                    F.md5(F.col("conv_id")),
                    F.md5(F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))),
                ),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint()
    )
    profiles2 = rollup_conversations(raw2).select(*cols).localCheckpoint()
    full2 = batch_edges(profiles2)

    touched = {r.conv_id for r in profiles2.filter(ent >= 45).select("conv_id").collect()}
    deleted = {r.conv_id for r in profiles0.filter(ent < 5).select("conv_id").collect()}
    inc = link_increment(
        profiles2.filter(ent >= 45), profiles2.filter(ent < 45), model
    )
    inc_edges = {
        (r.id_A, r.id_B) for r in inc.filter(F.col("pred") == 1).collect()
    }
    maintained = {
        e for e in edges0 if not (set(e) & (touched | deleted))
    } | inc_edges
    assert maintained == full2

    # the rewrite must have severed at least one former duplicate edge …
    lost = {e for e in edges0 if set(e) & touched} - full2
    assert lost
    # … and the severed pair lands in different entities after re-clustering
    edges_df = spark.createDataFrame(
        sorted(full2), "src string, dst string"
    )
    assign = {
        r.conv_id: r.entity_id
        for r in assign_entities(profiles2.select("conv_id"), edges_df).collect()
    }
    a, b = next(iter(lost))
    assert assign[a] != assign[b]


def test_stream_link_end_to_end(spark, tmp_path):
    """foreachBatch incremental linkage: base profiles seeded, a second
    wave of transcript files streams in, match edges land in the sink."""
    from record_linkage_spark.operators.classifier import LinearModel
    from record_linkage_spark.operators.incremental_link import HYDRATE_COLS
    from record_linkage_spark.operators.rollup import rollup_conversations
    from record_linkage_spark.streaming.incremental import stream_link
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    raw = transcripts_table(generate_transcripts(spark, n_entities=60, dup_rate=1.8))
    is_new = F.substring("conv_id", 1, 8).cast("int") >= 40
    base_dir = str(tmp_path / "base")
    # seed under a reserved epoch partition so the stream's epoch-keyed
    # appends keep the directory layout consistently partitioned
    rollup_conversations(raw.filter(~is_new)).drop("turns").select(
        "conv_id", *HYDRATE_COLS
    ).write.parquet(base_dir + "/epoch=-1")
    in_dir = str(tmp_path / "in")
    raw.filter(is_new).write.parquet(in_dir)

    model = LinearModel(
        weights=[2.0, 1.0, 1.5, 0.8, 0.6, 0.3, 0.5, 1.2, 0.4, 0.3, 0.8, 0.8, 0.8, 0.4, 1.0, 2.0],
        intercept=-6.0,
        threshold=0.5,
    )
    q = stream_link(
        spark,
        in_dir,
        base_dir,
        str(tmp_path / "matches"),
        str(tmp_path / "ckpt"),
        model,
    )
    q.awaitTermination()

    matches = spark.read.parquet(str(tmp_path / "matches"))
    rows = matches.collect()
    assert len(rows) > 0
    assert all(r.pred == 1 for r in rows)
    # duplicates of the same new entity share the entity prefix
    same_entity = [r for r in rows if r.id_A.split("_")[0] == r.id_B.split("_")[0]]
    assert len(same_entity) > 0


def test_stream_entities_maintains_assignment_and_golden(spark, tmp_path):
    """Two waves of match edges stream through stream_entities; the final
    snapshot's assignment AND golden table must equal the batch recompute
    over the union of all edges."""
    from record_linkage_spark.operators.clustering import assign_entities
    from record_linkage_spark.operators.rollup import rollup_conversations
    from record_linkage_spark.operators.survivorship import golden_records
    from record_linkage_spark.streaming.incremental import stream_entities
    from record_linkage_spark.synth.transcripts import (
        generate_transcripts,
        transcripts_table,
    )

    raw = transcripts_table(generate_transcripts(spark, n_entities=40, dup_rate=2.0))
    profiles = rollup_conversations(raw).drop("turns")
    base_dir = str(tmp_path / "profiles")
    profiles.write.parquet(base_dir + "/epoch=-1")

    # true edges: chain convs of the same hidden entity (conv_id prefix)
    convs = sorted(r.conv_id for r in profiles.select("conv_id").collect())
    by_ent = {}
    for c in convs:
        by_ent.setdefault(c.split("_")[0], []).append(c)
    all_edges = [
        (g[i], g[i + 1]) for g in by_ent.values() for i in range(len(g) - 1)
    ]
    assert len(all_edges) >= 4
    half = len(all_edges) // 2
    matches_dir = str(tmp_path / "matches")
    schema = "id_A string, id_B string"
    spark.createDataFrame(all_edges[:half], schema).write.mode(
        "append"
    ).parquet(matches_dir)

    args = (
        spark,
        matches_dir,
        base_dir,
        str(tmp_path / "assign"),
        str(tmp_path / "golden"),
        str(tmp_path / "ckpt"),
    )
    stream_entities(*args).awaitTermination()
    spark.createDataFrame(all_edges[half:], schema).write.mode(
        "append"
    ).parquet(matches_dir)
    stream_entities(*args).awaitTermination()

    # latest snapshot
    import os

    def latest(d):
        eps = [int(n.split("=")[1]) for n in os.listdir(d) if n.startswith("epoch=")]
        return spark.read.parquet(f"{d}/epoch={max(eps)}")

    got_assign = latest(str(tmp_path / "assign"))
    edges_df = spark.createDataFrame(all_edges, schema).select(
        F.col("id_A").alias("src"), F.col("id_B").alias("dst")
    )
    linked_ids = (
        edges_df.select(F.col("src").alias("conv_id"))
        .unionByName(edges_df.select(F.col("dst").alias("conv_id")))
        .distinct()
    )
    want_assign = assign_entities(linked_ids, edges_df)
    assert sorted(map(tuple, got_assign.collect())) == sorted(
        map(tuple, want_assign.collect())
    )

    fuse = dict(
        id_col="conv_id",
        mode_cols=("first_role", "primary_tool"),
        longest_col="last_text_norm",
        sum_cols=("n_tokens", "n_turns"),
    )
    prof_cols = ["conv_id", "first_role", "primary_tool", "last_text_norm",
                 "n_tokens", "n_turns"]
    want_golden = golden_records(
        profiles.select(*prof_cols), want_assign, **fuse
    )
    got_golden = latest(str(tmp_path / "golden"))
    assert sorted(map(tuple, got_golden.collect())) == sorted(
        map(tuple, want_golden.collect())
    )
