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
