"""JSONL ingest: permissive parse, semantic quarantine, clean-side
contract schema, rollup compatibility."""

from __future__ import annotations

import json

from record_linkage_spark.sources.ingest import ingest_report, read_jsonl_transcripts

GOOD = [
    {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",
     "tool": None, "ts": "2026-01-02 03:04:05"},
    {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hello",
     "tool": "search", "ts": "2026-01-02 03:04:06"},
    {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "null ts ok",
     "tool": None, "ts": None},
]
BAD = [
    ('{"conv_id": "c3", "turn_idx": 0, "role": "user"',        "bad_json"),
    ('{"conv_id": null, "turn_idx": 0, "text": "x"}',          "no_conv_id"),
    ('{"conv_id": "  ", "turn_idx": 0, "text": "x"}',          "no_conv_id"),
    ('{"conv_id": "c4", "turn_idx": -1, "text": "x"}',         "bad_turn_idx"),
    ('{"conv_id": "c5", "turn_idx": 99999999999, "text": "x"}', "bad_turn_idx"),
    ('{"conv_id": "c6", "text": "missing idx"}',               "bad_turn_idx"),
    ('{"conv_id": "c7", "turn_idx": 0, "ts": "not a time"}',   "bad_ts"),
]


def _write(tmp_path):
    p = tmp_path / "feed.jsonl"
    lines = [json.dumps(g) for g in GOOD] + [b for b, _ in BAD]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_side_contract(spark, tmp_path):
    clean, _ = read_jsonl_transcripts(spark, _write(tmp_path))
    rows = {(r.conv_id, r.turn_idx): r for r in clean.collect()}
    assert set(rows) == {("c1", 0), ("c1", 1), ("c2", 0)}
    assert dict(clean.dtypes) == {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }
    assert rows[("c1", 1)].tool == "search"
    assert rows[("c1", 0)].ts is not None
    assert rows[("c2", 0)].ts is None  # null ts stays clean


def test_quarantine_reasons_and_evidence(spark, tmp_path):
    _, quar = read_jsonl_transcripts(spark, _write(tmp_path))
    got = sorted((r.reason, r.raw) for r in quar.collect())
    reasons = [g[0] for g in got]
    assert sorted(reasons) == sorted(r for _, r in BAD)
    # bad_json preserves the original line verbatim
    bj = [raw for reason, raw in got if reason == "bad_json"]
    assert bj == [BAD[0][0]]
    # semantic rejects carry a reconstructed evidence line naming the id
    assert any("c4" in raw for reason, raw in got if reason == "bad_turn_idx")
    rep = {r.reason: r.n for r in ingest_report(quar).collect()}
    assert rep == {"bad_json": 1, "no_conv_id": 2, "bad_turn_idx": 3, "bad_ts": 1}


def test_nothing_lost(spark, tmp_path):
    clean, quar = read_jsonl_transcripts(spark, _write(tmp_path))
    assert clean.count() + quar.count() == len(GOOD) + len(BAD)


def test_clean_feed_has_empty_quarantine(spark, tmp_path):
    p = tmp_path / "ok.jsonl"
    p.write_text("\n".join(json.dumps(g) for g in GOOD) + "\n")
    clean, quar = read_jsonl_transcripts(spark, str(p))
    assert quar.count() == 0
    assert clean.count() == 3


def test_clean_side_feeds_rollup(spark, tmp_path):
    from record_linkage_spark.operators.rollup import rollup_conversations

    clean, _ = read_jsonl_transcripts(spark, _write(tmp_path))
    prof = rollup_conversations(clean)
    assert prof.filter(prof.conv_id == "c1").count() == 1


def test_parse_is_jvm_side(spark, tmp_path):
    clean, quar = read_jsonl_transcripts(spark, _write(tmp_path))
    for df in (clean, quar):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
            assert marker not in plan


def test_stream_ingest_two_waves_feed_linkage_stream(spark, tmp_path):
    """Streaming JSONL ingest: two waves with planted bad lines split
    into epoch-keyed clean parquet (== the batch reader over all input)
    and a quarantine that never loses a reject; the clean dir is
    directly consumable by the profile rollup."""
    from record_linkage_spark.operators.rollup import rollup_conversations
    from record_linkage_spark.sources.ingest import stream_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    dirs = [str(tmp_path / n) for n in ("clean", "quar", "ck")]

    (in_dir / "w1.jsonl").write_text(
        "\n".join([json.dumps(g) for g in GOOD[:2]] + [BAD[0][0], BAD[3][0]]) + "\n"
    )
    stream_ingest(spark, str(in_dir), *dirs).awaitTermination()
    (in_dir / "w2.jsonl").write_text(
        "\n".join([json.dumps(GOOD[2])] + [BAD[6][0]]) + "\n"
    )
    stream_ingest(spark, str(in_dir), *dirs).awaitTermination()

    clean = spark.read.parquet(dirs[0])
    quar = spark.read.parquet(dirs[1])
    assert {(r.conv_id, r.turn_idx) for r in clean.collect()} == {
        ("c1", 0), ("c1", 1), ("c2", 0)
    }
    assert sorted(r.reason for r in quar.collect()) == [
        "bad_json", "bad_ts", "bad_turn_idx"
    ]
    # contract-compatible: the linkage stream's first consumer runs as-is
    assert rollup_conversations(clean.drop("epoch")).count() == 2
