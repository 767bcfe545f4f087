"""Truth-table tests for the transcript structural-QA operators."""

import datetime as dt

from pyspark.sql import functions as F

from record_linkage_spark.operators.transcript_checks import (
    prefix_duplicate_pairs,
    transcript_integrity,
)


def _ts(minute: int):
    return dt.datetime(2025, 1, 1, 12, minute)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def test_integrity_truth_table(spark):
    rows = [
        # clean conversation
        ("ok", 0, "user", "hi", _ts(0)),
        ("ok", 1, "assistant", "hello", _ts(1)),
        ("ok", 2, "user", "bye", _ts(2)),
        # duplicate turn_idx (1 twice) + a gap (no idx 2) + empty text +
        # role repeat (two assistants adjacent) + ts regression at idx 3
        ("bad", 0, "user", "a", _ts(0)),
        ("bad", 1, "assistant", "b", _ts(1)),
        ("bad", 1, "assistant", "  ", _ts(2)),
        ("bad", 3, "user", "c", _ts(1)),
        # starts at 1, otherwise fine
        ("off", 1, "user", "x", _ts(0)),
        ("off", 2, "assistant", "y", _ts(1)),
    ]
    out = {
        r["conv_id"]: r.asDict()
        for r in transcript_integrity(_turns(spark, rows)).collect()
    }
    ok = out["ok"]
    assert ok["is_clean"] and ok["n_turns"] == 3
    assert (
        ok["n_dup_idx"] == ok["n_gaps"] == ok["n_empty"]
        == ok["n_ts_regress"] == 0
    )
    assert ok["n_role_repeats"] == 0
    bad = out["bad"]
    assert not bad["is_clean"]
    assert bad["n_dup_idx"] == 1  # idx 1 appears twice
    assert bad["n_gaps"] == 1  # span 0..3 covers 4 slots, 3 distinct
    assert bad["n_empty"] == 1  # whitespace-only text
    assert bad["n_role_repeats"] == 1  # assistant,assistant adjacency
    assert bad["n_ts_regress"] == 1  # idx 3 at minute 1 after minute 2
    off = out["off"]
    assert not off["is_clean"] and not off["starts_at_zero"]
    assert off["n_gaps"] == 0 and off["n_dup_idx"] == 0


def test_prefix_pairs_detects_strict_prefix_only(spark):
    rows = [
        # A: 4 turns; P: exact 2-turn prefix of A; E: identical to A
        # (equal length -> exact duplicate, NOT a prefix pair); C: shares
        # first turn text but diverges at turn 2
        ("A", 0, "u", "hello", _ts(0)),
        ("A", 1, "a", "world", _ts(1)),
        ("A", 2, "u", "more", _ts(2)),
        ("A", 3, "a", "done", _ts(3)),
        ("P", 0, "u", "hello", _ts(0)),
        ("P", 1, "a", "world", _ts(1)),
        ("E", 0, "u", "hello", _ts(0)),
        ("E", 1, "a", "world", _ts(1)),
        ("E", 2, "u", "more", _ts(2)),
        ("E", 3, "a", "done", _ts(3)),
        ("C", 0, "u", "hello", _ts(0)),
        ("C", 1, "a", "DIFFERENT", _ts(1)),
    ]
    got = {
        (r["prefix_conv_id"], r["super_conv_id"], r["prefix_len"], r["super_len"])
        for r in prefix_duplicate_pairs(_turns(spark, rows)).collect()
    }
    # P is a prefix of both full runs; equal-length twins A/E are not
    # reported (strict prefixes only); C diverges, no pair
    assert got == {("P", "A", 2, 4), ("P", "E", 2, 4)}


def test_prefix_hash_chain_is_boundary_safe(spark):
    # ["ab\x01c"] must NOT read as a prefix/equal of ["ab","c"] even
    # though a naive separator-concat of the texts is identical
    rows = [
        ("X", 0, "u", "ab\x01c", _ts(0)),
        ("Y", 0, "u", "ab", _ts(0)),
        ("Y", 1, "a", "c", _ts(1)),
    ]
    assert prefix_duplicate_pairs(_turns(spark, rows)).count() == 0


def test_prefix_pairs_null_text_matches_empty(spark):
    # coalesce(text,'') on both sides of the chain: a null turn and an
    # empty turn hash identically, so the prefix is still found
    rows = [
        ("S", 0, "u", None, _ts(0)),
        ("L", 0, "u", "", _ts(0)),
        ("L", 1, "a", "tail", _ts(1)),
    ]
    got = {
        (r["prefix_conv_id"], r["super_conv_id"])
        for r in prefix_duplicate_pairs(_turns(spark, rows)).collect()
    }
    assert got == {("S", "L")}


def test_prefix_pairs_plan_is_equality_hash_join(spark):
    rows = [
        ("A", 0, "u", "hello", _ts(0)),
        ("A", 1, "a", "world", _ts(1)),
        ("P", 0, "u", "hello", _ts(0)),
    ]
    plan = prefix_duplicate_pairs(
        _turns(spark, rows)
    )._jdf.queryExecution().executedPlan().toString()
    # candidate generation is an equality join on (hash, length) — never
    # a cross product, and no Python in the plan at all
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan


def test_resegment_truth_table(spark):
    from record_linkage_spark.operators.transcript_checks import (
        resegment_conversations,
    )

    rows = [
        # one conv, 35-min gap between idx 1 and 2 -> two segments,
        # turn_idx re-zeroed in the second
        ("A", 0, "u", "a", _ts(0)),
        ("A", 1, "a", "b", _ts(5)),
        ("A", 2, "u", "c", _ts(41)),
        ("A", 3, "a", "d", _ts(42)),
        # null ts never splits (conservative)
        ("B", 0, "u", "x", _ts(0)),
        ("B", 1, "a", "y", None),
        ("B", 2, "u", "z", _ts(50)),
    ]
    out = resegment_conversations(_turns(spark, rows), gap_minutes=30.0)
    assert set(out.columns) == {"conv_id", "turn_idx", "role", "text", "ts"}
    got = {
        (r.conv_id, r.turn_idx, r.text)
        for r in out.select("conv_id", "turn_idx", "text").collect()
    }
    assert got == {
        ("A#0", 0, "a"),
        ("A#0", 1, "b"),
        ("A#1", 0, "c"),
        ("A#1", 1, "d"),
        ("B#0", 0, "x"),
        ("B#0", 1, "y"),
        ("B#0", 2, "z"),
    }


def test_resegment_single_shuffle_plan(spark):
    from record_linkage_spark.operators.transcript_checks import (
        resegment_conversations,
    )

    rows = [("A", 0, "u", "a", _ts(0)), ("A", 1, "a", "b", _ts(50))]
    plan = resegment_conversations(
        _turns(spark, rows)
    )._jdf.queryExecution().executedPlan().toString()
    # the (conv_id, _seg) renumber window is a refinement of the gap
    # window's conv_id partitioning — Spark reuses the Exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan


def test_integrity_single_shuffle_plan(spark):
    rows = [("ok", 0, "user", "hi", _ts(0)), ("ok", 1, "assistant", "yo", _ts(1))]
    plan = transcript_integrity(
        _turns(spark, rows)
    )._jdf.queryExecution().executedPlan().toString()
    # the lag window and the groupBy share the conv_id partitioning:
    # exactly one shuffle in the whole plan
    assert plan.count("Exchange hashpartitioning") == 1
