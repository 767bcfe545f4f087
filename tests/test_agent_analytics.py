"""Truth-table tests for the agent-transcript analytics operators."""

from pyspark.sql import functions as F

from record_linkage_spark.operators.agent_analytics import (
    boilerplate_turns,
    loop_runs,
    strip_boilerplate_turns,
    tool_transitions,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


BOILER = "You are a helpful assistant."


def test_boilerplate_catalog_and_strip(spark):
    rows = []
    # the same system prompt opens conversations c0..c4; each conv also
    # has one unique turn; conv c0 repeats the boilerplate twice
    for k in range(5):
        rows.append((f"c{k}", 0, "system", BOILER, None))
        rows.append((f"c{k}", 1, "user", f"unique question {k}", None))
    rows.append(("c0", 2, "system", BOILER, None))
    # a text repeated twice but inside ONE conversation: not boilerplate
    rows.append(("c1", 2, "user", "again", None))
    rows.append(("c1", 3, "user", "again", None))
    t = _turns(spark, rows)

    cat = boilerplate_turns(t, min_convs=3).collect()
    assert len(cat) == 1
    assert cat[0]["text"] == BOILER
    assert cat[0]["n_convs"] == 5 and cat[0]["n_turns"] == 6

    kept = strip_boilerplate_turns(t, min_convs=3)
    assert kept.columns == t.columns  # schema-preserving
    texts = [r["text"] for r in kept.collect()]
    assert BOILER not in texts
    assert len(texts) == len(rows) - 6  # exactly the boilerplate went
    assert texts.count("again") == 2  # within-conv repeats survive


def test_boilerplate_null_and_empty_hash_identically(spark):
    # null and '' are the same boilerplate key (coalesce before md5)
    rows = [(f"c{k}", 0, "user", None if k % 2 else "", None) for k in range(4)]
    rows.append(("c9", 0, "user", "real", None))
    cat = boilerplate_turns(_turns(spark, rows), min_convs=4).collect()
    assert len(cat) == 1 and cat[0]["n_convs"] == 4
    assert strip_boilerplate_turns(_turns(spark, rows), min_convs=4).count() == 1


def test_loop_runs_truth_table(spark):
    rows = [
        # clean conversation: no adjacent repeats
        ("ok", 0, "user", "a", None),
        ("ok", 1, "assistant", "b", None),
        ("ok", 2, "user", "a", None),  # same text later, not adjacent
        # looping agent: b,b,b run (len 3) then c, then d,d run (len 2);
        # same text different role at idx 6 is NOT a repeat
        ("loop", 0, "assistant", "b", None),
        ("loop", 1, "assistant", "b", None),
        ("loop", 2, "assistant", "b", None),
        ("loop", 3, "assistant", "c", None),
        ("loop", 4, "tool", "d", None),
        ("loop", 5, "tool", "d", None),
        ("loop", 6, "user", "d", None),
        # null texts repeat null-safely
        ("nul", 0, "tool", None, None),
        ("nul", 1, "tool", None, None),
    ]
    out = {r["conv_id"]: r.asDict() for r in loop_runs(_turns(spark, rows)).collect()}
    ok = out["ok"]
    assert ok["n_turns"] == 3 and ok["n_loop_turns"] == 0
    assert ok["n_loop_runs"] == 0 and ok["max_run_len"] == 1
    assert ok["loop_frac"] == 0.0
    lp = out["loop"]
    assert lp["n_turns"] == 7
    assert lp["n_loop_turns"] == 3  # 2 from the b-run + 1 from the d-run
    assert lp["n_loop_runs"] == 2 and lp["max_run_len"] == 3
    assert abs(lp["loop_frac"] - 3 / 7) < 1e-12
    nul = out["nul"]
    assert nul["n_loop_turns"] == 1 and nul["max_run_len"] == 2


def test_tool_transitions_truth_table(spark):
    rows = [
        # conv A: search -> read -> read ; non-tool turns interleaved
        ("A", 0, "user", "q", None),
        ("A", 1, "tool", "t", "search"),
        ("A", 2, "assistant", "x", None),
        ("A", 3, "tool", "t", "read"),
        ("A", 4, "tool", "t", "read"),
        # conv B: search -> read ; a null tool on a tool turn is skipped
        ("B", 0, "tool", "t", "search"),
        ("B", 1, "tool", "t", None),
        ("B", 2, "tool", "t", "read"),
        # conv C: a 'tool' VALUE on a non-tool role is ignored
        ("C", 0, "assistant", "x", "search"),
    ]
    got = {
        (r["prev_tool"], r["next_tool"]): (r["n"], r["n_convs"])
        for r in tool_transitions(_turns(spark, rows)).collect()
    }
    assert got == {
        ("^start", "search"): (2, 2),
        ("search", "read"): (2, 2),
        ("read", "read"): (1, 1),
    }


def test_tool_ngrams_truth_table(spark):
    from record_linkage_spark.operators.agent_analytics import tool_ngrams

    rows = [
        # A: search > read > write  (two 2-grams, one 3-gram)
        ("A", 0, "tool", "t", "search"),
        ("A", 1, "user", "q", None),  # non-tool turn ignored
        ("A", 2, "tool", "t", "read"),
        ("A", 3, "tool", "t", "write"),
        # B: search > read (shares the 2-gram with A)
        ("B", 0, "tool", "t", "search"),
        ("B", 1, "tool", "t", "read"),
        # C: single call — too short for any 2-gram
        ("C", 0, "tool", "t", "search"),
    ]
    t = _turns(spark, rows)
    g2 = {
        r.gram: (r.n_times, r.n_convs)
        for r in tool_ngrams(t, n=2).collect()
    }
    assert g2 == {
        "search>read": (2, 2),
        "read>write": (1, 1),
    }
    g3 = {r.gram: (r.n_times, r.n_convs) for r in tool_ngrams(t, n=3).collect()}
    assert g3 == {"search>read>write": (1, 1)}
    # n=1 degenerates to per-tool totals
    g1 = {r.gram: r.n_times for r in tool_ngrams(t, n=1).collect()}
    assert g1 == {"search": 3, "read": 2, "write": 1}


def test_transition_drift_truth_table(spark):
    from record_linkage_spark.operators.agent_analytics import transition_drift

    a = _turns(
        spark,
        [
            ("A", 0, "tool", "t", "search"),
            ("A", 1, "tool", "t", "read"),
            ("B", 0, "tool", "t", "search"),
            ("B", 1, "tool", "t", "read"),
        ],
    )
    # snapshot b: the search>read habit is gone, a write loop appeared
    b = _turns(
        spark,
        [
            ("C", 0, "tool", "t", "search"),
            ("C", 1, "tool", "t", "write"),
            ("C", 2, "tool", "t", "write"),
        ],
    )
    rows = {
        (r.prev_tool, r.next_tool): r
        for r in transition_drift(a, b).collect()
    }
    # a: ^start>search x2, search>read x2 (4 total); b: ^start>search,
    # search>write, write>write (3 total)
    assert rows[("search", "read")].n_a == 2 and rows[("search", "read")].n_b == 0
    assert abs(rows[("search", "read")].p_a - 0.5) < 1e-12
    assert rows[("search", "read")].abs_diff == rows[("search", "read")].p_a
    assert rows[("write", "write")].n_a == 0 and rows[("write", "write")].n_b == 1
    assert abs(rows[("write", "write")].p_b - 1 / 3) < 1e-12
    sstart = rows[("^start", "search")]
    assert abs(sstart.abs_diff - abs(0.5 - 1 / 3)) < 1e-12
    # total-variation distance = sum(abs_diff)/2, bounded by 1
    tv = sum(r.abs_diff for r in rows.values()) / 2
    assert 0 < tv < 1


def test_plan_shapes(spark):
    rows = [
        ("A", 0, "tool", "t", "search"),
        ("A", 1, "tool", "t", "read"),
        ("B", 0, "user", "t", None),
    ]
    t = _turns(spark, rows)
    # strip: anti join on the hash key, no cross product, no Python
    plan = strip_boilerplate_turns(t, min_convs=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Python" not in plan
    # transitions: window + final agg, all codegen, no Python
    plan2 = tool_transitions(t)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan2
    # loop_runs: every Exchange key leads with the conversation id —
    # no global repartition, state stays per-conversation
    plan3 = loop_runs(t)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan3
    for line in plan3.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "conv_id" in line.split("hashpartitioning", 1)[1][:60]


# ------------------------------------------------- cohorts and funnels


def _activity(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from record_linkage_spark.operators.agent_analytics import cohort_retention

    d = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # user 1 arrives week 0 (1970-01-01 is a Thursday; cohorts anchor
        # at the epoch), active again 7 and 14 days later
        (1, "x", d("1970-01-01T10:00")),
        (1, "x", d("1970-01-08T10:00")),
        (1, "x", d("1970-01-15T10:00")),
        # user 2 arrives same period, never returns
        (2, "x", d("1970-01-02T09:00")),
        # user 3 arrives a period later, returns once
        (3, "x", d("1970-01-09T09:00")),
        (3, "x", d("1970-01-17T09:00")),
        (4, "x", None),  # null ts dropped
    ]
    out = {
        (r.cohort, r.offset): r.n_users
        for r in cohort_retention(_activity(spark, rows), period_days=7).collect()
    }
    assert out[(0, 0)] == 2           # users 1 and 2
    assert out[(0, 1)] == 1           # only user 1 returns
    assert out[(0, 2)] == 1
    assert out[(1, 0)] == 1           # user 3
    assert out[(1, 1)] == 1
    assert (0, 3) not in out


def test_cohort_duplicate_events_count_once(spark):
    import datetime as dt

    from record_linkage_spark.operators.agent_analytics import cohort_retention

    t = dt.datetime.fromisoformat("1970-01-01T10:00")
    rows = [(1, "x", t)] * 5
    out = cohort_retention(_activity(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_users == 1


def test_event_funnel_strict_order(spark):
    import datetime as dt

    from record_linkage_spark.operators.agent_analytics import event_funnel

    d = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # user 1 completes a -> b -> c in order
        (1, "a", d("2026-01-01T10:00")),
        (1, "b", d("2026-01-01T11:00")),
        (1, "c", d("2026-01-01T12:00")),
        # user 2 does b BEFORE a — must not convert past step a
        (2, "b", d("2026-01-01T09:00")),
        (2, "a", d("2026-01-01T10:00")),
        # user 3 stops after b
        (3, "a", d("2026-01-01T10:00")),
        (3, "b", d("2026-01-01T10:30")),
        # user 4 never does step a
        (4, "b", d("2026-01-01T10:00")),
        (4, "c", d("2026-01-01T11:00")),
    ]
    out = {r.step: (r.n_users, r.frac_of_first) for r in event_funnel(
        _activity(spark, rows), ["a", "b", "c"]
    ).collect()}
    assert out["a"] == (3, 1.0)
    assert out["b"] == (2, round(2 / 3, 6))
    assert out["c"] == (1, round(1 / 3, 6))


def test_event_funnel_validation_and_invariance(spark):
    import datetime as dt

    import pytest

    from record_linkage_spark.operators.agent_analytics import event_funnel

    t0 = dt.datetime.fromisoformat("2026-01-01T10:00")
    rows = [
        (i, s, t0 + dt.timedelta(minutes=i * 3 + j))
        for i in range(30)
        for j, s in enumerate(["a", "b"])
    ]
    df = _activity(spark, rows)
    with pytest.raises(ValueError):
        event_funnel(df, [])
    a = sorted(map(tuple, event_funnel(df, ["a", "b"]).collect()))
    b = sorted(map(tuple, event_funnel(df.repartition(7), ["a", "b"]).collect()))
    assert a == b


def test_event_funnel_zero_first_step(spark):
    """When the FIRST step matches no users, frac_of_first is 0.0 for
    every step (the zero-denominator convention the DuckDB oracle twin
    mirrors with CASE WHEN n1 = 0 — ADVICE r4)."""
    from record_linkage_spark.operators.agent_analytics import event_funnel

    df = spark.createDataFrame(
        [("u1", "view", "2024-01-01 00:00:00")],
        "user_id string, event_type string, ts string",
    ).selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")
    out = event_funnel(df, ["signup", "view"]).collect()
    assert [(r.step, r.n_users, r.frac_of_first) for r in out] == [
        ("signup", 0, 0.0),
        ("view", 0, 0.0),
    ]
