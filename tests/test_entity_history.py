"""SCD2 entity attribute history: hand truth tables (run collapse,
null values, open runs, same-ts tiebreak), a pure-python reference on
randomized streams, point-in-time reads, and parallelism invariance."""

import random

from pyspark.sql import functions as F

from record_linkage_spark.operators.entity_history import (
    attribute_history,
    golden_asof,
)

SCHEMA = "entity_id bigint, ts double, value string, obs_id bigint"


def _hist(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return attribute_history(df, tiebreak_col="obs_id", **kw)


def test_runs_collapse_and_close(spark):
    rows = [
        (1, 10.0, "x", 1),
        (1, 20.0, "x", 2),   # repeat -> same run
        (1, 30.0, "y", 3),   # change -> new run, closes the first
        (1, 40.0, "x", 4),   # back to x -> THIRD run (runs, not values)
        (2, 5.0, "z", 5),
    ]
    out = {
        (r.entity_id, r.version): (
            r.value, r.valid_from, r.valid_to, r.n_observations
        )
        for r in _hist(spark, rows).collect()
    }
    assert out[(1, 0)] == ("x", 10.0, 30.0, 2)
    assert out[(1, 1)] == ("y", 30.0, 40.0, 1)
    assert out[(1, 2)] == ("x", 40.0, None, 1)   # open run
    assert out[(2, 0)] == ("z", 5.0, None, 1)
    assert len(out) == 4


def test_null_values_are_runs(spark):
    rows = [
        (1, 1.0, "a", 1),
        (1, 2.0, None, 2),   # cleared -> its own run
        (1, 3.0, None, 3),   # still cleared -> same run (null-safe)
        (1, 4.0, "a", 4),
    ]
    out = sorted(
        (r.version, r.value, r.n_observations)
        for r in _hist(spark, rows).collect()
    )
    assert out == [(0, "a", 1), (1, None, 2), (2, "a", 1)]


def test_same_ts_tiebreak_is_deterministic(spark):
    rows = [(1, 10.0, "b", 2), (1, 10.0, "a", 1)]
    out = {r.version: r.value for r in _hist(spark, rows).collect()}
    # obs_id order: 'a' (obs 1) observed before 'b' (obs 2)
    assert out == {0: "a", 1: "b"}


def test_golden_asof_half_open(spark):
    rows = [(1, 10.0, "x", 1), (1, 30.0, "y", 2)]
    h = _hist(spark, rows).cache()
    at = lambda t: {r.entity_id: r.value for r in golden_asof(h, t).collect()}
    assert at(9.9) == {}            # entity did not exist yet
    assert at(10.0) == {1: "x"}     # takes effect AT observation
    assert at(29.9) == {1: "x"}
    assert at(30.0) == {1: "y"}     # half-open: new value wins at boundary
    assert at(1e9) == {1: "y"}      # open run extends forever


def _py_reference(rows):
    """Sequential SCD2 reference."""
    by_e = {}
    for e, ts, v, oid in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        by_e.setdefault(e, []).append((ts, v))
    out = {}
    for e, obs in by_e.items():
        runs = []
        for ts, v in obs:
            if not runs or runs[-1][0] != v:
                runs.append([v, ts, None, 1])
                if len(runs) > 1:
                    runs[-2][2] = ts
            else:
                runs[-1][3] += 1
        for i, (v, f, t, n) in enumerate(runs):
            out[(e, i)] = (v, f, t, n)
    return out


def test_matches_python_reference_randomized(spark):
    rng = random.Random(7)
    rows = [
        (rng.randrange(6), float(i), rng.choice(["a", "b", "c", None]), i)
        for i in range(300)
    ]
    got = {
        (r.entity_id, r.version): (
            r.value, r.valid_from, r.valid_to, r.n_observations
        )
        for r in _hist(spark, rows).collect()
    }
    assert got == _py_reference(rows)


def test_parallelism_invariance(spark):
    rng = random.Random(11)
    rows = [
        (rng.randrange(4), float(i), rng.choice(["a", "b"]), i)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, attribute_history(df.repartition(1), tiebreak_col="obs_id").collect()))
    b = sorted(map(tuple, attribute_history(df.repartition(17), tiebreak_col="obs_id").collect()))
    assert a == b


def test_single_exchange_plan(spark):
    """lag -> cumsum -> collapse -> lead must reuse ONE entity_id hash
    exchange (the 100 TB property: one shuffle of the stream)."""
    df = spark.createDataFrame([(1, 1.0, "a", 1)], SCHEMA)
    plan = (
        attribute_history(df, tiebreak_col="obs_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1
