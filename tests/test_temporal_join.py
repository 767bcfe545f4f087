"""AS-OF and RANGE temporal joins: hand truth tables, a pandas
merge_asof reference on randomized data, brute-force equivalence for
the interval join, bucket-width invariance, and parallelism
invariance."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.temporal_join import asof_join, range_join

L_SCHEMA = "k string, ts double, ev string"
R_SCHEMA = "k string, ts double, px double"


def test_asof_hand_table(spark):
    left = spark.createDataFrame(
        [("a", 10.0, "e1"), ("a", 20.0, "e2"), ("a", 5.0, "e0"), ("b", 7.0, "e3")],
        L_SCHEMA,
    )
    right = spark.createDataFrame(
        [("a", 10.0, 1.5), ("a", 15.0, 2.5), ("b", 99.0, 9.9)], R_SCHEMA
    )
    out = {
        r.ev: (r.r_ts, r.r_px)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out["e1"] == (10.0, 1.5)   # inclusive: equal ts matches
    assert out["e2"] == (15.0, 2.5)   # latest preceding wins
    assert out["e0"] == (None, None)  # nothing precedes
    assert out["e3"] == (None, None)  # right exists but only in the future


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame([("a", 100.0, "e")], L_SCHEMA)
    right = spark.createDataFrame([("a", 10.0, 1.0)], R_SCHEMA)
    fresh = asof_join(left, right, on=["k"], tolerance=200.0).collect()[0]
    stale = asof_join(left, right, on=["k"], tolerance=50.0).collect()[0]
    assert fresh.r_px == 1.0
    assert stale.r_px is None and stale.r_ts is None


def test_asof_matches_pandas_merge_asof(spark):
    rng = random.Random(3)
    lrows = [
        (f"k{rng.randrange(4)}", round(rng.uniform(0, 1000), 3), f"e{i}")
        for i in range(120)
    ]
    rrows = [
        (f"k{rng.randrange(4)}", round(rng.uniform(0, 1000), 3), float(i))
        for i in range(80)
    ]
    got = {
        r.ev: r.r_px
        for r in asof_join(
            spark.createDataFrame(lrows, L_SCHEMA),
            spark.createDataFrame(rrows, R_SCHEMA),
            on=["k"],
        ).collect()
    }
    lp = pd.DataFrame(lrows, columns=["k", "ts", "ev"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "px"]).sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in ref.iterrows():
        want = None if pd.isna(row.px) else row.px
        assert got[row.ev] == want, row.ev


def test_range_join_equals_brute_force_and_bucket_invariance(spark):
    rng = random.Random(9)
    events = [
        (f"u{rng.randrange(3)}", round(rng.uniform(0, 500), 2), i)
        for i in range(100)
    ]
    ivs = []
    for j in range(25):
        s = round(rng.uniform(0, 480), 2)
        ivs.append((f"u{rng.randrange(3)}", s, round(s + rng.uniform(1, 60), 2), j))
    ev = spark.createDataFrame(events, "k string, ts double, eid int")
    iv = spark.createDataFrame(ivs, "k string, start double, end double, iid int")
    brute = {
        (e[2], v[3])
        for e in events
        for v in ivs
        if e[0] == v[0] and v[1] <= e[1] <= v[2]
    }
    for bucket in (5.0, 37.0, 1000.0):
        got = {
            (r.eid, r.iid)
            for r in range_join(
                ev, iv, on=["k"], bucket_seconds=bucket
            ).collect()
        }
        assert got == brute, bucket


def test_parallelism_invariance(spark):
    rng = random.Random(5)
    lrows = [(f"k{rng.randrange(3)}", float(i * 7 % 97), f"e{i}") for i in range(60)]
    rrows = [(f"k{rng.randrange(3)}", float(i * 11 % 89), float(i)) for i in range(40)]
    l1 = spark.createDataFrame(lrows, L_SCHEMA)
    r1 = spark.createDataFrame(rrows, R_SCHEMA)
    key = lambda rows: sorted(  # noqa: E731
        (r.ev, r.r_ts, r.r_px) for r in rows
    )
    a = key(asof_join(l1.coalesce(1), r1.coalesce(1), on=["k"]).collect())
    b = key(asof_join(l1.repartition(7), r1.repartition(5), on=["k"]).collect())
    assert a == b
