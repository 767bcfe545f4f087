"""R-Swoosh merge-based ER: the merge-enables-match fixpoint semantics
(Benjelloun et al. VLDBJ 2009) against a sequential driver-side R-Swoosh
reference, the CC-under-merges contrast, idempotence, and parallelism
invariance."""

import pytest
from pyspark.sql import functions as F

from record_linkage_spark.operators.swoosh import swoosh_resolve

SCHEMA = (
    "record_id bigint, name array<string>, email array<string>, "
    "phone array<string>"
)
# match rule: shared email OR (shared name token AND shared phone)
CLAUSES = [["email"], ["name", "phone"]]

# The motivating chain: r1 (name, email) ~ r2 (email, phone) via email;
# r3 (name, phone) matches NEITHER alone (r1 lacks phone, r2 lacks name)
# but matches merge(r1, r2) via name AND phone. r4 is an unrelated
# singleton; r5~r6 share an email directly.
ROWS = [
    (1, ["john", "smith"], ["e1"], []),
    (2, [], ["e1"], ["p1"]),
    (3, ["john", "smith"], ["e2"], ["p1"]),
    (4, ["alice"], ["e9"], ["p9"]),
    (5, ["bob"], ["e5"], []),
    (6, ["robert"], ["e5"], ["p5"]),
]


def _matches(a: dict, b: dict) -> bool:
    def ov(f):
        return bool(set(a[f]) & set(b[f]))

    return ov("email") or (ov("name") and ov("phone"))


def _sequential_rswoosh(rows):
    """Driver-side R-Swoosh (the paper's Algorithm 2): pull a record from
    I, match against everything in O; on match remove the partner, merge
    (set union), push the merge back onto I; else add to O."""
    recs = [
        {
            "members": {r[0]},
            "name": set(r[1]),
            "email": set(r[2]),
            "phone": set(r[3]),
        }
        for r in rows
    ]
    out = []
    while recs:
        cur = recs.pop()
        partner = next((o for o in out if _matches(cur, o)), None)
        if partner is None:
            out.append(cur)
        else:
            out.remove(partner)
            recs.append(
                {
                    k: cur[k] | partner[k]
                    for k in ("members", "name", "email", "phone")
                }
            )
    return {frozenset(o["members"]) for o in out}


def _resolve(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return swoosh_resolve(df, ["name", "email", "phone"], clauses=CLAUSES, **kw)


def test_merge_enables_match_chain(spark):
    out = _resolve(spark, ROWS).collect()
    groups = {frozenset(r.members) for r in out}
    assert groups == {
        frozenset({1, 2, 3}),
        frozenset({4}),
        frozenset({5, 6}),
    }
    by_ent = {min(r.members): r for r in out}
    merged = by_ent[1]
    assert merged.entity_id == 1
    assert merged.name == ["john", "smith"]
    assert sorted(merged.email) == ["e1", "e2"]
    assert merged.phone == ["p1"]
    # r3 needed the merged evidence: two match-merge rounds, not one
    assert merged.n_rounds == 2


def test_equals_sequential_rswoosh(spark):
    assert {
        frozenset(r.members) for r in _resolve(spark, ROWS).collect()
    } == _sequential_rswoosh(ROWS)


def test_cc_over_pairwise_matches_undermerges(spark):
    """The standard pipeline (pairwise match on ORIGINAL records + CC)
    must miss r3 on this rule — the gap swoosh_resolve exists to close."""
    from itertools import combinations

    recs = {
        r[0]: {"name": set(r[1]), "email": set(r[2]), "phone": set(r[3])}
        for r in ROWS
    }
    pair_edges = [
        (a, b) for a, b in combinations(recs, 2) if _matches(recs[a], recs[b])
    ]
    assert (1, 2) in pair_edges and (5, 6) in pair_edges
    assert all(3 not in e for e in pair_edges)  # r3 matches nothing alone


def test_fixpoint_idempotent(spark):
    """Re-resolving the resolved entities (as records) changes nothing —
    the fixpoint is a fixpoint."""
    first = _resolve(spark, ROWS)
    again = swoosh_resolve(
        first.select(
            F.col("entity_id").alias("record_id"), "name", "email", "phone"
        ),
        ["name", "email", "phone"],
        clauses=CLAUSES,
    ).collect()
    assert {frozenset(r.members) for r in again} == {
        frozenset({1}),
        frozenset({4}),
        frozenset({5}),
    }
    assert all(r.n_rounds == 0 for r in again)


def test_parallelism_invariance(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = swoosh_resolve(
        df.coalesce(1), ["name", "email", "phone"], clauses=CLAUSES
    ).collect()
    b = swoosh_resolve(
        df.repartition(7), ["name", "email", "phone"], clauses=CLAUSES
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r.entity_id, tuple(r.members), tuple(r.name), tuple(r.email), tuple(r.phone))
        for r in rows
    )
    assert key(a) == key(b)


def test_longer_evidence_chain_and_random_agreement(spark):
    """Deterministic pseudo-random instance: swoosh == sequential
    reference on 40 records with colliding value pools."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                sorted(rng.sample(["a", "b", "c", "d", "e", "f"], 2)),
                sorted(rng.sample(["e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8"], 1)),
                sorted(rng.sample(["p1", "p2", "p3", "p4", "p5", "p6"], 1)),
            )
        )
    got = {
        frozenset(r.members) for r in _resolve(spark, rows).collect()
    }
    assert got == _sequential_rswoosh(rows)


def test_max_postings_guard_drops_boilerplate_key(spark):
    """A value present in every record is corpus boilerplate; with the
    guard at 2 it generates no candidates, so nothing merges through it."""
    rows = [
        (1, ["x"], ["shared"], []),
        (2, ["y"], ["shared"], []),
        (3, ["z"], ["shared"], []),
    ]
    out = swoosh_resolve(
        spark.createDataFrame(rows, SCHEMA),
        ["name", "email", "phone"],
        clauses=[["email"]],
        max_postings=2,
    ).collect()
    assert len(out) == 3
    full = swoosh_resolve(
        spark.createDataFrame(rows, SCHEMA),
        ["name", "email", "phone"],
        clauses=[["email"]],
    ).collect()
    assert len(full) == 1


def test_missing_match_spec_raises(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        swoosh_resolve(df, ["name"])
