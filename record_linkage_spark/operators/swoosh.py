"""Merge-based entity resolution (R-Swoosh, distributed D-Swoosh style).

Benjelloun et al., "Swoosh: a generic approach to entity resolution"
(VLDB Journal, 2009; reference pipeline has no counterpart — this is an
engine capability beyond pairwise score + cluster): resolution iterates
MATCH and MERGE to a fixpoint, because a merged record carries the UNION
of its constituents' evidence and can match records that no constituent
matched alone. Example (the paper's motivating shape): the rule is
"shared email OR (shared name token AND shared phone)"; r1 carries the
name, r2 carries the phone, and r1~r2 via email — only merge(r1, r2) can
match an r3 that needs name AND phone together. Pairwise scoring +
connected components — the standard scalable pipeline, including this
repo's — provably under-merges on such rules; this operator closes the
gap in a small number of distributed match-merge rounds.

Match and merge here satisfy the paper's ICAR properties (set-union
merge is Idempotent, Commutative, Associative and Representative, and
the overlap match respects merge domination), so the fixpoint is unique
and round-parallel execution returns exactly the sequential R-Swoosh
result — pinned by tests against a sequential driver-side reference.

The 100 TB shape (D-Swoosh's distribution idea): candidates come from
equality joins on the merged records' feature VALUES — never all-pairs —
so each round is (explode feature sets -> self-join on (feature, value)
-> predicate filter -> connected components -> one groupBy re-merge).
Rounds needed = length of the longest evidence-combination chain
(almost always 1-2 beyond the first); each round strictly decreases the
entity count, so termination is guaranteed without a fuel parameter.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.operators.clustering import connected_components


def dnf_overlap_matcher(
    clauses: Sequence[Sequence[str]],
) -> Callable[[Callable[[str], Column], Callable[[str], Column]], Column]:
    """Match predicate in disjunctive normal form over feature-set
    overlaps: ``[["email"], ["name", "phone"]]`` reads "share an email,
    OR (share a name token AND share a phone)". Overlap of unioned sets
    respects merge domination (a merged record overlaps wherever any
    constituent did), which is what makes the Swoosh fixpoint unique."""

    def match(a: Callable[[str], Column], b: Callable[[str], Column]) -> Column:
        disj = None
        for clause in clauses:
            conj = None
            for f in clause:
                c = F.size(F.array_intersect(a(f), b(f))) > 0
                conj = c if conj is None else (conj & c)
            disj = conj if disj is None else (disj | conj)
        return disj

    return match


def swoosh_resolve(
    records: DataFrame,
    feature_cols: Sequence[str],
    match_fn: Callable[[Callable[[str], Column], Callable[[str], Column]], Column]
    | None = None,
    clauses: Sequence[Sequence[str]] | None = None,
    id_col: str = "record_id",
    max_postings: int | None = None,
    max_rounds: int = 20,
) -> DataFrame:
    """Resolve ``records`` into merged entities by match-merge fixpoint.

    Each feature column is an ``array<string>`` value SET (null -> empty);
    merge is per-feature set union. ``match_fn(a, b)`` receives two
    getters returning the A-/B-side merged feature arrays and must return
    a boolean Column; pass ``clauses`` to use :func:`dnf_overlap_matcher`
    instead. Candidates per round are entity pairs sharing at least one
    (feature, value) key — complete for any overlap-based match, since a
    match requires at least one shared value somewhere.

    ``max_postings``: optional skew guard — drop key values present in
    more than this many entities from CANDIDATE GENERATION (corpus-wide
    boilerplate values; the match predicate itself still sees them).
    Dropping a key can only lose candidates, so leave it None when the
    match rule's recall is load-bearing.

    Returns one row per resolved entity:
    ``(entity_id, members array<id> sorted, n_rounds, <feature> unions)``
    with ``entity_id`` = min member id (stable, parallelism-invariant).
    """
    if match_fn is None:
        if clauses is None:
            raise ValueError("pass match_fn or clauses")
        match_fn = dnf_overlap_matcher(clauses)

    feats = list(feature_cols)
    entities = records.select(
        F.col(id_col).alias("_eid"),
        F.array(F.col(id_col)).alias("_members"),
        *[
            F.array_sort(
                F.array_distinct(
                    F.coalesce(F.col(f), F.array().cast("array<string>"))
                )
            ).alias(f)
            for f in feats
        ],
    ).localCheckpoint()

    rounds = 0
    for _ in range(max_rounds):
        keys = None
        for f in feats:
            k = entities.select(
                "_eid", F.lit(f).alias("_kt"), F.explode(f).alias("_kv")
            )
            keys = k if keys is None else keys.unionByName(k)
        if max_postings is not None:
            hot = (
                keys.groupBy("_kt", "_kv")
                .agg(F.count("*").alias("_c"))
                .filter(F.col("_c") > max_postings)
                .select("_kt", "_kv")
            )
            keys = keys.join(hot, ["_kt", "_kv"], "left_anti")
        cand = (
            keys.select("_kt", "_kv", F.col("_eid").alias("_ea"))
            .join(
                keys.select("_kt", "_kv", F.col("_eid").alias("_eb")),
                ["_kt", "_kv"],
            )
            .filter(F.col("_ea") < F.col("_eb"))
            .select("_ea", "_eb")
            .distinct()
        )
        a_side = entities.select(
            F.col("_eid").alias("_ea"), *[F.col(f).alias(f"_a_{f}") for f in feats]
        )
        b_side = entities.select(
            F.col("_eid").alias("_eb"), *[F.col(f).alias(f"_b_{f}") for f in feats]
        )
        hyd = cand.join(a_side, "_ea").join(b_side, "_eb")
        matched = (
            hyd.filter(
                match_fn(
                    lambda f: F.col(f"_a_{f}"), lambda f: F.col(f"_b_{f}")
                )
            )
            .select("_ea", "_eb")
            .localCheckpoint()
        )
        if matched.isEmpty():
            break
        rounds += 1
        comp = connected_components(matched, src_col="_ea", dst_col="_eb")
        entities = (
            entities.join(
                comp.select(
                    F.col("conv_id").alias("_eid"),
                    F.col("entity_id").alias("_neid"),
                ),
                "_eid",
                "left",
            )
            .withColumn("_neid", F.coalesce("_neid", "_eid"))
            .groupBy("_neid")
            .agg(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("_members")))
                ).alias("_members"),
                *[
                    F.array_sort(
                        F.array_distinct(F.flatten(F.collect_list(f)))
                    ).alias(f)
                    for f in feats
                ],
            )
            .withColumnRenamed("_neid", "_eid")
            .localCheckpoint()
        )

    return entities.select(
        F.col("_eid").alias("entity_id"),
        F.col("_members").alias("members"),
        F.lit(rounds).alias("n_rounds"),
        *feats,
    )
