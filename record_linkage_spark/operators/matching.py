"""One-to-one matching: restrict scored pairs so every record matches at
most one other record — the ``recordlinkage`` library's one-to-one
post-processing and the standard constraint when linking two
deduplicated sources.

Sequential greedy (sort all pairs by score, accept a pair iff neither
endpoint is taken) is inherently serial; the distributed form used here
is LOCALLY-DOMINANT edge matching (Preis 1999 / Manne-Bisseling): each
round, every node nominates its best incident edge under a strict total
order, edges nominated by BOTH endpoints are accepted, matched nodes and
their incident edges drop out, repeat. Because the order is strict
(score desc, then pair ids — no ties survive), the result EQUALS the
sequential greedy matching exactly: the globally best remaining edge is
always locally dominant, and induction over acceptance order does the
rest (asserted against a driver-side greedy reference in tests).

Scale shape: a round is two groupBys — nodes pick their best edge
(map-side combinable min_by), then edges count their nominations — plus
an anti-join to drop matched endpoints; all shuffles key on node/pair
ids, never a cartesian. Rounds converge in O(log n) expected (each
round accepts at least the globally best remaining edge, and typically
a constant fraction); per-round ``localCheckpoint`` truncates the plan
exactly like the connected-components loop (``clustering.py``). At
10^12 records this is a handful of bounded shuffle rounds over a
pair table that blocking already made near-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def one_to_one_matching(
    pairs: DataFrame,
    id_a: str = "id_A",
    id_b: str = "id_B",
    score_col: str = "score",
    max_rounds: int = 50,
) -> DataFrame:
    """Greedy 1:1 matching over scored pairs. Returns the accepted subset
    of ``pairs`` (same columns). Both endpoint columns must share a type;
    duplicate (id_A, id_B) rows must be deduplicated by the caller."""
    remaining = pairs.select(
        F.col(id_a).alias("_a"), F.col(id_b).alias("_b"),
        F.col(score_col).alias("_s"),
    ).localCheckpoint()
    accepted = None

    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        # strict total order: best = min of (-score, id_A, id_B)
        okey = F.struct(
            (-F.col("_s")).alias("neg_s"),
            F.col("_a").alias("ka"),
            F.col("_b").alias("kb"),
        )
        edge = F.struct("_a", "_b", "_s")
        nominations = (
            remaining.select(F.col("_a").alias("_node"), edge.alias("_e"), okey.alias("_k"))
            .unionByName(
                remaining.select(
                    F.col("_b").alias("_node"), edge.alias("_e"), okey.alias("_k")
                )
            )
            .groupBy("_node")
            .agg(F.min_by("_e", "_k").alias("best"))
        )
        # locally dominant = nominated by both endpoints
        dominant = (
            nominations.groupBy("best")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") == 2)
            .select("best._a", "best._b", "best._s")
            .localCheckpoint()
        )
        accepted = (
            dominant if accepted is None else accepted.unionByName(dominant)
        )
        matched = (
            dominant.select(F.col("_a").alias("_node"))
            .unionByName(dominant.select(F.col("_b").alias("_node")))
            .distinct()
        )
        remaining = (
            remaining.join(
                matched, remaining["_a"] == matched["_node"], "left_anti"
            )
            .join(matched, F.col("_b") == matched["_node"], "left_anti")
            .localCheckpoint()
        )

    else:
        if not remaining.isEmpty():
            raise RuntimeError(
                f"one_to_one_matching did not converge in {max_rounds} "
                "rounds (every round accepts at least the globally best "
                "remaining edge, so raise max_rounds)"
            )

    if accepted is None:
        accepted = pairs.sparkSession.createDataFrame(
            [], remaining.schema
        )
    # hand back the caller's rows/columns for the accepted pairs
    return pairs.join(
        accepted.select(
            F.col("_a").alias(id_a), F.col("_b").alias(id_b)
        ),
        [id_a, id_b],
        "left_semi",
    )
