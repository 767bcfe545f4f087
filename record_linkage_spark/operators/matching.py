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


def group_linkage(
    scored_pairs: DataFrame,
    groups: DataFrame,
    id_col: str = "record_id",
    group_col: str = "group_id",
    score_col: str = "score",
    min_score: float = 0.0,
) -> DataFrame:
    """Group linkage (On, Koudas, Lee, Srivastava, "Group Linkage",
    ICDE 2007): similarity between GROUPS of records — households,
    companies with many branch rows, author publication sets — is the
    total weight of a ONE-TO-ONE matching of their cross-group member
    pairs, normalized Jaccard-style:

        sim(A, B) = sum(matched scores) / (|A| + |B| - n_matched)

    (== 1.0 iff the groups match member-for-member with score 1; a
    single shared member in two large groups scores low — the property
    record-level max/avg aggregation lacks). The matching is the
    locally-dominant greedy 1:1 (== sequential greedy under the strict
    (score desc, ids) order, the standard 1/2-approximation to
    max-weight bipartite matching — the paper's BM_a greedy variant).

    ``groups`` maps record -> group (one group per record);
    ``scored_pairs`` is any record-level comparator output. Same-group
    pairs and pairs below ``min_score`` are ignored. Only group pairs
    with at least one surviving candidate edge appear (blocking decides
    the candidate set, as everywhere else in this engine).

    Scale shape: group tagging is two equality joins; the 1:1 rounds run
    over ALL group pairs at once by namespacing node ids with the
    (group_A, group_B) context — no per-group-pair driver loop; the
    final aggregate is one groupBy. Returns
    (group_A, group_B, n_a, n_b, n_matched, match_weight, sim).
    """
    sep = "\x01"
    g = groups.select(F.col(id_col).alias("_id"), F.col(group_col).alias("_g"))
    sizes = g.groupBy("_g").agg(F.count("*").alias("_sz"))
    p = (
        scored_pairs.select(
            F.col("id_A"), F.col("id_B"), F.col(score_col).alias("_s")
        )
        .filter(F.col("_s") >= min_score)
        .join(
            g.select(F.col("_id").alias("id_A"), F.col("_g").alias("_ga")),
            "id_A",
        )
        .join(
            g.select(F.col("_id").alias("id_B"), F.col("_g").alias("_gb")),
            "id_B",
        )
        .filter(F.col("_ga") != F.col("_gb"))
    )
    swap = F.col("_ga") > F.col("_gb")
    p = p.select(
        F.when(swap, F.col("_gb")).otherwise(F.col("_ga")).alias("group_A"),
        F.when(swap, F.col("_ga")).otherwise(F.col("_gb")).alias("group_B"),
        F.when(swap, F.col("id_B")).otherwise(F.col("id_A")).alias("_ra"),
        F.when(swap, F.col("id_A")).otherwise(F.col("id_B")).alias("_rb"),
        "_s",
    )
    # a record pair observed twice (both orientations / duplicate rows)
    # keeps its best score
    p = p.groupBy("group_A", "group_B", "_ra", "_rb").agg(
        F.max("_s").alias("_s")
    )
    ctx = F.concat_ws(
        sep, F.col("group_A").cast("string"), F.col("group_B").cast("string")
    )
    edges = p.select(
        "group_A",
        "group_B",
        F.concat_ws(sep, ctx, F.col("_ra").cast("string")).alias("_na"),
        F.concat_ws(sep, ctx, F.col("_rb").cast("string")).alias("_nb"),
        "_s",
    )
    acc = one_to_one_matching(edges, id_a="_na", id_b="_nb", score_col="_s")
    agg = acc.groupBy("group_A", "group_B").agg(
        F.count("*").alias("n_matched"),
        F.sum("_s").alias("match_weight"),
    )
    return (
        agg.join(
            sizes.select(F.col("_g").alias("group_A"), F.col("_sz").alias("n_a")),
            "group_A",
        )
        .join(
            sizes.select(F.col("_g").alias("group_B"), F.col("_sz").alias("n_b")),
            "group_B",
        )
        .select(
            "group_A",
            "group_B",
            "n_a",
            "n_b",
            "n_matched",
            "match_weight",
            (
                F.col("match_weight")
                / (F.col("n_a") + F.col("n_b") - F.col("n_matched"))
            ).alias("sim"),
        )
    )
