"""Blocking-key learning: pick a small disjunction of blocking keys that
covers the labeled positive pairs without blowing the candidate-pair
budget — the batch, Spark-native analogue of Dedupe's predicate learner
(reference ``src/matching/dedupe.py:196-228``: the vendor trains blocking
predicates from labeled pairs inside its console loop; here the same
greedy weighted set cover runs over DataFrame aggregates).

Greedy weighted set cover: each round, every remaining candidate key is
scored by how many still-uncovered positive pairs it would cover; the
key with the highest gain wins (ties -> lower estimated pair cost, then
name). Selection stops at ``max_keys``, when the marginal gain falls
below ``min_gain``, or when adding the key would exceed
``max_pair_budget`` (estimated candidate pairs = Σ C(n_block, 2), the
quadratic cost blocking exists to bound).

Scale shape: the labeled pair table is the small, bounded one (the same
defense as the LR fit, ``classifier.py:103``); hydration is two joins
against the records' key projection. Per-key pair-cost estimates ride
ONE postings aggregation (unpivot -> groupBy(key, value) -> Σ n(n-1)/2,
the meta-blocking pattern). The greedy loop collects ONE row of k
conditional sums per round — rounds are bounded by ``max_keys``, so
driver work is O(max_keys × k) numbers, never pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def learn_blocking_keys(
    records: DataFrame,
    labeled_pairs: DataFrame,
    candidate_keys: dict[str, Column],
    id_col: str = "doc_id",
    id_a: str = "id_A",
    id_b: str = "id_B",
    label_col: str = "label",
    max_keys: int = 3,
    max_pair_budget: int | None = None,
    min_gain: int = 1,
) -> dict:
    """Returns ``{"keys": [names...], "covered": int, "positives": int,
    "est_pairs": int, "per_key": {name: {"cost": int, "gain_at_pick":
    int}}}`` — the chosen disjunction plus the evidence behind it."""
    names = list(candidate_keys)
    keyed = records.select(
        F.col(id_col).alias("_id"),
        *[expr.cast("string").alias(f"_k_{n}") for n, expr in candidate_keys.items()],
    )

    # positive pairs hydrated with both sides' key values -> coverage flags
    pos = labeled_pairs.where(F.col(label_col) == 1).select(
        F.col(id_a).alias("_ia"), F.col(id_b).alias("_ib")
    )
    a = keyed.select(
        F.col("_id").alias("_ia"),
        *[F.col(f"_k_{n}").alias(f"_ka_{n}") for n in names],
    )
    b = keyed.select(
        F.col("_id").alias("_ib"),
        *[F.col(f"_k_{n}").alias(f"_kb_{n}") for n in names],
    )
    cov = pos.join(a, "_ia").join(b, "_ib").select(
        *[
            (
                F.col(f"_ka_{n}").isNotNull()
                & (F.col(f"_ka_{n}") != "")
                & F.col(f"_ka_{n}").eqNullSafe(F.col(f"_kb_{n}"))
            ).alias(f"_cov_{n}")
            for n in names
        ]
    ).localCheckpoint()
    n_pos = cov.count()

    # estimated candidate pairs per key: one unpivoted aggregation
    postings = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("kname"), F.col(f"_k_{n}").alias("kval")
                    )
                    for n in names
                ]
            )
        ).alias("kv")
    ).select("kv.kname", "kv.kval").where(
        F.col("kval").isNotNull() & (F.col("kval") != "")
    )
    cost_rows = (
        postings.groupBy("kname", "kval")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("kname")
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
        .collect()
    )
    cost = {r.kname: int(r.pairs) for r in cost_rows}

    chosen: list[str] = []
    per_key: dict[str, dict] = {}
    est_pairs = 0
    covered = 0
    uncovered = cov
    for _ in range(max_keys):
        remaining = [n for n in names if n not in chosen]
        if not remaining:
            break
        gains_row = uncovered.agg(
            *[
                F.sum(F.col(f"_cov_{n}").cast("long")).alias(n)
                for n in remaining
            ]
        ).first()
        affordable = [
            n
            for n in remaining
            if max_pair_budget is None
            or est_pairs + cost.get(n, 0) <= max_pair_budget
        ]
        if not affordable:
            break
        # highest gain, then cheapest, then name — deterministic
        best = max(
            affordable,
            key=lambda n: (gains_row[n] or 0, -cost.get(n, 0), n),
        )
        gain = gains_row[best] or 0
        if gain < min_gain:
            break
        chosen.append(best)
        per_key[best] = {"cost": cost.get(best, 0), "gain_at_pick": int(gain)}
        est_pairs += cost.get(best, 0)
        covered += int(gain)
        uncovered = uncovered.where(~F.col(f"_cov_{best}")).localCheckpoint()

    return {
        "keys": chosen,
        "covered": covered,
        "positives": n_pos,
        "est_pairs": est_pairs,
        "per_key": per_key,
    }
