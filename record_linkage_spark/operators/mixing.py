"""Domain-mixture planning and sampling — the "mixer" stage between
corpus curation and sequence packing in an LLM training-data pipeline.

Training mixes are specified as token WEIGHTS per domain/source (e.g.
web 0.6, code 0.25, reference 0.15 of a 10T-token budget), not row
fractions — and the right sampling behavior differs per domain:
oversupplied domains are downsampled (a hash fraction of one epoch)
while scarce high-quality domains are repeated for multiple epochs, up
to a repetition cap (past ~4 epochs repetition stops helping — Muennighoff
et al. 2305.16264's data-constrained scaling observation, which is why
the cap defaults to 4).

``plan_mixture`` turns (weights, token budget) into a per-domain plan —
available tokens, target tokens, full-epoch count, partial-epoch
fraction, achieved tokens — as a DataFrame of |domains| rows computed by
ONE aggregation over the corpus. ``sample_mixture`` applies a plan:
every document is emitted once per full epoch plus once more with
probability = the partial fraction, decided by a deterministic per-doc
hash, tagged with an ``epoch`` column (so downstream packing can
interleave epochs). The expected token total per domain equals the
plan's target; the deviation is the usual hash-sampling binomial noise,
which at training scale (billions of docs per domain) is negligible —
exact-prefix selection, when a hard budget matters more than unbiased
inclusion, is :func:`curation.token_budget_sample`.

Scale shape (100 TB): the plan is one groupBy over the corpus collapsed
to |domains| rows; sampling is a broadcast join of those rows plus a
pure per-row map (hash test + bounded ``sequence`` explode, multiplicity
capped by ``max_epochs``) — the corpus itself never shuffles. Both
portable (md5 60-bit) and fast (seeded xxhash64) hash modes follow the
repo-wide convention, so the portable mode has a byte-for-byte DuckDB
twin (contract entry ``pack_budget`` kind='mixplan'/'mixsel').

Reference scope: the reference engine has no mixing stage (it links one
dataset); this extends the curation layer the same way dedup/packing do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RANK_MAX = float(1 << 60)


def _hash60(col, portable: bool, seed: int):
    if portable:
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("long")
    return F.pmod(F.xxhash64(F.lit(seed), col), F.lit(1 << 60))


def plan_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    domain_col: str = "domain",
    token_col: str = "n_tokens",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Per-domain sampling plan for a target mixture.

    ``weights`` are relative (normalized internally); domains absent
    from it are dropped from the mix. Per domain:

    - ``target_tokens`` = total_tokens x normalized weight
    - ``epochs``        = target/available, capped at ``max_epochs``
    - ``n_full_epochs`` / ``frac_epoch``: integral and fractional parts
    - ``achieved_tokens`` = available x capped epochs (== target unless
      the cap binds; the shortfall is visible, never silent)

    One aggregation; output is |domains| rows (broadcastable by
    construction)."""
    wsum = float(sum(weights.values()))
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items())
          for x in (F.lit(k), F.lit(float(v) / wsum))]
    )
    toks = F.coalesce(F.col(token_col).cast("bigint"), F.lit(0))
    agg = (
        docs.select(F.col(domain_col).alias("domain"), toks.alias("_t"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_t").alias("available_tokens"),
        )
        .withColumn("weight", F.try_element_at(wmap, F.col("domain")))
        .filter(F.col("weight").isNotNull())
    )
    target = F.col("weight") * F.lit(float(total_tokens))
    epochs = F.least(
        F.lit(float(max_epochs)),
        target / F.greatest(F.col("available_tokens").cast("double"), F.lit(1.0)),
    )
    return agg.select(
        "domain",
        "n_docs",
        "available_tokens",
        F.round("weight", 6).alias("weight"),
        F.round(target, 6).alias("target_tokens"),
        F.floor(epochs).cast("bigint").alias("n_full_epochs"),
        F.round(epochs - F.floor(epochs), 6).alias("frac_epoch"),
        F.round(
            epochs * F.col("available_tokens").cast("double"), 6
        ).alias("achieved_tokens"),
    )


def sample_mixture(
    docs: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "domain",
    token_col: str = "n_tokens",
    portable: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Materialize a :func:`plan_mixture` plan: each doc appears once
    per full epoch, plus once more iff its 60-bit hash fraction falls
    below the domain's partial-epoch fraction — deterministic,
    re-partitioning-invariant, and unbiased (E[tokens] = target). Output
    rows carry ``epoch`` (0-based) so packing can interleave epochs
    rather than replay them back to back.

    Broadcast join on |domains| rows + per-row map; the corpus never
    shuffles. The explode multiplicity is bounded by the plan's epoch
    cap."""
    p = F.broadcast(
        plan.select("domain", "n_full_epochs", "frac_epoch")
    )
    hfrac = _hash60(F.col(id_col), portable, seed).cast("double") / F.lit(
        _RANK_MAX
    )
    copies = (
        F.col("n_full_epochs")
        + F.when(hfrac < F.col("frac_epoch"), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    joined = docs.withColumnRenamed(domain_col, "domain").join(p, "domain")
    return (
        joined.withColumn("_n", copies)
        .withColumn(
            "_ep",
            F.when(
                F.col("_n") > 0, F.sequence(F.lit(0), F.col("_n") - 1)
            ).otherwise(F.array().cast("array<int>")),
        )
        .select(
            F.col(id_col),
            "domain",
            F.coalesce(F.col(token_col).cast("bigint"), F.lit(0)).alias(
                "n_tokens"
            ),
            F.explode("_ep").alias("epoch"),
        )
    )
