"""Privacy-preserving record linkage (PPRL): CLK Bloom-filter encodings.

Schnell, Bachteler & Reiher, "Privacy-preserving record linkage using
Bloom filters" (BMC Med Inform Decis Mak 2009) and the CLK variant
(Schnell et al. 2011): identifying fields are shredded into padded
q-grams, each gram sets k hash positions in an m-bit Bloom filter, and
parties compare ENCODINGS ONLY — the Dice coefficient over set bits
approximates q-gram Dice over the cleartext, so typo-tolerant linkage
runs without exchanging identifiers. Blocking follows Durham's Bloom-
LSH idea: split the filter into bands and bucket records whose band
BIT PATTERNS match exactly — near filters agree on most bits, so they
collide in at least one band with high probability.

Engine representation: an encoding is the SORTED ARRAY OF SET-BIT
POSITIONS (array<int>), not an m-length bitmap — set algebra
(array_intersect) gives |A∩B| directly, payload size tracks the
number of set bits (k x grams, << m), and everything stays in Catalyst.

Scale shape: encoding is a per-row expression chain (grams -> k
positions -> distinct sort) with the gram array bound once (HOF lambdas
re-evaluate referenced subtrees per element — see dedup.py); blocking
is one explode + groupBy + equality self-join on (band, pattern); Dice
scoring touches only candidate pairs. ``portable=True`` hashes with md5
(byte-identical from DuckDB — the ``pprl_dice`` oracle replays encode,
block and score end to end); default xxhash64 is the fast JVM path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(c: Column) -> Column:
    return F.lower(F.trim(F.coalesce(c, F.lit(""))))


def _padded_qgrams(c: Column, q: int) -> Column:
    """Distinct padded q-grams of a normalized field ('_john_' -> _j, jo,
    oh, hn, n_). Empty field -> no grams. The padded string is let-bound
    via a single-element transform so the substring loop does not
    re-evaluate the normalization per position."""

    def _body(s):
        n = F.greatest(F.length(s) - (q - 1), F.lit(0))
        return F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), n), lambda i: F.substring(s, i, q)
                ),
                lambda g: F.length(g) == q,
            )
        )

    padded = F.when(_norm(c) == "", F.lit(None)).otherwise(
        F.concat(F.lit("_"), _norm(c), F.lit("_"))
    )
    out = F.element_at(F.transform(F.array(padded), _body), 1)
    return F.coalesce(out, F.array().cast("array<string>"))


def clk_encode(
    records: DataFrame,
    field_cols: Sequence[str],
    id_col: str = "record_id",
    m: int = 512,
    k: int = 4,
    q: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Encode each record into a CLK: the union over all fields of the
    k hash positions of every field-tagged padded q-gram (tagging grams
    with their field name is the linkage-quality variant — 'jo' in a
    name and 'jo' in a city stay distinct). Returns
    ``(id, clk array<int> sorted, n_bits)``; a record with no non-empty
    field encodes to the empty filter."""
    def _tag(field: str):
        # closure factory, NOT a bound-default lambda: a two-parameter
        # HOF lambda is interpreted as (element, index) by pyspark
        return lambda x: F.concat(F.lit(field), F.lit("\x01"), x)

    grams = None
    for f in field_cols:
        g = F.transform(_padded_qgrams(F.col(f), q), _tag(f))
        grams = g if grams is None else F.concat(grams, g)

    if portable:
        # position_i(gram) = first 15 md5 hex chars of "i \x01 gram" mod m
        def pos_fn(i):
            return lambda g: F.conv(
                F.substring(F.md5(F.concat(i.cast("string"), F.lit("\x01"), g)), 1, 15),
                16,
                10,
            ).cast("long") % m
    else:
        def pos_fn(i):
            return lambda g: F.pmod(F.xxhash64(i, g), F.lit(m))

    positions = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.transform(F.col("_grams"), pos_fn(i)),
        )
    )
    return (
        records.select(F.col(id_col).alias("_id"), grams.alias("_grams"))
        .select(
            "_id",
            F.array_sort(F.array_distinct(positions)).cast("array<int>").alias("clk"),
        )
        .select(
            F.col("_id").alias(id_col),
            "clk",
            F.size("clk").alias("n_bits"),
        )
    )


def clk_band_keys(
    encodings: DataFrame,
    n_bands: int = 8,
    m: int = 512,
    id_col: str = "record_id",
) -> DataFrame:
    """Durham-style Bloom-LSH blocking keys: the filter's position range
    splits into ``n_bands`` contiguous bands; the key is the band's exact
    set-bit pattern. Empty bands emit pattern '' — candidate generation
    drops those (an all-zero band is no evidence, and the empty-pattern
    bucket would otherwise pair every sparse record quadratically).
    Returns (id, band, pattern)."""
    width = (m + n_bands - 1) // n_bands
    ex = encodings.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_bands - 1))
        ).alias("band"),
        F.col("clk"),
    )
    in_band = F.filter(
        F.col("clk"),
        lambda p: (p >= F.col("band") * width) & (p < (F.col("band") + 1) * width),
    )
    return ex.select(
        F.col("_id").alias(id_col),
        "band",
        F.concat_ws(",", F.transform(in_band, lambda p: p.cast("string"))).alias(
            "pattern"
        ),
    )


def clk_candidate_pairs(
    encodings: DataFrame,
    n_bands: int = 8,
    m: int = 512,
    id_col: str = "record_id",
) -> DataFrame:
    """Candidate pairs = records sharing at least one identical band
    pattern (id_A < id_B, deduped across bands)."""
    keys = clk_band_keys(encodings, n_bands=n_bands, m=m, id_col=id_col).filter(
        F.col("pattern") != ""
    )
    # explicit-N repartition on the band keys: AQE sizes the exchange by
    # the tiny (band, pattern, id) input and is blind to the
    # within-pattern pair blow-up (same defense as the LSH band joins)
    n_parts = max(
        encodings.sparkSession.sparkContext.defaultParallelism * 2, 8
    )
    a = keys.select("band", "pattern", F.col(id_col).alias("id_A")).repartition(
        n_parts, "band", "pattern"
    )
    b = keys.select("band", "pattern", F.col(id_col).alias("id_B")).repartition(
        n_parts, "band", "pattern"
    )
    return (
        a.join(b, ["band", "pattern"])
        .filter(F.col("id_A") < F.col("id_B"))
        .select("id_A", "id_B")
        .distinct()
    )


def dice_pairs(
    pairs: DataFrame,
    encodings: DataFrame,
    id_col: str = "record_id",
) -> DataFrame:
    """Dice coefficient over encodings for candidate pairs:
    ``2|A∩B| / (|A|+|B|)`` on set-bit position arrays (0.0 when both
    sides are empty filters). Adds ``dice``; hydration is two equality
    joins, scoring is pure Catalyst set algebra."""
    e = encodings.select(F.col(id_col).alias("_eid"), "clk", "n_bits")
    out = (
        pairs.join(
            e.select(
                F.col("_eid").alias("id_A"),
                F.col("clk").alias("_ca"),
                F.col("n_bits").alias("_na"),
            ),
            "id_A",
        )
        .join(
            e.select(
                F.col("_eid").alias("id_B"),
                F.col("clk").alias("_cb"),
                F.col("n_bits").alias("_nb"),
            ),
            "id_B",
        )
    )
    denom = F.col("_na") + F.col("_nb")
    dice = F.when(denom == 0, F.lit(0.0)).otherwise(
        2.0 * F.size(F.array_intersect("_ca", "_cb")) / denom
    )
    return out.select(*pairs.columns, dice.alias("dice"))
