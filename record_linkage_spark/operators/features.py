"""Comparison-vector builder (M1, ``src/matching/logistic_regression.py:68-96``).

Per hydrated pair, a fixed-order feature vector:
  * 4 JW-thresholded string features (>=0.85 / >=0.70 binarized), computed
    from TWO Arrow-batched kernel calls (first_text_norm, last_text_norm) —
    each JW value is reused for both thresholds, the kernel never runs
    twice on the same strings
  * 6 exact comparators (null -> 0)
  * 4 gaussian numeric comparators
  * 2 continuous extras the reference's libraries supply internally:
    normalized Levenshtein (built-in, JVM) and token-Jaccard (array
    built-ins) — F2/F5
Everything except the two JW calls is whole-stage-codegen column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from record_linkage_spark.config import (
    GAUSS_DURATION,
    GAUSS_N_TURNS,
    GAUSS_TOKENS,
    JW_FEATURE_THRESHOLD_HIGH,
    JW_FEATURE_THRESHOLD_LOW,
)
from record_linkage_spark.functions.comparators import exact_match, gauss_sim
from record_linkage_spark.functions.similarity import (
    jaro_winkler_pairs,
    levenshtein_sim,
    token_jaccard_sets,
)

# profile columns a pair table must carry (suffixed _A/_B) to build features
FEATURE_INPUT_COLS = [
    "first_text_norm",
    "last_text_norm",
    "token_prefix",
    "first_role",
    "primary_tool",
    "n_turns",
    "n_user_turns",
    "n_tool_turns",
    "n_tokens",
    "duration_sec",
    "token_hash_set",
]

FEATURE_NAMES = [
    "jw_first_high",
    "jw_first_low",
    "jw_last_high",
    "jw_last_low",
    "x_n_turns",
    "x_first_role",
    "x_primary_tool",
    "x_token_prefix",
    "x_n_user_turns",
    "x_has_tool",
    "g_n_turns",
    "g_duration",
    "g_tokens",
    "g_tool_turns",
    "lev_prefix",
    "jac_tokens",
]


def add_features(
    pairs: DataFrame,
    token_set_cols: tuple[str, str] = ("token_hash_set_A", "token_hash_set_B"),
) -> DataFrame:
    """Hydrated pair table -> + per-feature columns + ``features`` array.

    ``token_set_cols``: the pair columns the ``jac_tokens`` feature reads.
    Default is the profile's xxhash token-hash set (cheapest shuffle
    payload); pass plain string-token-set columns for the SQL-portable
    variant (identical Jaccard value on deduplicated inputs — only the
    set representation differs)."""
    jw_first = jaro_winkler_pairs(F.col("first_text_norm_A"), F.col("first_text_norm_B"))
    jw_last = jaro_winkler_pairs(F.col("last_text_norm_A"), F.col("last_text_norm_B"))
    df = pairs.withColumn("_jw_first", jw_first).withColumn("_jw_last", jw_last)

    has_tool_a = (F.col("n_tool_turns_A") > 0).cast("string")
    has_tool_b = (F.col("n_tool_turns_B") > 0).cast("string")

    feats = {
        "jw_first_high": (F.col("_jw_first") >= JW_FEATURE_THRESHOLD_HIGH).cast("double"),
        "jw_first_low": (F.col("_jw_first") >= JW_FEATURE_THRESHOLD_LOW).cast("double"),
        "jw_last_high": (F.col("_jw_last") >= JW_FEATURE_THRESHOLD_HIGH).cast("double"),
        "jw_last_low": (F.col("_jw_last") >= JW_FEATURE_THRESHOLD_LOW).cast("double"),
        "x_n_turns": exact_match("n_turns_A", "n_turns_B"),
        "x_first_role": exact_match("first_role_A", "first_role_B"),
        "x_primary_tool": exact_match("primary_tool_A", "primary_tool_B"),
        "x_token_prefix": exact_match("token_prefix_A", "token_prefix_B"),
        "x_n_user_turns": exact_match("n_user_turns_A", "n_user_turns_B"),
        "x_has_tool": exact_match(has_tool_a, has_tool_b),
        "g_n_turns": gauss_sim(
            F.col("n_turns_A").cast("double"),
            F.col("n_turns_B").cast("double"),
            *GAUSS_N_TURNS,
        ),
        "g_duration": gauss_sim("duration_sec_A", "duration_sec_B", *GAUSS_DURATION),
        "g_tokens": gauss_sim(
            F.col("n_tokens_A").cast("double"),
            F.col("n_tokens_B").cast("double"),
            *GAUSS_TOKENS,
        ),
        "g_tool_turns": gauss_sim(
            F.col("n_tool_turns_A").cast("double"),
            F.col("n_tool_turns_B").cast("double"),
            0.0,
            2.0,
        ),
        "lev_prefix": levenshtein_sim("token_prefix_A", "token_prefix_B"),
        "jac_tokens": token_jaccard_sets(*token_set_cols),
    }
    for name in FEATURE_NAMES:
        df = df.withColumn(name, feats[name])
    df = df.withColumn("features", F.array(*[F.col(n) for n in FEATURE_NAMES]))
    return df.drop("_jw_first", "_jw_last")


# --- M4: Dedupe-style feature set -----------------------------------------

# profile columns the dedupe-style vector needs (suffixed _A/_B)
DEDUPE_FEATURE_INPUT_COLS = [
    "first_text_norm",
    "last_text_norm",
    "token_prefix",
    "first_role",
    "primary_tool",
    "n_turns",
    "n_tokens",
    "duration_sec",
]

DEDUPE_FEATURE_NAMES = [
    "ag_first",        # affine-gap sim, first_text_norm (String field)
    "ag_last",         # affine-gap sim, last_text_norm (String field)
    "ag_prefix",       # affine-gap sim, token_prefix (String field)
    "cat_first_role",  # Categorical: exact
    "cat_tool",        # Categorical: exact
    "price_n_turns",   # Price-style: |log ratio| clamped
    "price_n_tokens",  # Price-style
    "price_duration",  # Price-style
    "miss_any",        # has_missing indicator
]


def _price_sim(a, b):
    """Dedupe's Price field compares |log10(a) - log10(b)|; map to a [0,1]
    similarity: 1 - min(|log10((a+1)/(b+1))|, 1). Null/negative -> 0."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    la = F.log10(a.cast("double") + F.lit(1.0))
    lb = F.log10(b.cast("double") + F.lit(1.0))
    d = F.abs(la - lb)
    return F.when(
        a.isNull() | b.isNull() | (a < 0) | (b < 0), F.lit(0.0)
    ).otherwise(F.lit(1.0) - F.least(d, F.lit(1.0)))


def add_dedupe_features(pairs: DataFrame) -> DataFrame:
    """Hydrated pair table -> M4 "Dedupe-style" comparison vector.

    Mirrors the reference's dedupe field classes
    (``src/matching/dedupe.py:157-194``): String fields scored with a
    normalized affine-gap comparator (independent Gotoh kernel,
    ``functions/similarity.py``), Categorical fields as exact agreement,
    Price fields as log-ratio proximity, plus a has_missing indicator —
    re-targeted at transcript-profile columns. Three Arrow kernel calls
    (the affine-gap legs); everything else whole-stage codegen.
    """
    from record_linkage_spark.functions.similarity import affine_gap_pairs

    feats = {
        "ag_first": affine_gap_pairs(
            F.col("first_text_norm_A"), F.col("first_text_norm_B")
        ),
        "ag_last": affine_gap_pairs(
            F.col("last_text_norm_A"), F.col("last_text_norm_B")
        ),
        "ag_prefix": affine_gap_pairs(
            F.col("token_prefix_A"), F.col("token_prefix_B")
        ),
        "cat_first_role": exact_match("first_role_A", "first_role_B"),
        "cat_tool": exact_match("primary_tool_A", "primary_tool_B"),
        "price_n_turns": _price_sim("n_turns_A", "n_turns_B"),
        "price_n_tokens": _price_sim("n_tokens_A", "n_tokens_B"),
        "price_duration": _price_sim("duration_sec_A", "duration_sec_B"),
        "miss_any": (
            F.col("first_text_norm_A").isNull()
            | F.col("first_text_norm_B").isNull()
            | F.col("primary_tool_A").isNull()
            | F.col("primary_tool_B").isNull()
        ).cast("double"),
    }
    df = pairs
    for name in DEDUPE_FEATURE_NAMES:
        df = df.withColumn(name, feats[name])
    return df.withColumn(
        "features", F.array(*[F.col(n) for n in DEDUPE_FEATURE_NAMES])
    )
