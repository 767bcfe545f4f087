"""Transcript structural QA: per-conversation integrity checks and
prefix-duplicate conversation detection.

These are the validation passes a 10^12-turn transcript ingest needs
before the rollup (``operators/rollup.py``) trusts ``turn_idx`` as the
stable turn order the north-star invariant ("per-turn text equality
under stable turn ordering") is defined over. The reference pipeline
assumes well-formed rows after its preparation stage
(``src/preparation/preprocessing.py``); at scale that assumption must be
*checked*, not assumed, and retry-looped agent logs additionally produce
conversations that are exact turn-prefixes of their re-runs — a
transcript-specific duplication mode that document-level near-dup
(``operators/dedup.py``) does not see because the longer run is not
near-identical to the short one.

Scale shape (both operators):
- one hash shuffle on ``conv_id`` total — the window and the groupBy
  share the partitioning, so Catalyst plans a single Exchange;
- per-conversation state is O(turns-in-conv) (windows / one aggregate
  pass over the collected turn array), never O(corpus);
- prefix detection joins on computed 32-char hash keys with payload
  stripped to (conv_id, len) — an equality hash join, no cross product,
  and the exploded prefix side is exactly |turns| rows, the same order
  of magnitude as the input scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# joins chained-hash links; a raw separator byte inside a turn text can
# never forge a boundary because the left operand of every link is a
# 32-char md5 hex, not user text (see prefix_hash_chain)
_SEP = "\x01"


def transcript_integrity(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """One structural-QA row per conversation.

    Checks, per ``conv_id`` (each a count so downstream policy can
    threshold instead of hard-dropping):

    - ``n_dup_idx``      turns sharing a ``turn_idx`` with an earlier turn
      (duplicate indexes make "stable turn ordering" ambiguous);
    - ``n_gaps``         missing indexes inside [min_idx, max_idx];
    - ``starts_at_zero`` min(turn_idx) == 0;
    - ``n_empty``        null/whitespace-only texts;
    - ``n_role_repeats`` adjacent turns (in turn_idx order) with the same
      role — alternation violations;
    - ``n_ts_regress``   adjacent turns whose timestamp moves backwards
      relative to turn_idx order (both timestamps non-null);
    - ``is_clean``       no duplicate indexes, no gaps, starts at zero,
      no empty texts, no timestamp regressions. ``n_role_repeats`` is
      REPORTED but deliberately EXCLUDED from ``is_clean`` — same-role
      adjacency occurs naturally in valid transcripts (consecutive tool
      results, multi-part assistant turns), so it is a signal for
      downstream policy, not a structural defect.

    Single-shuffle plan: the lag window and the final groupBy both
    partition on ``conv_id``, so the aggregation reuses the window's
    Exchange. All expressions are Catalyst built-ins (codegen'd); no
    Python runs per row.
    """
    c, i, r, t, ts = conv_col, idx_col, role_col, text_col, ts_col
    # total order even under planted duplicate indexes: text as the final
    # tiebreak keeps the adjacency checks deterministic across engines
    w = Window.partitionBy(c).orderBy("_idx", "_ts", "_text")
    stepped = turns.select(
        c,
        F.col(i).cast("long").alias("_idx"),
        F.col(r).alias("_role"),
        F.col(t).alias("_text"),
        F.col(ts).alias("_ts"),
    ).select(
        c,
        "_idx",
        (F.lag("_idx").over(w) == F.col("_idx")).alias("_dup_prev"),
        (F.lag("_role").over(w) == F.col("_role")).alias("_role_rep"),
        (F.col("_ts") < F.lag("_ts").over(w)).alias("_ts_back"),
        (F.col("_text").isNull() | (F.trim("_text") == "")).alias("_empty"),
    )
    as_cnt = lambda col: F.coalesce(  # noqa: E731 — count of true flags
        F.sum(F.when(col, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
    ).cast("long")
    agg = stepped.groupBy(c).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.countDistinct("_idx").alias("_n_idx"),
        (F.max("_idx") - F.min("_idx") + 1).alias("_span"),
        (F.min("_idx") == 0).alias("starts_at_zero"),
        as_cnt(F.col("_empty")).alias("n_empty"),
        as_cnt(F.col("_role_rep")).alias("n_role_repeats"),
        as_cnt(F.col("_ts_back")).alias("n_ts_regress"),
    )
    out = agg.select(
        c,
        "n_turns",
        (F.col("n_turns") - F.col("_n_idx")).cast("long").alias("n_dup_idx"),
        (F.col("_span") - F.col("_n_idx")).cast("long").alias("n_gaps"),
        "starts_at_zero",
        "n_empty",
        "n_role_repeats",
        "n_ts_regress",
    )
    return out.withColumn(
        "is_clean",
        (F.col("n_dup_idx") == 0)
        & (F.col("n_gaps") == 0)
        & F.col("starts_at_zero")
        & (F.col("n_empty") == 0)
        & (F.col("n_ts_regress") == 0),
    )


def resegment_conversations(
    turns: DataFrame,
    gap_minutes: float = 30.0,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Split conversations at idle gaps into per-session segments.

    Agent logs frequently concatenate several user sessions under one
    ``conv_id``; rolling those up as one conversation smears unrelated
    sessions into one profile. A turn starts a new segment when its
    timestamp is more than ``gap_minutes`` after the previous turn's (in
    ``turn_idx`` order; a null timestamp on either side never splits —
    the conservative choice, mirroring ``event_sessions``' gap rule).

    Output is schema-preserving plus renumbering: ``conv_id`` becomes
    ``<conv_id>#<segment>`` (segment is 0-based) and ``turn_idx`` is
    re-zeroed within each segment, so the result feeds the rollup and
    every downstream operator unchanged.

    One conv_id shuffle: the gap lag, the segment cumsum and the
    within-segment renumbering all partition on ``conv_id`` first
    (the renumber window key is (conv_id, _seg) — a refinement of the
    same partitioning, no new Exchange).
    """
    c, i, ts = conv_col, idx_col, ts_col
    others = [x for x in turns.columns if x not in (c, i)]
    w = Window.partitionBy(c).orderBy(i)
    gap_sec = float(gap_minutes) * 60.0
    # TIMESTAMP_NTZ -> epoch needs an explicit timestamp cast under
    # Spark 4 ANSI (session pinned UTC)
    ep = F.col(ts).cast("timestamp").cast("double")
    stepped = turns.withColumn(
        "_new_seg",
        F.when(
            (ep - F.lag(ep).over(w)) > F.lit(gap_sec), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "_seg",
        F.sum("_new_seg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wseg = Window.partitionBy(c, "_seg").orderBy(i)
    return stepped.select(
        F.concat_ws("#", F.col(c), F.col("_seg").cast("string")).alias(c),
        (F.row_number().over(wseg) - 1).cast("int").alias(i),
        *others,
    )


def prefix_hash_chain(texts: Column) -> Column:
    """Chained-md5 prefix hashes for an ordered text array.

    ``h_k = md5(h_{k-1} || SEP || coalesce(text_k, ''))`` with
    ``h_0 = md5('')`` — returns ``[h_1 .. h_n]``. One O(n) pass per
    conversation (``F.aggregate`` threads the accumulator; the lambda
    touches only ``acc``/``x``, so nothing is re-evaluated per element).
    Chaining (hash-of-hash) rather than concatenating raw texts means a
    turn split ``["ab","c"]`` can never collide with ``["ab\\x01c"]``:
    every link's left operand is a fixed-width hex digest.
    """
    return F.slice(
        F.aggregate(
            texts,
            F.array(F.md5(F.lit(""))),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.md5(
                        F.concat(
                            F.element_at(acc, -1),
                            F.lit(_SEP),
                            F.coalesce(x, F.lit("")),
                        )
                    )
                ),
            ),
        ),
        2,
        F.size(texts),
    )


def prefix_duplicate_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Conversations that are strict turn-prefixes of another conversation.

    Agent-retry logs re-run a conversation and extend it; the aborted
    attempt is then a *prefix* of the kept one — turn-for-turn identical
    text until it stops. Document near-dup misses these (the long run's
    extra turns push Jaccard below threshold), so they need their own
    detector.

    Plan: one rollup-shaped pass per conversation builds the chained-md5
    prefix-hash array (``prefix_hash_chain``), then conversations whose
    FULL hash equals some longer conversation's k-th prefix hash are
    found with a plain equality join on ``(hash, length)`` — shuffle
    hash join on a 32-char key, candidate payload stripped to ids and
    lengths, no similarity verify needed (hash-chain equality implies
    turn-for-turn text equality modulo md5 collision, which we accept
    exactly as the exact-dedup path does for md5 doc keys).

    Returns ``(prefix_conv_id, prefix_len, super_conv_id, super_len)``
    with ``prefix_len < super_len`` strictly; identical full
    conversations are exact duplicates, already covered by
    ``dedup.exact_duplicates`` on the rolled-up text.
    """
    c, i, t = conv_col, idx_col, text_col
    per_conv = (
        turns.repartition(c)
        .sortWithinPartitions(c, i)
        .groupBy(c)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(i).alias("i"), F.col(t).alias("t")))
            ).alias("_turns")
        )
        .select(
            F.col(c).alias("conv_id"),
            prefix_hash_chain(F.col("_turns.t")).alias("_hashes"),
        )
        .select(
            "conv_id",
            F.size("_hashes").cast("int").alias("n_turns"),
            "_hashes",
        )
    )
    heads = per_conv.select(
        F.col("conv_id").alias("prefix_conv_id"),
        F.col("n_turns").alias("prefix_len"),
        F.element_at("_hashes", -1).alias("_full_hash"),
    )
    prefixes = per_conv.select(
        F.col("conv_id").alias("super_conv_id"),
        F.col("n_turns").alias("super_len"),
        F.posexplode("_hashes").alias("_pos", "_ph"),
    ).select(
        "super_conv_id",
        "super_len",
        (F.col("_pos") + 1).cast("int").alias("_plen"),
        "_ph",
    )
    return (
        prefixes.join(
            heads,
            on=[
                prefixes["_ph"] == heads["_full_hash"],
                prefixes["_plen"] == heads["prefix_len"],
            ],
            how="inner",
        )
        .filter(
            (F.col("super_len") > F.col("prefix_len"))
            & (F.col("super_conv_id") != F.col("prefix_conv_id"))
        )
        .select("prefix_conv_id", "prefix_len", "super_conv_id", "super_len")
    )
