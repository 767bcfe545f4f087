"""Agent-transcript analytics: cross-conversation boilerplate turns,
intra-conversation loop runs, and tool-transition mining.

Three transcript-specific passes a 10^12-turn agent-log ingest needs
beyond document-level curation (``operators/curation.py``) and the
structural QA in ``operators/transcript_checks.py``:

- **Boilerplate turns**: system prompts and templated tool preambles
  repeat verbatim across millions of conversations. Document-level
  dedup never sees them (each *conversation* is unique); left in, they
  dominate the token distribution exactly like C4's "repeated lines
  across documents" pathology, but at turn granularity. ``boilerplate_
  turns`` catalogs texts that appear in >= ``min_convs`` distinct
  conversations; ``strip_boilerplate_turns`` removes those turns.
- **Loop runs**: a stuck agent re-emits the same (role, text) turn
  back-to-back (retry loops, tool-error loops). ``loop_runs`` reports
  per-conversation run statistics so policy can drop or truncate
  looping conversations before they poison the training mix.
- **Tool transitions**: the corpus-level Markov transition counts
  between consecutive tool calls inside a conversation — the summary an
  agent-behavior dashboard reads (and a cheap drift detector between
  corpus snapshots).

Scale shape:
- ``boilerplate_turns`` shuffles (text_hash) pairs once with map-side
  combine; the catalog it emits is tiny (texts crossing the
  ``min_convs`` bar). ``strip_boilerplate_turns`` is a left_anti hash
  join of the corpus against that catalog on a 32-char key — AQE
  broadcasts the catalog side in practice, and the corpus payload
  never reshuffles.
- ``loop_runs`` partitions every window on ``conv_id``; the run-id
  cumsum, the per-run sizes and the per-conversation rollup are all
  keyed by conv_id first, so per-conversation state stays
  O(turns-in-conv) and no key is hotter than the longest conversation.
- ``tool_transitions`` is one conv_id window plus a groupBy whose
  result cardinality is <= |tools|^2 — partial aggregation collapses it
  map-side.

All expressions are Catalyst built-ins; no Python runs per row
anywhere. The reference pipeline has no transcript-shaped analogue
(its inputs are flat product records, ``src/preparation/
preprocessing.py``); these operators extend the engine along the
training-data axis the same way ``operators/curation.py`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _text_hash(text_col: str):
    # null and empty hash identically, matching the null==empty turn
    # semantics of transcript_checks.prefix_hash_chain
    return F.md5(F.coalesce(F.col(text_col), F.lit("")))


def boilerplate_turns(
    turns: DataFrame,
    min_convs: int = 10,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Catalog of turn texts appearing in >= ``min_convs`` distinct
    conversations.

    Returns ``(text_hash, n_convs, n_turns, text)`` — ``text`` is the
    (unique modulo md5 collision) verbatim text, kept so the catalog is
    human-auditable. One (text_hash)-keyed aggregation with map-side
    combine; the output is the small head of the repeat distribution.
    """
    return (
        turns.select(
            _text_hash(text_col).alias("text_hash"),
            F.col(conv_col).alias("_conv"),
            F.coalesce(F.col(text_col), F.lit("")).alias("_text"),
        )
        .groupBy("text_hash")
        .agg(
            F.countDistinct("_conv").cast("long").alias("n_convs"),
            F.count("*").cast("long").alias("n_turns"),
            F.min("_text").alias("text"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def strip_boilerplate_turns(
    turns: DataFrame,
    min_convs: int = 10,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every turn whose text is boilerplate (appears in >=
    ``min_convs`` distinct conversations). Schema-preserving.

    left_anti on the 32-char hash against the small catalog side —
    the corpus never reshuffles, and AQE turns the probe into a
    broadcast join when the catalog fits.
    """
    catalog = boilerplate_turns(
        turns, min_convs=min_convs, conv_col=conv_col, text_col=text_col
    ).select("text_hash")
    return (
        turns.withColumn("_th", _text_hash(text_col))
        .join(catalog.withColumnRenamed("text_hash", "_th"), "_th", "left_anti")
        .drop("_th")
    )


def loop_runs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation statistics of consecutive identical turns.

    A turn is a *loop turn* when its (role, text) equals the
    immediately preceding turn's (null-safe on text) in ``turn_idx``
    order; a *run* is a maximal block of identical consecutive turns.
    Returns per conversation::

        (conv_id, n_turns, n_loop_turns, n_loop_runs, max_run_len,
         loop_frac)

    ``n_loop_runs`` counts runs of length >= 2, ``max_run_len`` is the
    longest run (1 when the conversation never repeats), ``loop_frac``
    = n_loop_turns / n_turns. Downstream policy thresholds these (e.g.
    drop conversations with loop_frac > 0.5 or max_run_len > 8) the
    same way doc-level quality filters threshold repetition signals
    (``operators/curation.py::repetition_signals``).

    Every aggregation is keyed by conv_id first (window, run sizing,
    rollup), so state stays O(turns-in-conv).
    """
    c, i, r, t = conv_col, idx_col, role_col, text_col
    w = Window.partitionBy("conv_id").orderBy("_i")
    stepped = turns.select(
        F.col(c).alias("conv_id"),
        F.col(i).alias("_i"),
        F.col(r).alias("_role"),
        F.col(t).alias("_text"),
    ).select(
        "conv_id",
        "_i",
        F.when(
            (F.lag("_role").over(w) == F.col("_role"))
            & F.lag("_text").over(w).eqNullSafe(F.col("_text")),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("_new_run"),
    )
    runs = (
        stepped.withColumn(
            "_run_id",
            F.sum("_new_run").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("conv_id", "_run_id")
        .agg(F.count("*").cast("long").alias("_run_len"))
    )
    return (
        runs.groupBy("conv_id")
        .agg(
            F.sum("_run_len").cast("long").alias("n_turns"),
            F.sum(F.col("_run_len") - 1).cast("long").alias("n_loop_turns"),
            F.sum(F.when(F.col("_run_len") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_loop_runs"),
            F.max("_run_len").cast("long").alias("max_run_len"),
        )
        .withColumn(
            "loop_frac",
            (F.col("n_loop_turns") / F.col("n_turns")).cast("double"),
        )
    )


def tool_ngrams(
    turns: DataFrame,
    n: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
    sep: str = ">",
) -> DataFrame:
    """Frequent order-``n`` tool-call sequences across the corpus.

    The order-n generalization of :func:`tool_transitions` (which is the
    n=2 case with a start token): each conversation's tool-call sequence
    contributes its length-n windows, counted corpus-wide with
    distinct-conversation support — the mining pass behind "what
    multi-step tool workflows do agents actually run".

    Returns ``(gram, n_times, n_convs)`` with ``gram`` the
    ``sep``-joined tool names. One conv_id shuffle builds the ordered
    call arrays (rollup-shaped); the window slicing is per-row array
    work; the final groupBy's cardinality is bounded by distinct
    observed sequences and combines map-side.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    c, i, r, tl = conv_col, idx_col, role_col, tool_col
    calls = (
        turns.filter((F.col(r) == "tool") & F.col(tl).isNotNull())
        .groupBy(F.col(c).alias("_conv"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(i).alias("i"), F.col(tl).alias("t")))
            ).alias("_seq")
        )
        .select("_conv", F.col("_seq.t").alias("_tools"))
    )
    # guard: sequence(1, stop) REVERSES when stop < 1 (step defaults to
    # -1), so too-short conversations must yield an explicit empty array
    starts = F.when(
        F.size("_tools") >= n,
        F.sequence(F.lit(1), F.size("_tools") - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = calls.select(
        "_conv",
        F.explode(
            F.transform(starts, lambda j: F.array_join(F.slice("_tools", j, n), sep))
        ).alias("gram"),
    )
    return grams.groupBy("gram").agg(
        F.count("*").cast("long").alias("n_times"),
        F.countDistinct("_conv").cast("long").alias("n_convs"),
    )


def transition_drift(
    turns_a: DataFrame,
    turns_b: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Tool-transition distribution drift between two corpus snapshots.

    Normalizes each snapshot's :func:`tool_transitions` counts into a
    probability distribution over (prev_tool, next_tool) and full-outer
    aligns them — the monitoring pass that flags agent-behavior change
    between ingests (a new tool loop, a workflow that disappeared).
    Returns one row per transition observed in EITHER snapshot::

        (prev_tool, next_tool, n_a, n_b, p_a, p_b, abs_diff)

    ``sum(abs_diff)/2`` over the result is total-variation distance.
    Cost: two transition minings (one conv shuffle each, tiny outputs)
    + a full outer join and two single-row totals on <= |tools|^2 rows.
    """
    kw = dict(
        conv_col=conv_col, idx_col=idx_col, role_col=role_col, tool_col=tool_col
    )
    ta = tool_transitions(turns_a, **kw).select(
        "prev_tool", "next_tool", F.col("n").alias("n_a")
    )
    tb = tool_transitions(turns_b, **kw).select(
        "prev_tool", "next_tool", F.col("n").alias("n_b")
    )
    keys = ["prev_tool", "next_tool"]
    # joined feeds two actions (the totals aggregate and the output
    # select) — materialize it (<= |tools|^2 + |tools| rows) so each
    # snapshot's conv-window transition mining runs ONCE, not once per
    # consumer
    joined = (
        ta.join(tb, keys, "full_outer")
        .withColumn("n_a", F.coalesce("n_a", F.lit(0)).cast("long"))
        .withColumn("n_b", F.coalesce("n_b", F.lit(0)).cast("long"))
    ).localCheckpoint()
    tot = joined.agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    out = joined.crossJoin(F.broadcast(tot)).select(
        *keys,
        "n_a",
        "n_b",
        (F.col("n_a") / F.greatest(F.col("_ta"), F.lit(1))).alias("p_a"),
        (F.col("n_b") / F.greatest(F.col("_tb"), F.lit(1))).alias("p_b"),
    )
    return out.withColumn("abs_diff", F.abs(F.col("p_a") - F.col("p_b")))


def tool_transitions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
    start_token: str = "^start",
) -> DataFrame:
    """Markov transition counts between consecutive tool calls.

    Considers only tool turns (``role == 'tool'`` with a non-null
    tool), orders them by ``turn_idx`` within each conversation, and
    counts ``(prev_tool, next_tool)`` adjacencies; a conversation's
    first tool call transitions from ``start_token``. Returns
    ``(prev_tool, next_tool, n, n_convs)`` — ``n_convs`` is how many
    distinct conversations exhibit the transition.

    One conv_id window shuffle, then a groupBy with <= |tools|^2 +
    |tools| output rows that partial aggregation collapses map-side.
    """
    c, i, r, tl = conv_col, idx_col, role_col, tool_col
    w = Window.partitionBy("_conv").orderBy("_i")
    calls = turns.filter(
        (F.col(r) == "tool") & F.col(tl).isNotNull()
    ).select(F.col(c).alias("_conv"), F.col(i).alias("_i"), F.col(tl).alias("next_tool"))
    return (
        calls.select(
            "_conv",
            F.coalesce(F.lag("next_tool").over(w), F.lit(start_token)).alias(
                "prev_tool"
            ),
            "next_tool",
        )
        .groupBy("prev_tool", "next_tool")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("_conv").cast("long").alias("n_convs"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix over an activity stream: users are
    cohorted by their FIRST active day (bucketed into ``period_days``
    periods anchored at the Unix epoch), and each later active period
    contributes one cell — ``(cohort, offset, n_users)`` where
    ``offset`` counts periods since the user's first activity. The
    classic product-analytics readout ("of the users who arrived in
    week W, how many were still active k weeks later"), here over
    agent/transcript activity.

    Scale shape: one distinct over (user, day) — the only O(events)
    shuffle, map-side combinable — then a groupBy(user) min for the
    cohort anchor, a hash join of the two user-keyed frames (same key,
    same partitioning), and a final groupBy bounded by
    cohorts x offsets. Deterministic calendar math only (no sessions,
    no randomness), so the SQL oracle replays it exactly.
    """
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    u, d = F.col(user_col), F.to_date(F.col(ts_col))
    act = (
        events.filter(F.col(ts_col).isNotNull() & u.isNotNull())
        .select(u.alias("user"), d.alias("day"))
        .distinct()
    )
    first = act.groupBy("user").agg(F.min("day").alias("first_day"))
    epoch = F.lit("1970-01-01").cast("date")
    j = act.join(first, "user")
    return (
        j.select(
            F.floor(
                F.datediff(F.col("first_day"), epoch) / period_days
            ).alias("cohort"),
            F.floor(
                F.datediff(F.col("day"), F.col("first_day")) / period_days
            ).alias("offset"),
            F.col("user"),
        )
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("user").alias("n_users"))
    )


def event_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strict-order funnel: a user converts through step ``i`` only if
    step ``i``'s event happens STRICTLY AFTER their earliest completion
    of step ``i-1`` (the standard sequential-funnel semantics — doing
    checkout before ever searching does not count). Returns
    ``(step_idx, step, n_users, frac_of_first)``.

    Scale shape: per step ONE filtered groupBy(user) min-timestamp over
    the events that beat the previous step's time, joined user-to-user
    — k steps cost k bounded aggregates and k equality joins on the
    user key (the reached-user table only shrinks); nothing collects
    and no window over the raw stream is needed.

    NOTE — eager execution: unlike the other operators in this module,
    this runs k Spark jobs AT CALL TIME (one ``localCheckpoint`` +
    ``count()`` per step — each step's reached-user frame is the next
    step's join input, so the counts are materialized sequentially)
    and returns a small driver-built frame of k rows. Call it as a
    terminal reporting step, not inside a lazy plan composition. If
    the first step matches zero users, ``frac_of_first`` is 0.0 for
    every step (the zero-denominator convention, mirrored by the
    DuckDB oracle twin).
    """
    if not steps:
        raise ValueError("at least one funnel step is required")
    u, ts = F.col(user_col), F.col(ts_col)
    base = events.filter(ts.isNotNull() & u.isNotNull())
    reached = None  # (user, t_prev)
    counts = []
    for i, step in enumerate(steps):
        ev = base.filter(F.col(type_col) == step).select(
            u.alias("user"), ts.alias("_t")
        )
        if reached is None:
            cur = ev.groupBy("user").agg(F.min("_t").alias("_t_prev"))
        else:
            cur = (
                ev.join(reached, "user")
                .filter(F.col("_t") > F.col("_t_prev"))
                .groupBy("user")
                .agg(F.min("_t").alias("_t_prev"))
            )
        reached = cur.localCheckpoint()
        counts.append((i, step, reached.count()))
    n0 = counts[0][2]
    import math

    def _round6(x: float) -> float:
        # half-up to match SQL round() (python round() is banker's)
        return math.floor(x * 1e6 + 0.5) / 1e6

    spark = events.sparkSession
    return spark.createDataFrame(
        [
            (i, s, n, _round6(n / n0) if n0 else 0.0)
            for i, s, n in counts
        ],
        "step_idx int, step string, n_users long, frac_of_first double",
    )
