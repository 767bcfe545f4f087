"""Deterministic synthetic conversation-transcript generator (Spark-native).

Produces the engine's input table per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — one row per turn — plus a hidden ground-truth key table
``(conv_id, entity_key)`` that plays the role of the reference's VIN
(``ground_truth.py:303-309``): never visible to blocking/scoring, only to
GT construction.

Everything is a pure column expression seeded by ``xxhash64`` of stable
keys — no ``rand()``, no ``monotonically_increasing_id`` — so output is
bit-identical at any parallelism level (local[8] == local[32]), which the
scaling benchmark requires. Duplicate conversations of one entity share
per-turn base text; perturbations (token substitution, case/punct noise,
dropped turns, role flips) are applied at hash-graded severity to copies
only, preserving the invariant *per-turn text equality under stable
turn ordering* for unperturbed turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from record_linkage_spark.config import RANDOM_SEED

# deterministic vocabulary; index 0 reserved
VOCAB = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras jump please update status report "
    "server config deploy rollback database query index table join filter "
    "aggregate window partition shuffle broadcast executor driver memory "
    "spill checkpoint lineage metric cluster entity record linkage block "
    "candidate pair score threshold match label train test split feature "
    "vector weight model predict result output input schema column type "
    "string number value null error retry timeout request response token "
    "session user agent tool call search read write file path branch merge "
    "commit review change patch test build run start stop check verify "
    "plan step task goal answer question help need want know think good "
    "great thanks sorry maybe sure here there when where what which time "
    "day week data rows keys salt skew scan push prune cache batch stream"
).split()

TOOLS = ["search", "calculator", "browser", "code_exec", "file_read", "db_query"]

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _h(tag: str, *cols):
    """Seeded deterministic 64-bit hash of stable keys."""
    return F.xxhash64(F.lit(RANDOM_SEED), F.lit(tag), *cols)


def _u(tag: str, *cols, mod: int = 1000):
    """Uniform-ish integer in [0, mod) from the seeded hash."""
    return F.pmod(_h(tag, *cols), F.lit(mod))


def generate_transcripts(
    spark: SparkSession,
    n_entities: int,
    dup_rate: float = 1.6,
    max_turns: int = 10,
    bad_key_pct: int = 2,
    partitions: int | None = None,
) -> DataFrame:
    """Return a DataFrame with TRANSCRIPT_COLS + hidden columns
    ``entity_id`` and ``entity_key`` (select TRANSCRIPT_COLS for the
    engine-visible table; see :func:`hidden_key_table`).

    dup_rate is the mean conversations per entity, distributed over
    {1,2,3} copies.
    """
    p2 = max(0.0, min((dup_rate - 1.0) / 1.5, 0.95))
    p3 = p2 / 4.0
    n_parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    ent = spark.range(0, n_entities, 1, n_parts).withColumnRenamed("id", "entity_id")

    # copies per entity in {1,2,3}; hash-uniform draw
    u = _u("copies", F.col("entity_id"), mod=10000) / 10000.0
    ent = ent.withColumn(
        "n_copies",
        F.when(u < F.lit(p3), F.lit(3))
        .when(u < F.lit(p3 + p2), F.lit(2))
        .otherwise(F.lit(1)),
    )

    convs = ent.select(
        "entity_id",
        F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_idx"),
    ).withColumn(
        "conv_id",
        F.concat_ws(
            "_", F.lpad(F.col("entity_id").cast("string"), 8, "0"), F.col("copy_idx")
        ),
    )

    # hidden exact key (VIN analogue): digits + mod-10 weighted check digit;
    # a small % of copies get a corrupted check digit so key validation
    # (ground_truth) has something to reject, like invalid VINs.
    digits = F.lpad(F.col("entity_id").cast("string"), 10, "0")
    weights = [7, 3, 1, 7, 3, 1, 7, 3, 1, 7]
    check = F.lit(0)
    for i, w in enumerate(weights):
        check = check + F.substring(digits, i + 1, 1).cast("int") * F.lit(w)
    check = F.pmod(check, F.lit(10))
    corrupt = _u("badkey", F.col("entity_id"), F.col("copy_idx"), mod=100) < F.lit(
        bad_key_pct
    )
    check_digit = F.when(corrupt, F.pmod(check + 1, F.lit(10))).otherwise(check)
    convs = convs.withColumn(
        "entity_key", F.concat(F.lit("EK"), digits, check_digit.cast("string"))
    )

    # per-entity base turn count (3..max_turns); copies may drop one turn
    base_turns = F.lit(3) + _u("nturns", F.col("entity_id"), mod=max_turns - 2)
    convs = convs.withColumn("base_turns", base_turns)
    # copy-level perturbation severity 0 (clean original) / 1 / 2
    sev = F.when(F.col("copy_idx") == 0, F.lit(0)).otherwise(
        F.lit(1) + _u("sev", F.col("entity_id"), F.col("copy_idx"), mod=2)
    )
    convs = convs.withColumn("severity", sev)

    turns = convs.select(
        "entity_id",
        "copy_idx",
        "conv_id",
        "entity_key",
        "base_turns",
        "severity",
        F.explode(F.sequence(F.lit(0), F.col("base_turns") - 1)).alias("slot"),
    )

    # dropped-turn perturbation: severity-2 copies drop one mid-conversation
    # turn ~35% of the time (never slot 0 — keeps the primary block key
    # mostly stable, mirroring B1's 0.98 blocking recall)
    drop_roll = _u("droproll", F.col("entity_id"), F.col("copy_idx"), mod=100)
    # dynamic mod: pick a drop slot in [1, base_turns-1]
    drop_slot = F.lit(1) + F.pmod(
        _h("dropslot", F.col("entity_id"), F.col("copy_idx")),
        F.greatest(F.col("base_turns") - 1, F.lit(1)),
    )
    dropped = (
        (F.col("severity") >= 2) & (drop_roll < 35) & (F.col("slot") == drop_slot)
    )
    turns = turns.filter(~dropped)

    # contiguous 0-based turn_idx after drops (deterministic window)
    w = Window.partitionBy("conv_id").orderBy("slot")
    turns = turns.withColumn("turn_idx", F.row_number().over(w) - 1)

    # roles: slot 0 user, then alternate assistant/user; some assistant
    # turns become tool turns; severity-2 copies flip one role ~20%
    base_role = (
        F.when(F.col("slot") == 0, F.lit("user"))
        .when(F.pmod(F.col("slot"), F.lit(2)) == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    is_tool_turn = (
        (F.pmod(F.col("slot"), F.lit(2)) == 1)
        & (_u("tool?", F.col("entity_id"), F.col("slot"), mod=5) == 0)
    )
    role = F.when(is_tool_turn, F.lit("tool")).otherwise(base_role)
    flip = (
        (F.col("severity") >= 2)
        & (_u("roleflip", F.col("entity_id"), F.col("copy_idx"), F.col("slot"), mod=100) < 5)
        & (F.col("slot") > 0)
    )
    role = F.when(flip & (role == "assistant"), F.lit("system")).otherwise(role)
    turns = turns.withColumn("role", role)

    tool_arr = F.array(*[F.lit(t) for t in TOOLS])
    turns = turns.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.element_at(tool_arr, (_u("tool", F.col("entity_id"), F.col("slot"), mod=len(TOOLS)) + 1).cast("int")),
        ).otherwise(F.lit(None).cast("string")),
    )

    # --- text: base words per (entity, slot); perturbations per copy ------
    vocab_arr = F.array(*[F.lit(wd) for wd in VOCAB])
    n_words = F.lit(4) + _u("nw", F.col("entity_id"), F.col("slot"), mod=9)
    # slot 0 is the stable "manufacturer-like" field: duplicates of one
    # entity keep its words intact (case/punct noise only, which the
    # normalizer removes), mirroring the reference where the B1 blocking
    # attribute is near-always identical within a VIN match; later turns
    # take word substitutions at severity-graded rates
    sub_rate = F.when(F.col("slot") == 0, F.lit(0)).otherwise(
        F.col("severity") * 6
    )  # 0 / 6% / 12% per-word substitution
    case_rate = F.col("severity") * 4
    punct_rate = F.col("severity") * 3

    eid, cid, slot = F.col("entity_id"), F.col("copy_idx"), F.col("slot")

    def word_expr(wi):
        base_ix = F.pmod(_h("word", eid, slot, F.lit(wi)), F.lit(len(VOCAB)))
        sub_ix = F.pmod(_h("subw", eid, cid, slot, F.lit(wi)), F.lit(len(VOCAB)))
        use_sub = _u("sub?", eid, cid, slot, F.lit(wi), mod=100) < sub_rate
        ix = F.when(use_sub, sub_ix).otherwise(base_ix)
        wd = F.element_at(vocab_arr, (ix + 1).cast("int"))
        wd = F.when(
            _u("case?", eid, cid, slot, F.lit(wi), mod=100) < case_rate, F.upper(wd)
        ).otherwise(wd)
        wd = F.when(
            _u("punct?", eid, cid, slot, F.lit(wi), mod=100) < punct_rate,
            F.concat(wd, F.lit(",")),
        ).otherwise(wd)
        return F.when(F.lit(wi) < n_words, wd)

    max_words = 12
    words = F.array_compact(F.array(*[word_expr(i) for i in range(max_words)]))
    text = F.concat_ws(" ", words)
    # occasional NULL text on tool turns (exercises null canon downstream)
    text = F.when(
        (F.col("role") == "tool") & (_u("nulltext", eid, slot, mod=10) == 0),
        F.lit(None).cast("string"),
    ).otherwise(text)
    turns = turns.withColumn("text", text)

    # timestamps: entity-level epoch + slot step, monotone within conv
    base_ts = F.lit(1700000000) + eid * 997 + cid * 31
    turns = turns.withColumn(
        "ts",
        F.timestamp_seconds(
            base_ts + slot * 30 + F.pmod(_h("dt", eid, slot), F.lit(17))
        ),
    )

    return turns.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "entity_id", "entity_key"
    )


def transcripts_table(df: DataFrame) -> DataFrame:
    """Engine-visible input: exactly the input_hint columns."""
    return df.select(*TRANSCRIPT_COLS)


def hidden_key_table(df: DataFrame) -> DataFrame:
    """GT-only (conv_id, entity_id, entity_key) — the VIN-analogue table."""
    return df.select("conv_id", "entity_id", "entity_key").distinct()
