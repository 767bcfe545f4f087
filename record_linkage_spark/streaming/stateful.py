"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference is batch-only (SURVEY.md §2.10); this is the engine's
incremental-profile surface for transcript streams: per ``conv_id``
state (turn count, token count, last turn index / timestamp) is
maintained across micro-batches and an updated summary row is emitted
whenever a conversation receives new turns. Late or out-of-order turns
within a batch are tolerated (max/sum aggregation is order-free);
conversations idle past the processing-time timeout are finalized and
their state dropped.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("finalized", T.BooleanType()),
    ]
)


def _make_update(timeout_ms: int):
    """Build the state-update function with the timeout captured BY VALUE.

    A module-level function would be pickled by reference: Python workers
    re-import this module and would see whatever default the module holds,
    not the caller's timeout. A closure is serialized by cloudpickle with
    the actual ``timeout_ms`` embedded, so executors honor it.
    """

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_tokens, max_idx, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n_turns],
                    "n_tokens": [n_tokens],
                    "max_turn_idx": [max_idx],
                    "finalized": [True],
                }
            )
            return

        n_turns, n_tokens, max_idx, last_ts = (
            state.get if state.exists else (0, 0, -1, 0.0)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            texts = pdf["text"].fillna("")
            n_tokens += int(texts.str.split().str.len().sum())
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
            ts_max = pdf["ts"].max()
            if pd.notna(ts_max):
                last_ts = max(last_ts, ts_max.timestamp())
        state.update((n_turns, n_tokens, max_idx, last_ts))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "n_tokens": [n_tokens],
                "max_turn_idx": [max_idx],
                "finalized": [False],
            }
        )

    return _update


def stateful_conversation_summaries(
    turn_stream: DataFrame, idle_timeout_ms: int = 0
) -> DataFrame:
    """turns stream -> per-conversation running summaries (update mode).

    One Arrow-batched state update per (micro-batch, conv_id); state is
    Spark-managed (HDFS-backed state store on a real cluster), so the
    operator resumes from the streaming checkpoint like any built-in
    stateful aggregation.

    idle_timeout_ms > 0 enables processing-time finalization: an idle
    conversation's state is dropped and a final row emitted. Leave 0 for
    ``availableNow`` batch-drain runs — a pending timeout keeps the
    trigger alive ("cleaning up state") and the query never terminates.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return turn_stream.groupBy("conv_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
