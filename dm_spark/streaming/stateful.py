"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-key state only in its checkpoint/causality
maps; a training-data ingest pipeline additionally needs streaming
stateful aggregation (e.g. conversation assembly: fold arriving turns
into a running per-conversation document). This module implements that
as `applyInPandasWithState` — Arrow-batched, per-group state, timeout-
based emission — the Structured Streaming custom-stateful surface.

`conversation_state_stream` consumes the change envelope stream and
maintains, per conv_id: number of live turns, max turn_idx, latest
event ts. Groups are emitted on every trigger (update mode semantics
via state + output rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, max_turn int, last_ts_us long"
OUTPUT_SCHEMA = "conv_id string, n_events long, max_turn int, last_ts_us long"


def _fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n_events, max_turn, last_ts = (
        state.get if state.exists else (0, -1, 0)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
            last_ts = max(last_ts, int(pdf["ts_us"].max()))
    state.update((n_events, max_turn, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_events": [n_events],
            "max_turn": [max_turn],
            "last_ts_us": [last_ts],
        }
    )


def conversation_state_stream(envelope_stream: DataFrame) -> DataFrame:
    """envelope stream -> running per-conversation rollup (stateful).

    op='Q' in-band DDL rows are excluded (their images carry SQL text,
    not a conversation — a relay feed written with feed.query_events
    would otherwise grow a phantom rollup row counting DDL statements).
    """
    turns = envelope_stream.where(
        ~F.col("op").eqNullSafe(F.lit("Q"))
    ).select(
        F.coalesce(F.col("after.conv_id"), F.col("before.conv_id")).alias("conv_id"),
        F.coalesce(F.col("after.turn_idx"), F.col("before.turn_idx")).alias("turn_idx"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return turns.groupBy("conv_id").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
