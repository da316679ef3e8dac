"""Stateful streaming sessionization (applyInPandasWithState).

The batch twin is ``events_sessionize`` (gap-based lag/running-sum
windows, oracle-checked in ``__spark_entry__``).  A live stream cannot
use a global window over a user's history — it needs per-key state that
survives micro-batches: the canonical Structured Streaming shape for a
custom stateful operator is ``groupBy(key).applyInPandasWithState`` with
an event-time timeout.

Semantics (same 30-minute gap rule as the batch twin):

* events for a user arriving within ``gap`` of the previous event extend
  the open session (state: start, last, count);
* an event after a gap CLOSES the previous session (emitted downstream)
  and opens a new one;
* when the watermark passes ``last + gap`` with no new events, the open
  session times out and is emitted — so every session is emitted exactly
  once, either by its successor or by its timeout.

State per key is three longs — bounded, shuffle-partitioned by user_id,
and checkpointed by the engine; this scales to any number of users the
cluster's state store can hold (the 100 TB design: state size is
O(active users), not O(events)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_S = 1800  # 30 min, matching the batch twin

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n", IntegerType(), False),
    ]
)


def _sessionize_fn(key, pdf_iter, state: GroupState):
    """Per-user state machine.  Emits closed sessions; keeps the open one
    in state with an event-time timeout at last+gap."""
    import datetime as dt

    import pandas as pd

    gap_us = SESSION_GAP_S * 1_000_000
    (user_id,) = key

    def ts_of(us):
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(
            tzinfo=None
        )

    closed: list[tuple] = []

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        closed.append((user_id, ts_of(start_us), ts_of(last_us), n))
        state.remove()
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        return

    times: list[int] = []
    for pdf in pdf_iter:
        # event-time in µs; arrow gives tz-naive UTC timestamps
        times.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    times.sort()
    if not times:
        if state.exists:  # re-arm the timeout; nothing new to process
            _s, last_us, _n = state.get
            state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_S * 1000)
        yield pd.DataFrame(
            [], columns=["user_id", "session_start", "session_end", "n_events"]
        )
        return

    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = times[0]
        n = 0

    for t_us in times:
        if t_us - last_us > gap_us and n > 0:
            closed.append((user_id, ts_of(start_us), ts_of(last_us), n))
            start_us = t_us
            n = 0
        last_us = max(last_us, t_us)
        n += 1

    state.update((start_us, last_us, n))
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_S * 1000)
    yield pd.DataFrame(
        closed, columns=["user_id", "session_start", "session_end", "n_events"]
    )


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """(user_id, ts, value) stream → closed-session rows.

    Works on a streaming DataFrame; the watermark bounds how late events
    may arrive AND drives the session timeout clock."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            SESSION_OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_sessionize_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    watermark: str = "30 minutes",
):
    """File-source stream → stateful sessionizer → parquet (append)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = sessionize_stream(stream, watermark=watermark)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
