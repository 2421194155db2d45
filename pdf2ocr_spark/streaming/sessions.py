"""Stateful streaming sessionization (applyInPandasWithState).

The streaming twin of the batch ``events_sessionized`` query
(plans/queries.py): per user, a session CLOSES when a later event
arrives more than SESSION_GAP_MIN minutes after the previous one.
Closed sessions are emitted; each user's OPEN tail session lives in
GroupState and survives micro-batch boundaries and stream restarts
(checkpointed), so a session spanning three micro-batches is emitted
exactly once, with the same boundaries the batch query computes.

Semantics contract (pinned by test_streaming_sessions): for event
streams that arrive per-user in event-time order ACROSS micro-batches
(within a batch any order is fine — the group sorts), the emitted
closed sessions are EXACTLY the batch query's sessions minus each
user's final (still-open) session. Cross-batch LATE events (ts at or
before the open session's last seen ts) are DROPPED and counted in
state: closed sessions were already emitted in append mode, so reviving
them would double-emit — dropping is the standard no-watermark late-
data policy, made observable via the state's late counter. A production
deployment adds an event-time timeout
(GroupStateTimeout.EventTimeTimeout + watermark) to flush sessions
whose users went quiet; the flush path reuses the same state record.

State size at 10^12 events: ONE row per active user (session_no, start,
last_ts, counters) — RocksDB state store on a real cluster; the
event-type set is bounded by the small event-type vocabulary.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: must match plans/queries.py SESSION_GAP_MIN
SESSION_GAP_US = 30 * 60 * 1_000_000

SESSIONS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_event_types", T.LongType()),
        T.StructField("value_bp", T.LongType()),
    ]
)

SESSIONS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("event_types", T.StringType()),  # '\x1f'-joined set
        T.StructField("n_late_dropped", T.LongType()),
    ]
)

_SEP = "\x1f"


def _close(user_id, no, start, end, n, types, vsum):
    import math

    return (
        int(user_id),
        int(no),
        int(start),
        int(end),
        int(n),
        len(types),
        int(math.floor(vsum * 10000 + 0.5)),
    )


def _sessions_fn(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    # drain + order the whole group: chunk order is not event order
    parts = [p for p in pdfs]
    pdf = pd.concat(parts) if parts else pd.DataFrame()
    cols = ["user_id", "session_no", "session_start_us", "session_end_us",
            "n_events", "n_event_types", "value_bp"]
    if len(pdf) == 0:
        yield pd.DataFrame([], columns=cols)
        return
    # ts arrives as naive datetime64 (TIMESTAMP_NTZ through Arrow);
    # normalize to epoch MICROSECONDS regardless of pandas' unit
    if not pd.api.types.is_integer_dtype(pdf["ts_us"]):
        pdf["ts_us"] = (
            pdf["ts_us"].astype("datetime64[us]").astype("int64")
        )
    pdf = pdf.sort_values(["ts_us", "event_id"])

    if state.exists:
        no, start, last, n, vsum, types_s, n_late = state.get
        types = set(types_s.split(_SEP)) if types_s else set()
    else:
        no, start, last, n, vsum, types, n_late = 0, None, None, 0, 0.0, set(), 0

    out = []
    for ts_us, etype, value in zip(
        pdf["ts_us"].astype("int64"), pdf["event_type"], pdf["value"]
    ):
        ts_us = int(ts_us)
        if last is not None and ts_us < last:
            # cross-batch LATE event (strictly before the open session's
            # last seen ts): closed sessions already emitted in append
            # mode, so merging could double-emit — drop, but observably
            # (equal-ts events pass: the batch query counts them too)
            n_late += 1
            continue
        if start is None or ts_us - last > SESSION_GAP_US:
            if start is not None:
                out.append(_close(user_id, no, start, last, n, types, vsum))
            no += 1
            start, n, vsum, types = ts_us, 0, 0.0, set()
        last = ts_us
        n += 1
        vsum += float(value)
        types.add(str(etype))

    state.update(
        (int(no), int(start), int(last), int(n), float(vsum),
         _SEP.join(sorted(types)), int(n_late))
    )
    yield pd.DataFrame(out, columns=cols)


def streaming_sessionize(stream: DataFrame) -> DataFrame:
    """events stream -> CLOSED sessions (open tails held in state)."""
    keyed = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        "value",
        # TIMESTAMP_NTZ ships through Arrow as a NAIVE datetime — no
        # timezone ever enters; _sessions_fn converts it to epoch
        # microseconds pandas-side
        F.col("ts").alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sessions_fn,
        outputStructType=SESSIONS_OUT_SCHEMA,
        stateStructType=SESSIONS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessions_stream(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """AvailableNow runner: process all files currently present, stop."""
    EVENTS_SCHEMA = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
