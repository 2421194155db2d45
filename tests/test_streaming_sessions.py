"""Stateful streaming sessionization: closed sessions match the batch
events_sessionized query exactly (minus each user's still-open tail),
and open sessions survive a stream restart via checkpointed state."""

import os
import shutil
import tempfile

import pandas as pd
import pytest

from pdf2ocr_spark.streaming.sessions import run_sessions_stream


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="ssess_")
    d = {
        "input": os.path.join(root, "in"),
        "output": os.path.join(root, "out"),
        "ckpt": os.path.join(root, "ckpt"),
    }
    os.makedirs(d["input"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _batch_sessions(spark, sf_dir):
    """Batch ground truth, with boundaries parsed back to epoch us."""
    from pdf2ocr_spark.plans.queries import q_events_sessionized

    b = q_events_sessionized(spark, sf_dir).toPandas()
    for col in ("session_start", "session_end"):
        b[col.replace("session_", "session_") + "_us"] = (
            pd.to_datetime(b[col]).astype("datetime64[us]").astype("int64")
        )
    return b.drop(columns=["session_start", "session_end"])


def _canon(df):
    cols = [
        "user_id",
        "session_no",
        "session_start_us",
        "session_end_us",
        "n_events",
        "n_event_types",
        "value_bp",
    ]
    return (
        df[cols]
        .astype("int64", errors="ignore")
        .sort_values(["user_id", "session_no"])
        .reset_index(drop=True)
    )


def test_streaming_sessions_match_batch(spark, sf_dir, dirs):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.write.mode("append").parquet(dirs["input"])
    run_sessions_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    got = spark.read.parquet(dirs["output"]).toPandas()

    batch = _batch_sessions(spark, sf_dir)
    # streaming emits CLOSED sessions only: batch minus each user's
    # final session (the open tail held in state)
    last = batch.groupby("user_id")["session_no"].transform("max")
    expected = batch[batch["session_no"] < last]

    assert len(got) == len(expected), (len(got), len(expected))
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(expected).astype("int64")
    )


def test_open_sessions_survive_restart(spark, sf_dir, dirs):
    """Events split across two separate stream RUNS: a user's session
    that is still open at the end of run 1 must close in run 2 with the
    run-1 start time (state restored from checkpoint), and nothing is
    emitted twice."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).where(
        "user_id < 20"
    )
    # split by median event_id: both halves contain events of most users
    # (event ids are assigned in timestamp order by the generator)
    mid = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).first()[0]
    ev.where(F.col("event_id") <= mid).write.mode("append").parquet(dirs["input"])
    run_sessions_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    n_after_first = len(spark.read.parquet(dirs["output"]).toPandas())

    ev.where(F.col("event_id") > mid).write.mode("append").parquet(dirs["input"])
    run_sessions_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    got = spark.read.parquet(dirs["output"]).toPandas()
    assert len(got) > n_after_first

    # ground truth over the SAME complete event set
    batch = _batch_sessions(spark, sf_dir)
    users = set(ev.select("user_id").distinct().toPandas()["user_id"])
    batch = batch[batch["user_id"].isin(users)]
    last = batch.groupby("user_id")["session_no"].transform("max")
    expected = batch[batch["session_no"] < last]

    # no duplicate emissions across the two runs
    assert not got.duplicated(["user_id", "session_no"]).any()
    pd.testing.assert_frame_equal(
        _canon(got).astype("int64"), _canon(expected).astype("int64")
    )


def test_late_events_dropped_not_corrupting(spark, dirs):
    """A cross-batch LATE event (older than the open session's last seen
    ts) must be dropped — not regress the session end or fabricate a
    bogus gap — so the already-emitted closed sessions stay correct."""
    import pandas as pd

    base = pd.Timestamp("2024-05-01 12:00:00")
    mk = lambda eid, mins, u=1: {  # noqa: E731
        "event_id": eid, "ts": base + pd.Timedelta(minutes=mins),
        "user_id": u, "event_type": "view", "value": 1.0, "props": "{}",
    }
    # run 1: events at t0 and t0+10 (one open session)
    df1 = spark.createDataFrame(pd.DataFrame([mk(1, 0), mk(2, 10)]))
    df1 = df1.withColumn("ts", df1["ts"].cast("timestamp_ntz"))
    df1.write.mode("append").parquet(dirs["input"])
    run_sessions_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])

    # run 2: a LATE event at t0-40 (before the open session) plus a
    # legitimate event at t0+50 that closes the open session
    df2 = spark.createDataFrame(pd.DataFrame([mk(3, -40), mk(4, 50)]))
    df2 = df2.withColumn("ts", df2["ts"].cast("timestamp_ntz"))
    df2.write.mode("append").parquet(dirs["input"])
    run_sessions_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])

    out = spark.read.parquet(dirs["output"]).toPandas()
    # exactly ONE closed session: [t0, t0+10] with 2 events — the late
    # event neither extended it backwards nor split it
    assert len(out) == 1
    row = out.iloc[0]
    t0_us = base.value // 1000
    assert row["session_start_us"] == t0_us
    assert row["session_end_us"] == t0_us + 10 * 60 * 1_000_000
    assert row["n_events"] == 2


def test_event_time_timeout_flushes_quiet_user(spark, dirs):
    """flush_after_gap: a user who goes quiet has their open session
    emitted exactly once, once the watermark (driven by OTHER users'
    events) passes last_ts + gap. File mtimes force the micro-batch
    order: the flush fires in the batch AFTER the watermark advances."""
    import datetime as dt
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_file(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["" for _ in rows], pa.string()),
            }
        )
        path = os.path.join(dirs["input"], name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    now = time.time()
    # batch 1: user 1's two events (session stays OPEN), user 2 at 10:00
    write_file(
        "f1.parquet",
        [(1, t, 1, "view", 1.0), (2, t + 5 * m, 1, "click", 2.0),
         (3, t, 2, "view", 1.0)],
        now - 30,
    )
    # batch 2: user 2 at 13:00 -> closes user 2's 10:00 session AND
    # advances the watermark to 12:30 (> user 1's 10:05 + 30min gap)
    write_file("f2.parquet", [(4, t + 180 * m, 2, "view", 3.0)], now - 20)
    # batch 3: user 2 at 13:01 (same session) -> the batch in which
    # user 1's timeout fires
    write_file("f3.parquet", [(5, t + 181 * m, 2, "view", 4.0)], now - 10)

    run_sessions_stream(
        spark, dirs["input"], dirs["output"], dirs["ckpt"],
        flush_after_gap=True, max_files_per_trigger=1,
    )
    got = _canon(spark.read.parquet(dirs["output"]).toPandas())

    us = lambda d: int(d.timestamp() * 1_000_000)  # noqa: E731
    expected = pd.DataFrame(
        [
            # user 1's FLUSHED session (would never emit without timeout)
            (1, 1, us(t), us(t + 5 * m), 2, 2, 30000),
            # user 2's 10:00 session, closed normally by the 13:00 event
            (2, 1, us(t), us(t), 1, 1, 10000),
        ],
        columns=got.columns,
    )
    pd.testing.assert_frame_equal(got.astype("int64"), expected.astype("int64"))


def test_per_event_bp_quantization_matches_batch(spark, dirs):
    """Round-6 advice fix: state carries per-event-quantized integer bp.
    Values of 0.00006 make the two formulations provably differ — each
    event is floor(0.6 + 0.5) = 1 bp, so 50 events are 50 bp per-event
    but floor(50*0.6 + 0.5) = 30 bp under the round-5 sum-then-round
    accumulator — and the batch query (per-event by construction) is the
    contract the stream must match."""
    import datetime as dt

    from pdf2ocr_spark.plans.queries import q_events_sessionized

    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (i, t + i * m, 1, "view", 0.00006, "") for i in range(50)
    ] + [
        # 2h later: closes the 50-event session, stays open itself
        (99, t + 180 * m, 1, "view", 0.00006, ""),
    ]
    sdf = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf_dir = os.path.join(os.path.dirname(dirs["input"]), "sf")
    sdf.coalesce(1).write.parquet(os.path.join(sf_dir, "events.parquet"))
    sdf.write.mode("append").parquet(dirs["input"])

    run_sessions_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    got = _canon(spark.read.parquet(dirs["output"]).toPandas())
    assert len(got) == 1
    assert int(got.loc[0, "value_bp"]) == 50  # per-event, NOT 30

    batch = _batch_sessions(spark, sf_dir)
    closed = batch[batch["session_no"] < batch["session_no"].max()]
    pd.testing.assert_frame_equal(
        got.astype("int64"), _canon(closed).astype("int64")
    )
