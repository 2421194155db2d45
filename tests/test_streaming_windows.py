"""Watermarked windowed aggregation: streaming (append mode) emits every
CLOSED window with values identical to the batch formulation; the final
still-open window stays in state (append-mode watermark semantics)."""

import os
import shutil
import tempfile

import pytest

from pdf2ocr_spark.plans.queries import q_events_windowed
from pdf2ocr_spark.streaming.windows import run_windowed_stream


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="swin_")
    d = {
        "input": os.path.join(root, "in"),
        "output": os.path.join(root, "out"),
        "ckpt": os.path.join(root, "ckpt"),
    }
    os.makedirs(d["input"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_windows_match_batch_closed_windows(spark, sf_dir, dirs):
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    events.write.mode("append").parquet(dirs["input"])

    run_windowed_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    stream_out = (
        spark.read.parquet(dirs["output"])
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )

    batch = (
        q_events_windowed(spark, sf_dir)
        .toPandas()[["window_start", "event_type", "n_events", "sum_value_bp"]]
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    last_window = batch["window_start"].max()
    closed = batch[batch["window_start"] < last_window].reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(
        stream_out[["window_start", "event_type", "n_events", "sum_value_bp"]],
        closed,
    )
    # the open window is withheld by the watermark, not lost
    assert last_window not in set(stream_out["window_start"])
