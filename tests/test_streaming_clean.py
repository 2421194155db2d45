"""Streaming corpus refinement: the stateless clean pipeline over a
documents stream is exactly-once and chunk-for-chunk equal to the same
transformation applied in batch; a rerun over an unchanged input is a
no-op (stream checkpoint)."""

import os
import shutil
import tempfile

import pandas as pd
import pytest

from pdf2ocr_spark.pipeline import load_documents
from pdf2ocr_spark.streaming.clean import clean_transform, run_clean_stream


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="sclean_")
    d = {
        "input": os.path.join(root, "in"),
        "output": os.path.join(root, "out"),
        "ckpt": os.path.join(root, "ckpt"),
    }
    os.makedirs(d["input"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def _canon(pdf):
    return (
        pdf.sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)[
            ["doc_id", "lang", "quality_bp", "chunk_id", "n_tokens", "chunk_text"]
        ]
    )


def test_streaming_clean_matches_batch(spark, sf_dir, dirs):
    docs = load_documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    docs.write.mode("append").parquet(dirs["input"])

    run_clean_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    got = spark.read.parquet(dirs["output"]).toPandas()
    want = clean_transform(docs).toPandas()
    assert len(want) > 0, "gates must keep some documents"
    pd.testing.assert_frame_equal(_canon(got), _canon(want))

    # cross-implementation gate parity: the streamed KEPT doc set must
    # equal the batch quality + repetition gates (the corpus_clean
    # stages minus the corpus-level sample) computed by the INDEPENDENT
    # batch queries — not just clean_transform vs itself
    from pdf2ocr_spark.plans.queries import (
        CLEAN_MIN_QUALITY_BP,
        q_quality_repetition,
        q_quality_score,
    )

    rep = q_quality_repetition(spark, sf_dir).toPandas()
    qual = q_quality_score(spark, sf_dir).toPandas()
    expected_ids = set(
        qual[qual["quality_bp"] >= CLEAN_MIN_QUALITY_BP]["doc_id"]
    ) & set(rep[~rep["is_repetitive"]]["doc_id"])
    assert set(got["doc_id"].astype("int64")) == {int(i) for i in expected_ids}
    assert 0 < len(expected_ids) < docs.count(), "gates drop AND keep"

    # rerun over unchanged input = no-op (exactly-once via checkpoint)
    run_clean_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    again = spark.read.parquet(dirs["output"]).toPandas()
    assert len(again) == len(got)

    # new arrivals produce ONLY their own chunks
    extra = docs.selectExpr(
        "doc_id + 500000 AS doc_id", "text", "lang", "source", "n_chars"
    ).limit(50)
    extra.write.mode("append").parquet(dirs["input"])
    run_clean_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    final = spark.read.parquet(dirs["output"]).toPandas()
    new_rows = final[final["doc_id"] >= 500000]
    assert len(final) == len(got) + len(new_rows)
    assert not final.duplicated(["doc_id", "chunk_id"]).any()
