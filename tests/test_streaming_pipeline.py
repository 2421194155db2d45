"""The chained continuous pipeline (streaming/pipeline_chain.py):
stateful exact dedup feeding the stateless clean/chunk stages as ONE
streaming query. Pins (a) batch parity — the streamed chunk relation
equals clean_transform over the keep-min-doc_id deduped corpus; (b)
kill/restart exactly-once — duplicates re-ingested in a later RUN are
dropped by checkpoint-restored state and nothing is emitted twice."""

import os
import shutil
import tempfile

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pdf2ocr_spark.pipeline import load_documents
from pdf2ocr_spark.streaming.clean import clean_transform
from pdf2ocr_spark.streaming.pipeline_chain import run_chained_stream

COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="schain_")
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


def _batch_twin(docs):
    """Static composition the chained stream must reproduce: exact dedup
    keeping min(doc_id) per text hash, then the clean stages."""
    keep = docs.join(
        docs.groupBy(F.md5("text").alias("h")).agg(
            F.min("doc_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    return clean_transform(keep)


def test_chained_stream_dedup_then_clean(spark, sf_dir, dirs):
    docs = load_documents(spark, sf_dir).select(*COLS)
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]

    # ---- run 1: the low-id half (first-seen == min doc_id by layout)
    half1 = docs.where(F.col("doc_id") <= mid)
    half1.write.mode("append").parquet(dirs["input"])
    run_chained_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    got1 = spark.read.parquet(dirs["output"]).toPandas()
    want1 = _batch_twin(half1).toPandas()
    assert len(want1) > 0
    pd.testing.assert_frame_equal(_canon(got1), _canon(want1))

    # ---- run 2 (RESTART, same checkpoint): the high-id half PLUS
    # re-ingested copies of run-1 docs under fresh ids — checkpointed
    # dedup state must drop every copy, so they contribute no chunks
    half2 = docs.where(F.col("doc_id") > mid)
    copies = half1.limit(40).selectExpr(
        "doc_id + 900000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    half2.unionByName(copies).write.mode("append").parquet(dirs["input"])
    run_chained_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    got = spark.read.parquet(dirs["output"]).toPandas()

    want = _batch_twin(docs).toPandas()
    assert (got["doc_id"] < 900000).all(), "a re-ingested copy leaked chunks"
    pd.testing.assert_frame_equal(_canon(got), _canon(want))

    # ---- run 3: unchanged input is a no-op (exactly-once)
    run_chained_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    again = spark.read.parquet(dirs["output"]).toPandas()
    assert len(again) == len(got)


def test_chained_stream_with_decontamination_gate(spark, sf_dir, dirs):
    """The optional decontamination stage: streamed kept-doc set equals
    the batch composition (exact dedup -> decontaminate_applied ->
    clean), i.e. no contaminated doc emits chunks."""
    from pdf2ocr_spark.functions.decontam import collect_bench_grams
    from pdf2ocr_spark.plans.queries import (
        DECONTAM_MOD,
        DECONTAM_N,
        DECONTAM_PREFIX_TOKS,
        q_decontaminate,
    )

    docs = load_documents(spark, sf_dir).select(*COLS)
    docs.write.mode("append").parquet(dirs["input"])
    grams = collect_bench_grams(
        docs, DECONTAM_N, DECONTAM_MOD, DECONTAM_PREFIX_TOKS
    )
    assert grams, "benchmark gram set must be non-empty"
    run_chained_stream(
        spark, dirs["input"], dirs["output"], dirs["ckpt"],
        bench_grams=grams,
    )
    got = spark.read.parquet(dirs["output"]).toPandas()

    contaminated = {
        int(r["doc_id"]) for r in q_decontaminate(spark, sf_dir).collect()
    }
    assert contaminated, "driver corpus seeds contamination by construction"
    assert not (set(got["doc_id"].astype("int64")) & contaminated), (
        "a contaminated doc leaked chunks"
    )
    # parity with the batch composition
    keep = docs.join(
        docs.groupBy(F.md5("text").alias("h")).agg(
            F.min("doc_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    ).where(~F.col("doc_id").isin([int(x) for x in contaminated]))
    want = clean_transform(keep).toPandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))
