"""Stateful streaming dedup: duplicates detected across micro-batches and
across separate stream restarts (GroupState + checkpoint)."""

import os
import shutil
import tempfile

import pytest

from pdf2ocr_spark.pipeline import load_documents
from pdf2ocr_spark.streaming.dedup import run_dedup_stream


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="sdedup_")
    d = {
        "input": os.path.join(root, "in"),
        "output": os.path.join(root, "out"),
        "ckpt": os.path.join(root, "ckpt"),
    }
    os.makedirs(d["input"])
    yield d
    shutil.rmtree(root, ignore_errors=True)


def test_cross_batch_dedup(spark, sf_dir, dirs):
    docs = load_documents(spark, sf_dir).where("doc_id < 80").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # first wave: originals
    docs.write.mode("append").parquet(dirs["input"])
    run_dedup_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["output"]).toPandas()
    assert not out1["is_duplicate"].any()  # all first-seen

    # second wave (a LATER stream run): same texts under new doc_ids
    clones = docs.selectExpr(
        "doc_id + 100000 AS doc_id", "text", "lang", "source", "n_chars"
    )
    clones.write.mode("append").parquet(dirs["input"])
    run_dedup_stream(spark, dirs["input"], dirs["output"], dirs["ckpt"])
    out2 = spark.read.parquet(dirs["output"]).toPandas()

    dups = out2[out2["is_duplicate"]]
    originals = out2[~out2["is_duplicate"]]
    assert len(originals) == 80
    assert len(dups) == 80
    # every duplicate points at the original (state survived the restart)
    assert (dups["doc_id"] >= 100000).all()
    assert (dups["keeper_doc_id"] < 100000).all()
    keep_map = dict(zip(originals["text_hash"], originals["doc_id"]))
    assert all(
        keep_map[h] == k for h, k in zip(dups["text_hash"], dups["keeper_doc_id"])
    )
