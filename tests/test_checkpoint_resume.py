"""Checkpoint/lineage/resume tests: kill-and-resume yields exactly-once
output; re-running a completed job is a no-op (SURVEY §7 step 4)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pdf2ocr_spark.operators.checkpoint import (
    read_lineage,
    read_spans,
    run_checkpointed,
    stable_part_id,
    summary,
)
from pdf2ocr_spark.pipeline import load_docs_corpus, run_pipeline

N_PARTS = 8


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_docs_corpus(spark, sf_dir).cache()


def canon(pdf):
    return (
        pdf.sort_values(["doc_id", "kind", "offset"])
        .reset_index(drop=True)[["doc_id", "kind", "text", "media_ref", "offset"]]
    )


def test_full_run_writes_spans_and_lineage(spark, docs, outdir):
    res = run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)
    assert res["partitions"] == N_PARTS
    assert res["skipped"] == 0 and res["processed"] == N_PARTS
    assert set(res["phase_sec"]) == {"resume_check", "kernel_write", "verify"}

    spans = read_spans(spark, outdir)
    direct = run_pipeline(spark, "/root/testdata/sf0.001", num_partitions=4)
    import pandas as pd

    pd.testing.assert_frame_equal(canon(spans.toPandas()), canon(direct.toPandas()))

    lin = read_lineage(spark, outdir).toPandas()
    assert len(lin) == N_PARTS
    assert (lin["status"] == "success").all()
    assert lin["doc_count"].sum() == docs.count()
    assert (lin["docs_per_sec"].dropna() > 0).all()

    s = summary(spark, outdir).collect()[0]
    assert s["partitions_succeeded"] == N_PARTS
    assert s["doc_errors"] == 0


def test_kill_resume_exactly_once(spark, docs, outdir):
    # simulate a killed run: only partitions 0..2 got processed
    part = stable_part_id(N_PARTS)
    partial = docs.withColumn("pid", part).where(F.col("pid") < 3).drop("pid")
    run_checkpointed(spark, partial, outdir, num_partitions=N_PARTS)
    # the kernel only saw docs of partitions 0-2, so lineage has 3 rows
    assert len(read_lineage(spark, outdir).toPandas()) == 3

    # resume with the FULL corpus: must process only the remaining 5
    res = run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)
    assert res["skipped"] == 3
    assert res["processed"] == 5

    spans = read_spans(spark, outdir).toPandas()
    direct = run_pipeline(spark, "/root/testdata/sf0.001", num_partitions=4).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(canon(spans), canon(direct))

    # exactly-once: no duplicated (doc_id, kind, offset)
    assert not spans.duplicated(["doc_id", "kind", "offset"]).any()


def test_weight_striping_balances_partitions(spark, docs, outdir):
    """Skew evidence: despite Zipf page counts (40x heavy tail), the
    weight-striped partitioning keeps per-partition page totals balanced
    (no partition carries more than ~2.5x the mean) — the north-rule skew
    criterion, measured from the lineage metrics themselves."""
    run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)
    lin = read_lineage(spark, outdir).toPandas()
    pages = lin["page_count"]
    assert len(pages) == N_PARTS
    assert pages.max() <= 2.5 * pages.mean()
    assert pages.min() >= 0.3 * pages.mean()


def test_per_doc_error_isolation(spark, docs, outdir):
    """A document that crashes the kernel is recorded in lineage errors;
    the job completes and every healthy doc is extracted (ref behavior:
    per-file try/except, converters/pdf.py:743-746)."""
    from pdf2ocr_spark.schema import DOCS_SCHEMA

    poison = spark.createDataFrame(
        [("poison-doc", [
            {"kind": "page", "text": "ok.", "media_ref": None, "offset": None},
            {"kind": "page", "text": "boom.", "media_ref": None, "offset": 1},
        ])],
        schema=DOCS_SCHEMA,
    )
    mixed = docs.limit(50).unionByName(poison)
    run_checkpointed(spark, mixed, outdir, num_partitions=4)

    lin = read_lineage(spark, outdir).toPandas()
    all_errors = [e for errs in lin["errors"] for e in errs]
    assert len(all_errors) == 1
    assert all_errors[0].startswith("poison-doc:")
    assert (lin["status"] == "success").all()
    assert lin["doc_count"].sum() == 51

    spans = read_spans(spark, outdir).toPandas()
    assert "poison-doc" not in set(spans["doc_id"])
    assert spans["doc_id"].nunique() >= 45  # healthy docs extracted


def test_completed_job_is_noop(spark, docs, outdir):
    run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)
    res = run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)
    assert res == {"partitions": N_PARTS, "skipped": N_PARTS, "processed": 0}


def test_no_resume_clears_stale_state(spark, docs, outdir):
    """resume=False on a pre-populated output dir must neither inherit
    stale spans nor count stale lineage rows as this run's work: a full
    8-partition run followed by a fresh (no-resume) run over a SUBSET
    reporting only the partitions the subset actually hit."""
    run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)

    part = stable_part_id(N_PARTS)
    subset = docs.withColumn("pid", part).where(F.col("pid") < 3).drop("pid")
    res = run_checkpointed(
        spark, subset, outdir, num_partitions=N_PARTS, resume=False
    )
    # only the 3 partitions the subset populated count as processed —
    # the stale 8-partition state must not inflate the number
    assert res["skipped"] == 0
    assert res["processed"] == 3

    # and the output contains ONLY the fresh run's spans
    spans = read_spans(spark, outdir).toPandas()
    subset_ids = {r["doc_id"] for r in subset.select("doc_id").collect()}
    assert set(spans["doc_id"]) <= subset_ids
    assert len(read_lineage(spark, outdir).toPandas()) == 3


def _small_with_part_id(spark, sf_dir, parts):
    from pdf2ocr_spark.pipeline import load_documents, stripe_key

    return (
        load_documents(spark, sf_dir)
        .withColumn("part_id", stripe_key(parts))
        .repartition(parts, "part_id")
    )


def test_fused_channel_matches_two_stage(spark, docs, sf_dir, outdir):
    """The fused channel+extract kernel (the job's zero-nested-shuffle
    path) must emit span-for-span the same relation as the two-stage
    docs -> extract path."""
    import pandas as pd

    small = _small_with_part_id(spark, sf_dir, N_PARTS)
    res = run_checkpointed(
        spark, small, outdir, num_partitions=N_PARTS, fused_channel=True
    )
    assert res["processed"] > 0 and res["skipped"] == 0

    fused = read_spans(spark, outdir).toPandas()
    two_stage_dir = outdir + "_two_stage"
    try:
        run_checkpointed(spark, docs, two_stage_dir, num_partitions=N_PARTS)
        two_stage = read_spans(spark, two_stage_dir).toPandas()
    finally:
        shutil.rmtree(two_stage_dir, ignore_errors=True)
    pd.testing.assert_frame_equal(canon(fused), canon(two_stage))

    # lineage covers every doc exactly once despite the caller-side part id
    lin = read_lineage(spark, outdir).toPandas()
    assert lin["doc_count"].sum() == small.count()
    assert (lin["status"] == "success").all()


def test_fused_channel_resume_is_noop_and_requires_part_id(spark, sf_dir, outdir):
    small = _small_with_part_id(spark, sf_dir, N_PARTS)
    first = run_checkpointed(
        spark, small, outdir, num_partitions=N_PARTS, fused_channel=True
    )
    assert first["processed"] > 0
    again = run_checkpointed(
        spark, small, outdir, num_partitions=N_PARTS, fused_channel=True
    )
    assert again["processed"] == 0
    assert again["skipped"] == first["processed"]

    with pytest.raises(ValueError, match="part_id"):
        run_checkpointed(
            spark,
            small.drop("part_id"),
            outdir + "_x",
            num_partitions=N_PARTS,
            fused_channel=True,
        )


def test_resume_refuses_partition_mode_mismatch(spark, docs, sf_dir, outdir):
    """Fused mode partitions by pipeline.stripe_key (word weight),
    non-fused by stable_part_id (span weight) — the same part_id holds
    DIFFERENT documents under the two maps, so a cross-mode resume would
    skip 'done' partitions whose documents the new mode never wrote.
    The lineage records its mode and resume refuses a mismatch."""
    run_checkpointed(spark, docs, outdir, num_partitions=N_PARTS)

    small = _small_with_part_id(spark, sf_dir, N_PARTS)
    with pytest.raises(ValueError, match="partitioning mode"):
        run_checkpointed(
            spark, small, outdir, num_partitions=N_PARTS, fused_channel=True
        )
    # resume=False starts over and is allowed to switch modes
    res = run_checkpointed(
        spark,
        small,
        outdir,
        num_partitions=N_PARTS,
        fused_channel=True,
        resume=False,
    )
    assert res["processed"] > 0
