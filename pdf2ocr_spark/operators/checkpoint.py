"""Checkpointed extraction job: per-partition lineage + exactly-once resume.

The reference CLI has NO resume — a killed run redoes everything
(/root/reference/pdf2ocr/converters/pdf.py:919-927 only stops scheduling).
This engine checkpoints at partition granularity (north rule):

- every document gets a STABLE partition id (``part_id``) from the same
  weight-striped expression as ``skew_balanced`` — deterministic across
  runs and cluster sizes, so a resume sees the identical doc->partition map;
- the fused kernel emits, per Spark task, one sentinel '_lineage' row with
  real in-kernel metrics (doc/page/span counts, wall time, per-doc errors);
- spans and lineage are both written ``partitionBy(part_id)`` with dynamic
  partition overwrite, so re-processing a partition is idempotent
  (overwrite-by-partition, never append);
- ``resume``: partitions whose lineage row says 'success' are anti-joined
  away; only the remainder is computed. Running a completed job again is a
  no-op.

Error isolation mirrors the reference's per-file try/except
(pdf.py:743-746): a failing document is recorded in the partition's
lineage error list and the job continues.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf2ocr_spark.kernel.emit import ALL_FORMATS, extract_document

LINEAGE_KIND = "_lineage"

CHECKPOINT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)

LINEAGE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("doc_count", T.LongType()),
        T.StructField("page_count", T.LongType()),
        T.StructField("span_count", T.LongType()),
        T.StructField("wall_sec", T.DoubleType()),
        T.StructField("docs_per_sec", T.DoubleType()),
        T.StructField("status", T.StringType()),
        T.StructField("errors", T.ArrayType(T.StringType())),
    ]
)


def stable_part_id(num_partitions: int):
    """Deterministic weight-striped partition id (must match
    operators/extract.py:skew_balanced so bench and checkpoint agree)."""
    wclass = F.floor(F.log2(F.greatest(F.size("spans"), F.lit(1)) + 1))
    return F.pmod(
        F.xxhash64(F.col("doc_id"), wclass.cast("long")), F.lit(num_partitions)
    ).cast("int")


def _kernel(formats: Sequence[str], lang: str, max_sentences: Optional[int]):
    fmts = tuple(formats)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "kind", "text", "media_ref", "offset", "part_id"]
        # one Spark task can carry several part_id values (value-hash
        # collisions in repartition), so metrics are bucketed per part_id
        stats: dict[int, dict] = {}
        for pdf in batches:
            rows = []
            for doc_id, spans, pid in zip(pdf["doc_id"], pdf["spans"], pdf["part_id"]):
                pid = int(pid)
                st = stats.setdefault(
                    pid,
                    {"docs": 0, "pages": 0, "spans": 0, "wall": 0.0, "errors": []},
                )
                st["docs"] += 1
                st["pages"] += sum(1 for s in spans if s.get("kind") == "page")
                t0 = time.monotonic()
                try:
                    out = extract_document(doc_id, spans, fmts, lang, max_sentences)
                except Exception as exc:  # reference-style per-doc isolation
                    st["errors"].append(f"{doc_id}: {exc}")
                    st["wall"] += time.monotonic() - t0
                    continue
                st["wall"] += time.monotonic() - t0
                st["spans"] += len(out)
                rows.extend((*r, pid) for r in out)
            yield pd.DataFrame(rows, columns=cols)
        if stats:
            sentinels = []
            for pid, st in sorted(stats.items()):
                payload = json.dumps(
                    {
                        "doc_count": st["docs"],
                        "page_count": st["pages"],
                        "span_count": st["spans"],
                        "wall_sec": round(st["wall"], 4),
                        "docs_per_sec": (
                            round(st["docs"] / st["wall"], 3) if st["wall"] > 0 else None
                        ),
                        "status": "success",
                        "errors": st["errors"],
                    }
                )
                sentinels.append([None, LINEAGE_KIND, payload, None, 0, pid])
            yield pd.DataFrame(sentinels, columns=cols)

    return run


def _completed_partitions(spark: SparkSession, output_dir: str) -> set[int]:
    try:
        lin = read_lineage(spark, output_dir)
    except Exception:
        return set()
    rows = lin.where(F.col("status") == "success").select("part_id").collect()
    return {r["part_id"] for r in rows}


def run_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    num_partitions: int = 32,
    formats: Sequence[str] = ALL_FORMATS,
    lang: str = "eng",
    max_sentences: Optional[int] = None,
    resume: bool = True,
) -> dict:
    """Execute the extraction job with per-partition checkpointing.

    Returns a summary dict: partitions planned/skipped/processed.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    tagged = docs.withColumn("part_id", stable_part_id(num_partitions))

    if not resume:
        # a fresh (non-resume) run must not inherit stale state: dynamic
        # partition overwrite preserves partitions this run never writes,
        # which would both leak old spans into read_spans() and inflate the
        # processed count (stale lineage rows read back as "present");
        # local-FS delete here — an object-store deployment would drop the
        # table / prefix through its catalog instead
        import shutil

        shutil.rmtree(os.path.join(output_dir, "combined"), ignore_errors=True)
    done = _completed_partitions(spark, output_dir) if resume else set()
    if done:
        tagged = tagged.where(~F.col("part_id").isin(list(done)))

    planned = num_partitions - len(done)
    if planned <= 0 or tagged.isEmpty():
        return {"partitions": num_partitions, "skipped": len(done), "processed": 0}

    # ONE shuffle + ONE kernel pass + ONE idempotent partition-overwrite
    # write; spans and lineage are views over the combined relation, so a
    # resumed/re-run partition atomically replaces both its spans and its
    # lineage row together (no spans-written-but-lineage-missing window).
    shuffled = tagged.repartition(num_partitions, "part_id")
    out = shuffled.select("doc_id", "spans", "part_id").mapInPandas(
        _kernel(formats, lang, max_sentences), schema=CHECKPOINT_OUT_SCHEMA
    )
    out.write.mode("overwrite").partitionBy("part_id").parquet(
        os.path.join(output_dir, "combined")
    )

    # partitions that received ZERO documents emit no kernel sentinel (the
    # kernel never saw them), so `planned` is only an upper bound — count
    # processed from the lineage rows actually present after the write
    # (done-partitions keep their old rows under dynamic overwrite, so the
    # difference is exactly this run's work). A never-seen partition stays
    # unmarked and is re-planned on resume, which is a no-op (zero rows);
    # marking it done instead would wrongly skip its documents when a
    # resume is fed input the crashed run never read. The read-back scans
    # <= one lineage row per partition.
    present = {
        r["part_id"]
        for r in _combined(spark, output_dir)
        .where(F.col("kind") == LINEAGE_KIND)
        .select("part_id")
        .distinct()
        .collect()
    }
    return {
        "partitions": num_partitions,
        "skipped": len(done),
        "processed": len(present - done),
    }


def _combined(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "combined"))


def read_spans(spark: SparkSession, output_dir: str) -> DataFrame:
    return (
        _combined(spark, output_dir)
        .where(F.col("kind") != LINEAGE_KIND)
        .drop("part_id")
    )


def read_lineage(spark: SparkSession, output_dir: str) -> DataFrame:
    return (
        _combined(spark, output_dir)
        .where(F.col("kind") == LINEAGE_KIND)
        .select("part_id", F.from_json("text", LINEAGE_JSON_SCHEMA).alias("m"))
        .select("part_id", "m.*")
    )


def summary(spark: SparkSession, output_dir: str) -> DataFrame:
    """The reference's end-of-run summary block (pdf.py:1016-1032) as an
    aggregate over the lineage relation."""
    lin = read_lineage(spark, output_dir)
    return lin.agg(
        F.sum("doc_count").alias("files_processed"),
        F.sum("span_count").alias("spans_emitted"),
        F.round(F.sum("wall_sec"), 3).alias("total_kernel_sec"),
        F.round(F.avg("wall_sec"), 4).alias("avg_sec_per_partition"),
        F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias(
            "partitions_succeeded"
        ),
        F.sum(F.size("errors")).alias("doc_errors"),
    )
