"""End-to-end extraction pipeline (the engine's E1/E3 entry point —
SURVEY.md §3: job args -> read docs -> skew-balanced repartition -> fused
extract kernel -> spans_out [+ lineage]).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from pdf2ocr_spark.kernel.emit import ALL_FORMATS
from pdf2ocr_spark.operators.docgen import documents_to_docs
from pdf2ocr_spark.operators.extract import extract_spans


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def tile_documents(documents: DataFrame, factor: int) -> DataFrame:
    """Deterministically tile the documents relation ``factor``x with
    distinct doc_ids (doc_id*factor+replica). Each replica gets different
    seeded OCR noise downstream (doc_id keys the noise channel), so tiling
    scales WORK without degenerating the corpus — used by bench.py to
    amortize fixed job overhead when measuring scaling efficiency."""
    from pyspark.sql import functions as F

    if factor <= 1:
        return documents
    return documents.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    ).select(
        (F.col("doc_id") * factor + F.col("rep")).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )


def load_docs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's input relation, derived deterministically from the
    driver-provided documents table (kernel/docgen.py channel model)."""
    return documents_to_docs(load_documents(spark, sf_dir))


def stripe_key(num_partitions: int):
    """Deterministic weight-striped partition key, computable on the
    SMALL (pre-channel) documents relation: the per-doc work weight
    (words x heavy tiling factor) is predicted with the same md5-derived
    heavy factor the Python channel uses (kernel/docgen.py:heavy_factor),
    expressed in pure Catalyst so the planner sees a deterministic column
    expression. Shared by stripe_documents and the fused checkpoint job
    (jobs/run_extract.py), whose resume contract needs the same doc ->
    partition mapping on every run."""
    from pyspark.sql import functions as F

    from pdf2ocr_spark.kernel.docgen import HEAVY_DOC_RATE, HEAVY_MAX_FACTOR

    md5_hex = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":heavy")))
    u = F.conv(F.substring(md5_hex, 1, 8), 16, 10).cast("double") / F.lit(2.0**32)
    v = F.conv(F.substring(md5_hex, 9, 8), 16, 10).cast("double") / F.lit(2.0**32)
    factor = F.when(
        u >= F.lit(HEAVY_DOC_RATE), F.lit(1)
    ).otherwise(
        F.least(
            F.lit(HEAVY_MAX_FACTOR),
            F.greatest(
                F.lit(2),
                F.floor(F.lit(1.0) / F.greatest(v, F.lit(1.0 / HEAVY_MAX_FACTOR))),
            ),
        )
    )
    weight = F.size(F.split("text", " ")) * factor
    wclass = F.floor(F.log2(weight + F.lit(1.0)))
    return F.pmod(
        F.xxhash64(F.col("doc_id").cast("string"), wclass.cast("long")),
        F.lit(num_partitions),
    ).cast("int")


def stripe_documents(documents: DataFrame, num_partitions: int) -> DataFrame:
    """Weight-striped repartition of the SMALL documents relation, before
    span expansion — the scale-critical move: the shuffle moves ~100-byte
    rows, not the expanded nested span arrays, and the downstream
    docgen+extract stages then run fused with no further shuffle.
    """
    return documents.repartition(num_partitions, stripe_key(num_partitions))


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    formats: Sequence[str] = ALL_FORMATS,
    lang: str = "eng",
    max_sentences: Optional[int] = None,
    num_partitions: Optional[int] = None,
    tile: int = 1,
) -> DataFrame:
    """documents.parquet -> stripe -> docs -> spans_out DataFrame (lazy).

    Physical plan: parquet scan -> ONE small-row shuffle (weight-striped)
    -> fused docgen+extract mapInPandas stages (no nested-data shuffle).
    """
    from pdf2ocr_spark.operators.extract import documents_to_spans

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    documents = load_documents(spark, sf_dir)
    # a single small parquet file arrives as ONE input split; everything
    # downstream of the scan (tile explode + the map side of the stripe
    # shuffle) would run in one task — a serial fraction that destroys
    # scaling. Fan the small relation out first (tiny shuffle), THEN
    # expand: each subsequent stage is fully parallel.
    documents = documents.repartition(num_partitions)
    striped = stripe_documents(tile_documents(documents, tile), num_partitions)
    # fused channel+extract: one Python worker pass, no nested-Arrow
    # intermediate (the docs relation is still available separately via
    # load_docs_corpus for operators that consume it)
    return documents_to_spans(
        striped, formats=formats, lang=lang, max_sentences=max_sentences
    )
