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


def load_docs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's input relation, derived deterministically from the
    driver-provided documents table (kernel/docgen.py channel model)."""
    return documents_to_docs(load_documents(spark, sf_dir))


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    formats: Sequence[str] = ALL_FORMATS,
    lang: str = "eng",
    max_sentences: Optional[int] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """documents.parquet -> docs -> spans_out DataFrame (lazy)."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    docs = load_docs_corpus(spark, sf_dir)
    return extract_spans(
        docs,
        formats=formats,
        lang=lang,
        max_sentences=max_sentences,
        num_partitions=num_partitions,
    )
