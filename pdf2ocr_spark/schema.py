"""Fixed relation schemas (SURVEY.md §1: the engine's data model)."""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

#: input relation: one row per document, interleaved text+media spans
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

#: output relation: one row per emitted span
SPANS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

#: per-partition lineage/metrics relation (checkpoint + resume granularity)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType()),
        T.StructField("page_count", T.LongType()),
        T.StructField("span_count", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("started_unix", T.DoubleType()),
        T.StructField("finished_unix", T.DoubleType()),
        T.StructField("docs_per_sec", T.DoubleType()),
    ]
)
