"""Structured Streaming surface: incremental document ingest."""

from pdf2ocr_spark.streaming.ingest import (  # noqa: F401
    start_extract_stream,
    stream_extract_available_now,
)
