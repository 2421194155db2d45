"""Table IO abstraction (Iceberg when available, parquet fallback)."""

from pdf2ocr_spark.sources.catalog import Catalog  # noqa: F401
