"""Named query registry: every SQL-expressible operator from SURVEY.md §2
is registered here as a (Spark DataFrame builder, DuckDB oracle SQL) pair.
"""

from pdf2ocr_spark.plans.queries import ORACLE_SQL, QUERIES  # noqa: F401
