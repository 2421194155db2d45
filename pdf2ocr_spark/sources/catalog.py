"""Catalog abstraction: Iceberg tables when the runtime has the Iceberg
Spark extension, plain parquet paths otherwise (SURVEY.md §7 risk item —
the sandbox ships no Iceberg jars, so pytest never depends on them).

The production deployment registers the docs / spans_out / lineage tables
in an Iceberg catalog with:

    docs       PARTITIONED BY (bucket(1024, doc_id))   -- the write-time
               weight-striping that makes extraction shuffle-free
    spans_out  PARTITIONED BY (part_id)                -- idempotent
               partition-overwrite checkpointing
    lineage    PARTITIONED BY (part_id)

`Catalog` keeps that shape behind read_table/write_table so the engine
code is identical in both modes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session."""
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
        return "IcebergSparkSessionExtensions" in exts
    except Exception:
        return False


class Catalog:
    """Uniform table IO: `name` maps to `<catalog>.<db>.<name>` under
    Iceberg or `<root>/<name>` parquet directories otherwise."""

    def __init__(self, spark: SparkSession, root: str, database: str = "local.db"):
        self.spark = spark
        self.root = root
        self.database = database
        self.use_iceberg = iceberg_available(spark)

    def _ident(self, name: str) -> str:
        return f"{self.database}.{name}"

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read_table(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def write_table(
        self, df: DataFrame, name: str, partition_by: str | None = None,
        overwrite_partitions: bool = False,
    ) -> None:
        if self.use_iceberg:
            writer = df.writeTo(self._ident(name))
            if overwrite_partitions:
                writer.overwritePartitions()
            else:
                writer.createOrReplace()
            return
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode",
            "dynamic" if overwrite_partitions else "static",
        )
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(self._path(name))

    def table_exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self._ident(name))
        try:
            self.spark.read.parquet(self._path(name)).schema
            return True
        except Exception:
            return False
