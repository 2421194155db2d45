"""Catalog abstraction round trip + full driver-contract smoke: every
registered query (including rows-only ones) runs at sf0.001 with a stable
schema across invocations."""

import shutil
import tempfile

import pytest

import __spark_entry__ as entrymod
from pdf2ocr_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark):
    root = tempfile.mkdtemp(prefix="cat_")
    yield Catalog(spark, root)
    shutil.rmtree(root, ignore_errors=True)


def test_catalog_parquet_roundtrip(spark, cat):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        "id", (F.col("id") % 4).cast("int").alias("part")
    )
    assert not cat.table_exists("t1")
    cat.write_table(df, "t1", partition_by="part")
    assert cat.table_exists("t1")
    back = cat.read_table("t1")
    assert back.count() == 100
    assert set(back.columns) == {"id", "part"}
    assert cat.use_iceberg is False  # sandbox has no Iceberg jars


class _RecordingWriter:
    """writeTo() writer double recording the V2 calls Catalog makes."""

    def __init__(self, log):
        self.log = log

    def overwritePartitions(self):
        self.log.append("overwritePartitions")

    def createOrReplace(self):
        self.log.append("createOrReplace")


class _FakeIcebergSession:
    class _Conf:
        def get(self, key, default=None):
            if key == "spark.sql.extensions":
                return (
                    "org.apache.iceberg.spark.extensions."
                    "IcebergSparkSessionExtensions"
                )
            return default

    class _Read:
        def __init__(self, log):
            self.log = log

        def table(self, ident):
            self.log.append(("read.table", ident))
            return f"df:{ident}"

    class _Catalog:
        def __init__(self, log):
            self.log = log

        def tableExists(self, ident):
            self.log.append(("tableExists", ident))
            return True

    def __init__(self):
        self.log = []
        self.conf = self._Conf()
        self.read = self._Read(self.log)
        self.catalog = self._Catalog(self.log)


class _FakeDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        self.log.append(("writeTo", ident))
        return _RecordingWriter(self.log)


def test_catalog_iceberg_branch_contract():
    """The Iceberg branch cannot execute in-sandbox (no jars), so its
    identifier and overwrite semantics are pinned against recorded-call
    fakes: writeTo(<db>.<name>).overwritePartitions() for checkpointed
    partition overwrite, .createOrReplace() otherwise, read via
    spark.read.table(<db>.<name>) — a typo in the branch fails here."""
    spark = _FakeIcebergSession()
    cat = Catalog(spark, root="/unused", database="prod.db")
    assert cat.use_iceberg is True

    assert cat.read_table("docs") == "df:prod.db.docs"
    assert spark.log[-1] == ("read.table", "prod.db.docs")

    df = _FakeDF(spark.log)
    cat.write_table(df, "spans_out", overwrite_partitions=True)
    assert spark.log[-2:] == [("writeTo", "prod.db.spans_out"), "overwritePartitions"]

    cat.write_table(df, "lineage")
    assert spark.log[-2:] == [("writeTo", "prod.db.lineage"), "createOrReplace"]

    assert cat.table_exists("docs") is True
    assert spark.log[-1] == ("tableExists", "prod.db.docs")


def test_catalog_partition_overwrite_idempotent(spark, cat):
    from pyspark.sql import functions as F

    df = spark.range(40).select("id", (F.col("id") % 4).cast("int").alias("part"))
    cat.write_table(df, "t2", partition_by="part")
    # overwrite only partition 0 with new content
    p0 = spark.range(5).select(
        (F.col("id") + 1000).alias("id"), F.lit(0).cast("int").alias("part")
    )
    cat.write_table(p0, "t2", partition_by="part", overwrite_partitions=True)
    back = cat.read_table("t2").toPandas()
    assert len(back[back["part"] == 0]) == 5
    assert len(back[back["part"] != 0]) == 30


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_every_query_analyzes_with_stable_schema(spark, sf_dir, name):
    """Analysis-only check (schema resolution is lazy and cheap): full
    evaluation coverage lives in test_oracle_parity (SQL queries) and the
    dedicated operator tests (rows-only queries)."""
    fn = entrymod.queries()[name]
    a = fn(spark, sf_dir)
    b = fn(spark, sf_dir)
    assert a.schema == b.schema
    assert len(a.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    # the non-SQL-expressible ops are intentionally rows-only
    assert {"extract_pipeline", "docs_corpus", "ocr_roundtrip", "media_features"} <= (
        q - o
    )


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Catalog.write_bucketed layout claim, verified at the PHYSICAL-PLAN
    level: two tables bucketed by the same key sort-merge-join with NO
    Exchange on either side (each task reads its matching bucket files
    co-located), while the same join over plain parquet shuffles both
    sides. Broadcast is disabled so the plan can't dodge the question —
    at 10^12 docs neither side broadcasts and this elision is the
    difference between moving the corpus over the network and not."""
    import uuid

    from pyspark.sql import functions as F

    cat = Catalog(spark, root=str(tmp_path))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "lang", "n_chars")
    ln, rn = f"b_left_{uuid.uuid4().hex[:8]}", f"b_right_{uuid.uuid4().hex[:8]}"
    try:
        cat.write_bucketed(left, ln, key="doc_id", n_buckets=4)
        cat.write_bucketed(right, rn, key="doc_id", n_buckets=4)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = cat.read_bucketed(ln).join(cat.read_bucketed(rn), "doc_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and it's not vacuous: the same join un-bucketed DOES shuffle
            shuffled = left.join(right, "doc_id")
            plan2 = shuffled._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in plan2
            # correctness: bucketed join returns the same relation
            assert joined.count() == shuffled.count() == docs.count()
            s = joined.agg(F.sum("n_chars")).first()[0]
            assert s == docs.agg(F.sum("n_chars")).first()[0]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ln}")
        spark.sql(f"DROP TABLE IF EXISTS {rn}")
