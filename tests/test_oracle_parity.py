"""Driver-gate rehearsal: run every registered query on Spark AND its
DuckDB oracle on the same parquet tables, then compare row count, column
names, and order-insensitive values — the same contract the driver applies
at sf0.01 (see /root/repo/__spark_entry__.py docstring).
"""

import math

import duckdb
import pytest

from pdf2ocr_spark.plans import ORACLE_SQL, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df):
    """Sort columns by name, round floats, sort rows -> list of tuples."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                row.append(round(v, 4) if not math.isnan(v) else "nan")
            else:
                row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, ducks):
    spark_df = QUERIES[name](spark, sf_dir).toPandas()
    oracle_df = ducks.execute(ORACLE_SQL[name]).df()

    assert len(spark_df) == len(oracle_df), (
        f"{name}: rowcount {len(spark_df)} != oracle {len(oracle_df)}"
    )
    s_cols, s_rows = normalize(spark_df)
    o_cols, o_rows = normalize(oracle_df)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    # dtype KINDS must agree too: the driver's value hash distinguishes
    # 1234567 from 1234567.0 (DuckDB HUGEINT -> pandas float64 masked the
    # summary_stats mismatch in round 1); Python == comparison does not.
    s_kinds = {c: spark_df[c].dtype.kind for c in spark_df.columns}
    o_kinds = {c: oracle_df[c].dtype.kind for c in oracle_df.columns}
    assert s_kinds == o_kinds, f"{name}: dtype kinds {s_kinds} != {o_kinds}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
