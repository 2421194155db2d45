#!/usr/bin/env python
"""Generate a synthetic 10x measurement corpus (guide §1: measure at the
scale the driver measures). The driver's round-end bench ran at sf=1.0 on
driver-generated data we do not have; this script tiles sf0.1 ten times
with deterministic per-replica mutations so that

- documents: 50,000 rows, per-replica VOCABULARY ROTATION (a bijection on
  the corpus's shared 31-word vocabulary) keeps word-count and length
  distributions AND keeps the vocabulary shared across replicas — so
  shingle/token document frequencies scale 10x exactly as a genuine 10x
  generation would (a naive tile would make every doc 10 exact copies and
  distort every dedup query; a per-replica letter translation would make
  vocabularies disjoint and UNDERstate the pairwise-join fan-out);
- events: 1,000,000 rows over the same 30-day window with 15,000 users
  (matches the sf0.01 -> sf0.1 scaling law: fixed window, 10x users);
- embeddings: 20,000 rows, replica vectors rolled + sign-flipped;
- TPC-H tables: keys shifted per replica, fixed dims kept single-copy.

NOT part of any query path or the frozen bench contract — measurement
tooling only (bench_extra.py points SPARK_GRAFT_SF_DIR here).

Usage: python bench_gen.py [out_dir]   # default /root/sfm1.0
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfm1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(name: str, sql: str) -> None:
        con.sql(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    vocab = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    vlist = "[" + ", ".join(f"'{w}'" for w in vocab) + "]"
    nv = len(vocab)
    docs_parts = []
    for rep in range(REPS):
        rot = (rep * 5) % nv
        docs_parts.append(
            f"SELECT doc_id + {rep * 5000} AS doc_id, "
            f"array_to_string(list_transform(string_split(text, ' '), "
            f"w -> ({vlist})[(list_position({vlist}, w) - 1 + {rot}) % {nv} + 1]"
            f"), ' ') AS text, "
            f"lang, source, n_chars "
            f"FROM '{SRC}/documents.parquet'"
        )
    write("documents", " UNION ALL ".join(docs_parts))

    ev_parts = []
    for rep in range(REPS):
        ev_parts.append(
            f"SELECT event_id + {rep * 100000} AS event_id, "
            f"ts + INTERVAL ({rep * 13}) SECOND AS ts, "
            f"user_id + {rep * 1500} AS user_id, "
            f"event_type, value, props "
            f"FROM '{SRC}/events.parquet'"
        )
    write("events", " UNION ALL ".join(ev_parts))

    emb_parts = []
    for rep in range(REPS):
        emb_parts.append(
            f"SELECT vec_id + {rep * 2000} AS vec_id, "
            f"list_transform(embedding, x -> x * (1.0 + {rep} * 0.003)) "
            f"AS embedding, label "
            f"FROM '{SRC}/embeddings.parquet'"
        )
    write("embeddings", " UNION ALL ".join(emb_parts))

    li_parts, o_parts, c_parts, p_parts, s_parts = [], [], [], [], []
    for rep in range(REPS):
        li_parts.append(
            f"SELECT l_orderkey + {rep * 150000} AS l_orderkey, "
            f"l_partkey + {rep * 20000} AS l_partkey, "
            f"l_suppkey + {rep * 1000} AS l_suppkey, "
            f"l_linenumber, l_quantity, l_extendedprice, l_discount, "
            f"l_tax, l_returnflag, l_linestatus, l_shipdate "
            f"FROM '{SRC}/lineitem.parquet'"
        )
        o_parts.append(
            f"SELECT o_orderkey + {rep * 150000} AS o_orderkey, "
            f"o_custkey + {rep * 15000} AS o_custkey, "
            f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
            f"FROM '{SRC}/orders.parquet'"
        )
        c_parts.append(
            f"SELECT c_custkey + {rep * 15000} AS c_custkey, c_name, "
            f"c_nationkey, c_acctbal, c_mktsegment "
            f"FROM '{SRC}/customer.parquet'"
        )
        p_parts.append(
            f"SELECT p_partkey + {rep * 20000} AS p_partkey, p_name, "
            f"p_brand, p_type, p_size, p_retailprice "
            f"FROM '{SRC}/part.parquet'"
        )
        s_parts.append(
            f"SELECT s_suppkey + {rep * 1000} AS s_suppkey, s_name, "
            f"s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'"
        )
    write("lineitem", " UNION ALL ".join(li_parts))
    write("orders", " UNION ALL ".join(o_parts))
    write("customer", " UNION ALL ".join(c_parts))
    write("part", " UNION ALL ".join(p_parts))
    write("supplier", " UNION ALL ".join(s_parts))
    write("nation", f"SELECT * FROM '{SRC}/nation.parquet'")
    write("region", f"SELECT * FROM '{SRC}/region.parquet'")


if __name__ == "__main__":
    main()
