#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Measures, on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):

1. per-query wall time for every registered oracle query (full evaluation
   via the noop sink — no driver collect),
2. the flagship extraction pipeline's docs/sec + pages/sec at TWO
   parallelism levels (local[N/4] vs local[N], same frozen input), and the
   throughput scaling efficiency between them — the sandbox stand-in for
   the north rule's N vs 4N executor criterion (BASELINE.md protocol).

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {...}, "sf": ..., "extract": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SMALL_CPUS = max(1, CPUS // 4)
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"
#: the scaling runs tile the corpus to this many effective documents so the
#: measurement amortizes fixed job overhead (kernel work is ~0.25 ms/doc/core;
#: see BENCH/BASELINE.md protocol)
TARGET_DOCS = int(os.environ.get("BENCH_TARGET_DOCS", "2000000"))


def _evaluate(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _fresh_spark(cpus: int):
    from pdf2ocr_spark.session import get_spark

    return get_spark(
        app_name=f"bench-local{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def time_queries(spark) -> dict:
    from pdf2ocr_spark.plans import QUERIES

    timings = {}
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        _evaluate(df)
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def extract_run(cpus: int, tile: int, counts: dict | None = None) -> dict:
    """One full extraction at a given parallelism; fresh session so the
    thread pool really is the parallelism under test. Input is the sf
    corpus tiled to ~TARGET_DOCS effective documents (identical for every
    parallelism level)."""
    from pyspark.sql import functions as F

    from pdf2ocr_spark.operators.docgen import documents_to_docs
    from pdf2ocr_spark.pipeline import load_documents, run_pipeline, tile_documents

    spark = _fresh_spark(cpus)
    try:
        if counts is None:
            docs = documents_to_docs(
                tile_documents(load_documents(spark, SF_DIR), tile)
            )
            row = docs.select(
                F.count("*").alias("docs"),
                F.sum(
                    F.size(F.filter("spans", lambda s: s["kind"] == "page"))
                ).alias("pages"),
            ).collect()[0]
            counts = {"docs": int(row["docs"]), "pages": int(row["pages"])}

        out = run_pipeline(spark, SF_DIR, num_partitions=cpus * 4, tile=tile)
        t0 = time.perf_counter()
        _evaluate(out)
        wall = time.perf_counter() - t0
        return {
            "cpus": cpus,
            "wall_sec": round(wall, 3),
            "docs": counts["docs"],
            "pages": counts["pages"],
            "docs_per_sec": round(counts["docs"] / wall, 2),
            "pages_per_sec": round(counts["pages"] / wall, 2),
            "counts": counts,
        }
    finally:
        spark.stop()


def main() -> None:
    t_total0 = time.perf_counter()

    spark = _fresh_spark(CPUS)
    try:
        timings = time_queries(spark)
        # flagship timing at full parallelism is also a "query"
        from pdf2ocr_spark.pipeline import run_pipeline

        df = run_pipeline(spark, SF_DIR, num_partitions=CPUS * 2)
        t0 = time.perf_counter()
        _evaluate(df)
        timings["extract_pipeline"] = round(time.perf_counter() - t0, 3)
    finally:
        spark.stop()

    extract = {}
    if not SKIP_SCALING:
        import duckdb

        n_raw = duckdb.sql(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        tile = max(1, TARGET_DOCS // n_raw)
        small = extract_run(SMALL_CPUS, tile)
        big = extract_run(CPUS, tile, counts=small["counts"])
        small.pop("counts", None)
        big.pop("counts", None)
        ratio = CPUS / SMALL_CPUS
        eff = big["docs_per_sec"] / (ratio * small["docs_per_sec"])
        extract = {
            "tile": tile,
            "small": small,
            "big": big,
            "scaling_ratio": ratio,
            "scaling_efficiency": round(eff, 3),
        }

    total = round(time.perf_counter() - t_total0, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "docs_per_sec_extraction",
                "value": extract.get("big", {}).get(
                    "docs_per_sec", timings.get("extract_pipeline")
                ),
                "unit": "docs/sec" if extract else "sec",
                "queries": timings,
                "sf": float(sf),
                "extract": extract,
                "total_bench_sec": total,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
