#!/usr/bin/env python
"""spark-submit entry point for the checkpointed extraction job.

Cluster usage (north rule: multi-executor, two cluster sizes):

    cd /root/repo && zip -qr /tmp/pdf2ocr_spark.zip pdf2ocr_spark
    spark-submit --py-files /tmp/pdf2ocr_spark.zip \
        --master <cluster-master> \
        jobs/run_extract.py \
        --sf-dir /root/testdata/sf0.1 --output /tmp/extract_out \
        --partitions 256 [--tile 40] [--no-resume]

Prints one JSON summary line (partitions processed/skipped, docs/sec from
the lineage relation) on completion. Sandbox evidence runs use
``--master local[8]`` vs ``local[32]`` (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--tile", type=int, default=1)
    ap.add_argument("--formats", default="text,docx_para,html,markdown")
    ap.add_argument("--lang", default="eng")
    ap.add_argument("--max-sentences", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("pdf2ocr_spark-extract").getOrCreate()

    from pdf2ocr_spark.operators.checkpoint import run_checkpointed, summary
    from pdf2ocr_spark.operators.docgen import documents_to_docs
    from pdf2ocr_spark.pipeline import (
        load_documents,
        stripe_documents,
        tile_documents,
    )

    t0 = time.perf_counter()
    documents = tile_documents(load_documents(spark, args.sf_dir), args.tile)
    docs = documents_to_docs(stripe_documents(documents, args.partitions))
    res = run_checkpointed(
        spark,
        docs,
        args.output,
        num_partitions=args.partitions,
        formats=tuple(args.formats.split(",")),
        lang=args.lang,
        max_sentences=args.max_sentences or None,
        resume=not args.no_resume,
    )
    wall = time.perf_counter() - t0

    stats = {}
    if res["processed"] > 0 or res["skipped"] > 0:
        row = summary(spark, args.output).collect()[0]
        stats = row.asDict()

    print(json.dumps({"result": res, "wall_sec": round(wall, 3), "summary": stats}))
    spark.stop()


if __name__ == "__main__":
    main()
