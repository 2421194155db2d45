#!/usr/bin/env python
"""Heavy-document straggler evidence for the EXPLODED (page-parallel) path.

Round-3 verdict #7: the skew section of the ledger proves balance for
the fused per-doc path; the exploded path (operators/exploded.py —
page-level parallelism for monster documents) had correctness tests but
no bench row. This harness builds a corpus with a handful of 1,000+-page
documents plus a normal background population, runs
``extract_spans_exploded`` over it, and reads PER-TASK durations from
Spark's own REST status API (the UI's /api/v1 taskSummary endpoint) for
the heaviest stages — the direct measurement of whether a monster
document straggles a stage.

Contrast measured here: through the FUSED per-doc path one 1,000-page
document is one kernel call in one task — the stage cannot finish before
that single task does. Through the exploded path the same document is
~1,000 independent page rows spread by ``repartition(doc_id, offset)``,
so task durations should be tightly clustered (spread = p100/p75 of the
dominant stage's task time ~ 1, not pages_heavy/pages_mean).

Usage: python BENCH/exploded_skew.py   (prints one JSON line)
Env:   EXPLODED_CPUS (32), EXPLODED_HEAVY (8 monster docs),
       EXPLODED_PAGES (1000 pages per monster), EXPLODED_NORMAL (2000).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

CPUS = int(os.environ.get("EXPLODED_CPUS", "32"))
N_HEAVY = int(os.environ.get("EXPLODED_HEAVY", "8"))
PAGES_HEAVY = int(os.environ.get("EXPLODED_PAGES", "1000"))
N_NORMAL = int(os.environ.get("EXPLODED_NORMAL", "2000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# one docgen page = SENTENCES_PER_PAGE * WORDS_PER_SENTENCE words
from pdf2ocr_spark.kernel.docgen import (  # noqa: E402
    SENTENCES_PER_PAGE,
    WORDS_PER_SENTENCE,
)

WORDS_PER_PAGE = SENTENCES_PER_PAGE * WORDS_PER_SENTENCE


def build_corpus(spark):
    """Deterministic mixed corpus: N_HEAVY documents of >= PAGES_HEAVY
    pages (word lists tiled up front — heavy_factor may inflate further,
    which only strengthens the test) + N_NORMAL typical documents, all
    derived from the driver documents table."""
    from pyspark.sql import functions as F

    from pdf2ocr_spark.operators.docgen import documents_to_docs

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    base = docs.limit(N_NORMAL).select(
        F.col("doc_id").cast("string").alias("doc_id"), "text", "source"
    )
    # monster docs: repeat the base text until >= PAGES_HEAVY pages
    seed = docs.limit(N_HEAVY).select("doc_id", "text", "source")
    reps = F.ceil(
        F.lit(PAGES_HEAVY * WORDS_PER_PAGE)
        / F.size(F.split("text", " "))
    ).cast("int")
    heavy = seed.select(
        F.concat(F.lit("heavy_"), F.col("doc_id").cast("string")).alias(
            "doc_id"
        ),
        F.array_join(
            F.array_repeat(F.col("text"), reps), " "
        ).alias("text"),
        "source",
    )
    small = base.unionByName(heavy).repartition(CPUS * 4)
    return documents_to_docs(small)


def task_summaries(spark) -> list[dict]:
    """Per-stage task-duration quantiles from the Spark REST API."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{path}") as r:
            return json.load(r)

    out = []
    for st in get("/stages?status=COMPLETE"):
        sid, att = st["stageId"], st["attemptId"]
        if st["numCompleteTasks"] < CPUS:  # only stages wide enough to skew
            continue
        try:
            q = get(
                f"/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.0,0.5,0.75,0.95,1.0"
            )
        except Exception:
            continue
        dur = q.get("duration") or q.get("executorRunTime")
        if not dur:
            continue
        out.append(
            {
                "stage": sid,
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "task_ms_min": dur[0],
                "task_ms_p50": dur[1],
                "task_ms_p75": dur[2],
                "task_ms_p95": dur[3],
                "task_ms_max": dur[4],
                "stage_total_task_sec": round(
                    st["executorRunTime"] / 1000.0, 1
                ),
            }
        )
    return out


def main() -> None:
    from pdf2ocr_spark.session import get_spark
    from pdf2ocr_spark.operators.exploded import extract_spans_exploded

    spark = get_spark(
        app_name="exploded-skew",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 4,
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    try:
        corpus = build_corpus(spark).localCheckpoint()  # freeze input
        n_docs = corpus.count()
        from pyspark.sql import functions as F

        pages = corpus.select(
            F.sum(F.size("spans")).alias("n"),
            F.max(F.size("spans")).alias("mx"),
        ).first()
        t0 = time.perf_counter()
        extract_spans_exploded(corpus, num_partitions=CPUS * 4).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = time.perf_counter() - t0

        stages = task_summaries(spark)
        # dominant stage = the one that burned the most executor time
        dom = max(stages, key=lambda s: s["stage_total_task_sec"])
        spread = round(dom["task_ms_max"] / max(dom["task_ms_p75"], 1.0), 3)
        print(
            json.dumps(
                {
                    "metric": "exploded_heavy_doc_skew",
                    "cpus": CPUS,
                    "docs": n_docs,
                    "heavy_docs": N_HEAVY,
                    "pages_per_heavy_target": PAGES_HEAVY,
                    "spans_total": int(pages["n"]),
                    "spans_max_per_doc": int(pages["mx"]),
                    "wall_sec": round(wall, 2),
                    "dominant_stage": dom,
                    "straggler_spread_max_over_p75": spread,
                    "stages": sorted(
                        stages,
                        key=lambda s: -s["stage_total_task_sec"],
                    )[:6],
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
