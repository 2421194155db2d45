#!/usr/bin/env python
"""End-to-end spark-submit job pair (N vs 4N) with PER-PHASE scaling.

Round-3 verdict #2: the end-to-end job pair's 0.48 ratio was attributed
to single-socket byte movement, but — unlike the extraction-stage pair —
that claim had no published decomposition. This harness runs the full
checkpointed job (`jobs/run_extract.py` via spark-submit --py-files,
taskset-pinned under the executor model: 1 JVM service core per 4
workers) at 4 and 16 workers, INTERLEAVED (host-noise bursts last
minutes and would otherwise inflate one whole level), and decomposes
each run from its own lineage:

- kernel_cpu_sec   = summary.total_kernel_sec — the Python channel+
                     extract work, summed over partitions from the
                     in-kernel lineage timers (the scalable phase);
- kernel_wall_share= kernel_cpu / workers — the wall the kernel phase
                     contributes if perfectly overlapped;
- byte_wall_sec    = kernel_write_wall - kernel_wall_share — everything
                     else in the write stage: scan, the small-row
                     shuffle, Arrow loopback both directions, parquet
                     encode, partition-overwrite commit. This is the
                     machine-bound remainder the 0.48 ratio exposes.

Per-phase 4->16 efficiency:
- overall  = wall_4 / (4 * wall_16)        (throughput-ratio identity)
- kernel   = kernel_cpu_4 / kernel_cpu_16  (same identity: kernel-only
             throughput at level w is docs * w / kernel_cpu)
- byte     = byte_wall_4 / (4 * byte_wall_16)

Each metric takes the MIN across rounds independently (noise on this
box is strictly additive — BENCH/BASELINE.md protocol).

Usage:  python BENCH/job_pair.py            # official pair, 3 rounds
        JOB_PAIR_CODEC=zstd python BENCH/job_pair.py   # codec A/B
Env:    JOB_PAIR_ROUNDS (3), JOB_PAIR_TILE (10), JOB_PAIR_PARTS (128),
        JOB_PAIR_SF (/root/testdata/sf0.1), JOB_PAIR_CODEC (snappy).
Prints one JSON line; numbers land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("JOB_PAIR_SF", "/root/testdata/sf0.1")
#: tile 100 at sf0.1 = 500k effective docs / 17.9M output spans — the
#: corpus size of the round-2/round-3 ledger rows this pair extends
TILE = int(os.environ.get("JOB_PAIR_TILE", "100"))
PARTS = int(os.environ.get("JOB_PAIR_PARTS", "128"))
ROUNDS = int(os.environ.get("JOB_PAIR_ROUNDS", "3"))
CODEC = os.environ.get("JOB_PAIR_CODEC", "snappy")
JVM_PER = 4  # executor model: 1 JVM service core per 4 workers


def _zip_pkg(tmp: str) -> str:
    zp = os.path.join(tmp, "pdf2ocr_spark.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "pdf2ocr_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zp


def _spark_submit() -> str:
    ss = shutil.which("spark-submit")
    if ss:
        return ss
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def run_job(workers: int, zp: str, tmp: str) -> dict:
    jvm = max(1, workers // JVM_PER)
    out = os.path.join(tmp, f"out_w{workers}")
    shutil.rmtree(out, ignore_errors=True)
    cmd = [
        "taskset", "-c", f"0-{workers + jvm - 1}",
        _spark_submit(),
        "--master", f"local[{workers}]",
        "--driver-memory", "24g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={workers}",
        "--conf", f"spark.sql.parquet.compression.codec={CODEC}",
        "--py-files", zp,
        os.path.join(REPO, "jobs", "run_extract.py"),
        "--sf-dir", SF,
        "--tile", str(TILE),
        "--partitions", str(PARTS),
        "--output", out,
        "--no-resume",
        "--quiet",
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900, cwd=tmp
    )
    if proc.returncode != 0:
        raise RuntimeError(f"w{workers} failed: {proc.stderr[-2000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    wall = res["wall_sec"]
    cpu = res["summary"]["total_kernel_sec"]
    ph = res["result"]["phase_sec"]
    kw = ph["kernel_write"]
    docs = res["summary"]["files_processed"]
    shutil.rmtree(out, ignore_errors=True)
    return {
        "workers": workers,
        "wall_sec": wall,
        "kernel_write_wall": kw,
        "kernel_cpu_sec": cpu,
        "kernel_wall_share": round(cpu / workers, 2),
        "byte_wall_sec": round(kw - cpu / workers, 2),
        "verify_sec": ph["verify"],
        "resume_check_sec": ph["resume_check"],
        "docs": docs,
        "docs_per_sec": round(docs / wall, 1),
        "spans": res["summary"]["spans_emitted"],
    }


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="job_pair_")
    try:
        zp = _zip_pkg(tmp)
        levels = (4, 16)
        runs: dict[int, list[dict]] = {w: [] for w in levels}
        for r in range(ROUNDS):
            for w in levels:  # interleave
                t0 = time.time()
                res = run_job(w, zp, tmp)
                res["round"] = r
                runs[w].append(res)
                print(
                    f"# round {r} w{w}: wall {res['wall_sec']}s, kernel_cpu "
                    f"{res['kernel_cpu_sec']}s, byte {res['byte_wall_sec']}s "
                    f"(launch+run {round(time.time() - t0, 1)}s)",
                    file=sys.stderr,
                )

        def best(w: int) -> dict:
            rs = runs[w]
            # min per metric independently: noise is additive
            return {
                "workers": w,
                "docs": rs[0]["docs"],
                "spans": rs[0]["spans"],
                "wall_sec": min(r["wall_sec"] for r in rs),
                "kernel_cpu_sec": min(r["kernel_cpu_sec"] for r in rs),
                "kernel_write_wall": min(r["kernel_write_wall"] for r in rs),
                "byte_wall_sec": min(r["byte_wall_sec"] for r in rs),
                "verify_sec": min(r["verify_sec"] for r in rs),
                "docs_per_sec": round(
                    rs[0]["docs"] / min(r["wall_sec"] for r in rs), 1
                ),
                "all_walls": sorted(r["wall_sec"] for r in rs),
            }

        small, big = best(4), best(16)
        ratio = big["workers"] / small["workers"]
        summary = {
            "metric": "job_pair_per_phase",
            "sf": SF,
            "tile": TILE,
            "partitions": PARTS,
            "codec": CODEC,
            "rounds": ROUNDS,
            "small": small,
            "big": big,
            "efficiency": {
                "overall": round(
                    small["wall_sec"] / (ratio * big["wall_sec"]), 3
                ),
                "kernel_phase": round(
                    small["kernel_cpu_sec"] / big["kernel_cpu_sec"], 3
                ),
                "byte_phase": round(
                    small["byte_wall_sec"] / (ratio * big["byte_wall_sec"]), 3
                ),
            },
            "runs": {str(w): runs[w] for w in levels},
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
