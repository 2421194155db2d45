#!/usr/bin/env python
"""N vs 4N on a REAL multi-executor standalone cluster (one box).

The north rule asks for `spark-submit --py-files` to a multi-executor
cluster at two cluster sizes. The bench's pinned local[N] pair emulates
that with core counts; THIS harness runs the real thing inside the
sandbox: a standalone master + 4 worker JVMs, each worker taskset-pinned
to its own disjoint 5-core set (4 executor cores + that worker's own
JVM headroom — the per-executor provisioning of the executor model),
then the SAME checkpointed extraction job submitted twice per round:

    spark.cores.max=4   -> 1 executor  (N)
    spark.cores.max=16  -> 4 executors (4N, one per worker — standalone
                           spreadOut placement)

Every byte between driver and executors, and between executors, crosses
REAL process boundaries (netty RPC + shuffle service, separate Python
worker pools per executor) — the failure modes a local[N] thread pool
cannot exhibit. Same corpus and same decomposition as BENCH/job_pair.py
(kernel_cpu from lineage; byte_wall = write wall − kernel_cpu/cores).

Two modes:
- SA_MODE=job (default): the full checkpointed job (jobs/run_extract.py
  — scan, small-row shuffle, fused kernel, parquet sink, lineage
  verify). The end-to-end statement.
- SA_MODE=stage: the EXTRACTION STAGE alone over the pre-materialized
  weight-striped corpus (the bench's official pair, bench.py
  extract_run, now on real executors): parquet scan -> mapInArrow
  kernel -> noop sink, zero shuffle. This is the north rule's
  ">= 0.8 N -> 4N" criterion in its most faithful form — real executor
  processes, per-executor Python pools, no single-writer sink in the
  way. Each level runs several in-JVM iterations; min is taken.

Usage: python BENCH/standalone_pair.py   (prints one JSON line)
Env:   SA_MODE (job), SA_ROUNDS (3), SA_TILE (100), SA_PARTS (128),
       SA_ITERS (3, stage mode in-JVM iterations), SA_SF
       (/root/testdata/sf0.1).
The cluster is torn down afterwards even on failure.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
PY = sys.executable
SF = os.environ.get("SA_SF", "/root/testdata/sf0.1")
TILE = int(os.environ.get("SA_TILE", "100"))
PARTS = int(os.environ.get("SA_PARTS", "128"))
ROUNDS = int(os.environ.get("SA_ROUNDS", "3"))
MODE = os.environ.get("SA_MODE", "job")
STAGE_ITERS = int(os.environ.get("SA_ITERS", "3"))
MASTER_PORT = 7077
MASTER_REST = "http://127.0.0.1:8090/json/"
N_WORKERS = 4
CORES_PER_WORKER = 4
#: each worker pinned to 5 cores: 4 executor task cores + the worker's
#: own JVM share (executor model, BENCH/BASELINE.md protocol)
WORKER_CORE_SETS = ["0-4", "5-9", "10-14", "15-19"]
DRIVER_CORES = "24-29"


def _spark_class(*args, pin: str | None = None, log: str = os.devnull):
    cmd = []
    if pin:
        cmd += ["taskset", "-c", pin]
    cmd += [os.path.join(SPARK_HOME, "bin", "spark-class"), *args]
    return subprocess.Popen(
        cmd,
        stdout=open(log, "w"),
        stderr=subprocess.STDOUT,
        env={**os.environ, "SPARK_LOG_DIR": "/tmp/sa_logs"},
        start_new_session=True,
    )


def start_cluster(tmp: str) -> list[subprocess.Popen]:
    procs = [
        _spark_class(
            "org.apache.spark.deploy.master.Master",
            "-h", "127.0.0.1", "-p", str(MASTER_PORT), "--webui-port", "8090",
            log=os.path.join(tmp, "master.log"),
        )
    ]
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            urllib.request.urlopen(MASTER_REST, timeout=2)
            break
        except Exception:
            time.sleep(1)
    else:
        raise RuntimeError("master did not come up")
    for i in range(N_WORKERS):
        procs.append(
            _spark_class(
                "org.apache.spark.deploy.worker.Worker",
                f"spark://127.0.0.1:{MASTER_PORT}",
                "--cores", str(CORES_PER_WORKER), "--memory", "16g",
                "--work-dir", os.path.join(tmp, f"work{i}"),
                "--webui-port", str(8091 + i),
                pin=WORKER_CORE_SETS[i],
                log=os.path.join(tmp, f"worker{i}.log"),
            )
        )
    deadline = time.time() + 60
    while time.time() < deadline:
        st = json.load(urllib.request.urlopen(MASTER_REST, timeout=2))
        if st["aliveworkers"] == N_WORKERS:
            return procs
        time.sleep(1)
    raise RuntimeError("workers did not register")


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(p.pid, signal.SIGTERM)
        except Exception:
            pass
    time.sleep(2)
    for p in reversed(procs):
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except Exception:
            pass


def _zip_pkg(tmp: str) -> str:
    zp = os.path.join(tmp, "pdf2ocr_spark.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "pdf2ocr_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zp


STAGE_SCRIPT = """
import time
from pyspark.sql import SparkSession
from pdf2ocr_spark.operators.extract import extract_spans_arrow
spark = SparkSession.builder.getOrCreate()
docs = spark.read.parquet({cache!r})
probe = docs.limit(2000)   # warm the per-executor Python worker pools
extract_spans_arrow(probe).write.format("noop").mode("overwrite").save()
for _ in range({iters}):
    t0 = time.perf_counter()
    extract_spans_arrow(docs).write.format("noop").mode("overwrite").save()
    print("WALL_SEC", time.perf_counter() - t0)
spark.stop()
"""


def _corpus_cache() -> tuple[str, int]:
    """Materialize the weight-striped corpus with the bench's own
    builder (local session, BEFORE the cluster starts), return
    (path, docs)."""
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF)
    import bench

    cache = bench.materialize_corpus(TILE)
    counts = bench.corpus_counts(TILE)
    return cache, counts["docs"]


def run_stage(cores_max: int, zp: str, tmp: str, cache: str, docs: int) -> dict:
    script = os.path.join(tmp, "stage.py")
    with open(script, "w") as f:
        f.write(STAGE_SCRIPT.format(cache=cache, iters=STAGE_ITERS))
    cmd = [
        "taskset", "-c", DRIVER_CORES,
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", f"spark://127.0.0.1:{MASTER_PORT}",
        "--driver-memory", "8g",
        "--conf", f"spark.cores.max={cores_max}",
        "--conf", f"spark.executor.cores={CORES_PER_WORKER}",
        "--conf", "spark.executor.memory=12g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={cores_max}",
        "--conf", "spark.sql.files.maxPartitionBytes=1m",
        "--conf", "spark.sql.files.openCostInBytes=0",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=128",
        "--conf", f"spark.pyspark.python={PY}",
        "--py-files", zp,
        script,
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=900, cwd=tmp
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"stage cores.max={cores_max} failed: {proc.stderr[-2000:]}"
        )
    walls = sorted(
        float(l.split()[1])
        for l in proc.stdout.splitlines()
        if l.startswith("WALL_SEC")
    )
    return {
        "executors": cores_max // CORES_PER_WORKER,
        "cores": cores_max,
        "wall_sec": round(walls[0], 3),
        "walls": [round(w, 3) for w in walls],
        "docs": docs,
        "docs_per_sec": round(docs / walls[0], 1),
    }


def run_job(cores_max: int, zp: str, tmp: str) -> dict:
    out = os.path.join(tmp, f"out_c{cores_max}")
    shutil.rmtree(out, ignore_errors=True)
    cmd = [
        "taskset", "-c", DRIVER_CORES,
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", f"spark://127.0.0.1:{MASTER_PORT}",
        "--driver-memory", "12g",
        "--conf", f"spark.cores.max={cores_max}",
        "--conf", f"spark.executor.cores={CORES_PER_WORKER}",
        "--conf", "spark.executor.memory=12g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={cores_max}",
        "--conf", f"spark.pyspark.python={PY}",
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
        raise RuntimeError(
            f"cores.max={cores_max} failed: {proc.stderr[-2000:]}"
        )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    n_exec = cores_max // CORES_PER_WORKER
    wall = res["wall_sec"]
    cpu = res["summary"]["total_kernel_sec"]
    kw = res["result"]["phase_sec"]["kernel_write"]
    docs = res["summary"]["files_processed"]
    shutil.rmtree(out, ignore_errors=True)
    return {
        "executors": n_exec,
        "cores": cores_max,
        "wall_sec": wall,
        "kernel_write_wall": kw,
        "kernel_cpu_sec": cpu,
        "byte_wall_sec": round(kw - cpu / cores_max, 2),
        "docs": docs,
        "docs_per_sec": round(docs / wall, 1),
        "spans": res["summary"]["spans_emitted"],
    }


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="sa_pair_")
    procs = []
    try:
        zp = _zip_pkg(tmp)
        if MODE == "stage":
            cache, docs = _corpus_cache()  # local session, pre-cluster
        procs = start_cluster(tmp)
        levels = (4, 16)  # cores.max -> 1 vs 4 executors
        runs: dict[int, list[dict]] = {c: [] for c in levels}
        for r in range(ROUNDS):
            for c in levels:  # interleave
                if MODE == "stage":
                    res = run_stage(c, zp, tmp, cache, docs)
                    res["round"] = r
                    runs[c].append(res)
                    print(
                        f"# round {r} {res['executors']}x executors "
                        f"(stage): walls {res['walls']}",
                        file=sys.stderr,
                    )
                    continue
                res = run_job(c, zp, tmp)
                res["round"] = r
                runs[c].append(res)
                print(
                    f"# round {r} {res['executors']}x executors: wall "
                    f"{res['wall_sec']}s, kernel_cpu {res['kernel_cpu_sec']}s,"
                    f" byte {res['byte_wall_sec']}s",
                    file=sys.stderr,
                )

        if MODE == "stage":
            def best_stage(c: int) -> dict:
                rs = runs[c]
                walls = sorted(w for r in rs for w in r["walls"])
                return {
                    "executors": rs[0]["executors"],
                    "cores": c,
                    "docs": docs,
                    "wall_sec": walls[0],
                    "docs_per_sec": round(docs / walls[0], 1),
                    "all_walls": walls,
                }

            small, big = best_stage(4), best_stage(16)
            ratio = big["cores"] / small["cores"]
            print(
                json.dumps(
                    {
                        "metric": "standalone_cluster_stage_pair",
                        "sf": SF,
                        "tile": TILE,
                        "rounds": ROUNDS,
                        "iters_per_round": STAGE_ITERS,
                        "cluster": f"{N_WORKERS} pinned workers x "
                                   f"{CORES_PER_WORKER} cores",
                        "small": small,
                        "big": big,
                        "scaling_efficiency": round(
                            small["wall_sec"] / (ratio * big["wall_sec"]), 3
                        ),
                    }
                )
            )
            return

        def best(c: int) -> dict:
            rs = runs[c]
            return {
                "executors": rs[0]["executors"],
                "cores": c,
                "docs": rs[0]["docs"],
                "spans": rs[0]["spans"],
                "wall_sec": min(r["wall_sec"] for r in rs),
                "kernel_cpu_sec": min(r["kernel_cpu_sec"] for r in rs),
                "byte_wall_sec": min(r["byte_wall_sec"] for r in rs),
                "docs_per_sec": round(
                    rs[0]["docs"] / min(r["wall_sec"] for r in rs), 1
                ),
                "all_walls": sorted(r["wall_sec"] for r in rs),
            }

        small, big = best(4), best(16)
        ratio = big["cores"] / small["cores"]
        print(
            json.dumps(
                {
                    "metric": "standalone_cluster_pair",
                    "sf": SF,
                    "tile": TILE,
                    "partitions": PARTS,
                    "rounds": ROUNDS,
                    "cluster": f"{N_WORKERS} pinned workers x "
                               f"{CORES_PER_WORKER} cores",
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
                            small["byte_wall_sec"]
                            / (ratio * big["byte_wall_sec"]),
                            3,
                        ),
                    },
                    "runs": {str(c): runs[c] for c in levels},
                }
            )
        )
    finally:
        stop_cluster(procs)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
