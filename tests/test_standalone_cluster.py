"""Multi-EXECUTOR smoke test (north rule: the job ships via
``spark-submit --py-files`` to a multi-executor cluster): spin a real
standalone master + 2 worker JVMs, submit the checkpointed job so it
runs on 2 separate executor processes, and check the output relation
matches the local run span-for-span. Heavier than the local[4]
spark-submit test (test_spark_submit_job) — marked slow."""

import json
import os
import shutil
import signal
import subprocess
import sys
import time
import urllib.request
import zipfile

import pytest

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER = "spark://127.0.0.1:7177"
REST = "http://127.0.0.1:8190/json/"


def _spark_class(*args, log):
    return subprocess.Popen(
        [os.path.join(SPARK_HOME, "bin", "spark-class"), *args],
        stdout=open(log, "w"),
        stderr=subprocess.STDOUT,
        env={**os.environ, "SPARK_LOG_DIR": os.path.dirname(log)},
        start_new_session=True,
    )


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    if not os.path.exists(os.path.join(SPARK_HOME, "bin", "spark-class")):
        pytest.skip("no spark distribution")
    tmp = str(tmp_path_factory.mktemp("sa"))
    procs = [
        _spark_class(
            "org.apache.spark.deploy.master.Master",
            "-h", "127.0.0.1", "-p", "7177", "--webui-port", "8190",
            log=os.path.join(tmp, "master.log"),
        )
    ]
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                urllib.request.urlopen(REST, timeout=2)
                break
            except Exception:
                time.sleep(1)
        else:
            raise RuntimeError("master did not come up")
        for i in range(2):
            procs.append(
                _spark_class(
                    "org.apache.spark.deploy.worker.Worker", MASTER,
                    "--cores", "2", "--memory", "4g",
                    "--work-dir", os.path.join(tmp, f"work{i}"),
                    "--webui-port", str(8191 + i),
                    log=os.path.join(tmp, f"worker{i}.log"),
                )
            )
        deadline = time.time() + 60
        while time.time() < deadline:
            st = json.load(urllib.request.urlopen(REST, timeout=2))
            if st["aliveworkers"] == 2:
                break
            time.sleep(1)
        else:
            raise RuntimeError("workers did not register")
        yield tmp
    finally:
        for p in reversed(procs):
            try:
                os.killpg(p.pid, signal.SIGTERM)
            except Exception:
                pass
        time.sleep(1)
        for p in reversed(procs):
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except Exception:
                pass


@pytest.mark.slow
def test_job_on_two_executors(cluster, spark, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zp = tmp_path / "pdf2ocr_spark.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(repo, "pdf2ocr_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            os.path.join(SPARK_HOME, "bin", "spark-submit"),
            "--master", MASTER,
            "--conf", "spark.cores.max=4",       # 2 executors x 2 cores
            "--conf", "spark.executor.cores=2",
            "--conf", "spark.executor.memory=2g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", f"spark.pyspark.python={sys.executable}",
            "--py-files", str(zp),
            os.path.join(repo, "jobs", "run_extract.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(out),
            "--partitions", "4",
            "--no-resume", "--quiet",
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["result"]["processed"] == 4
    assert res["summary"]["files_processed"] == 500

    # ran on TWO executors (one per worker): both worker dirs hosted one
    work_dirs = [
        d for d in os.listdir(cluster)
        if d.startswith("work") and os.path.isdir(os.path.join(cluster, d))
    ]
    hosted = [
        d for d in work_dirs
        if any(os.scandir(os.path.join(cluster, d)))
    ]
    assert len(hosted) == 2, f"expected both workers to host an executor: {hosted}"

    # span-for-span parity with the in-process local pipeline
    from pdf2ocr_spark.operators.checkpoint import read_spans
    from pdf2ocr_spark.pipeline import run_pipeline

    got = read_spans(spark, str(out)).toPandas()
    want = run_pipeline(spark, "/root/testdata/sf0.001", num_partitions=4).toPandas()
    key = ["doc_id", "kind", "offset"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got[want.columns], want)
