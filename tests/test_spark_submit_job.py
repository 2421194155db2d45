"""spark-submit packaging smoke test (north rule: the job must ship via
``spark-submit --py-files``): zip the package, launch the job in a separate
JVM, check its JSON summary and output."""

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

import pytest


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = tmp_path / "pdf2ocr_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(repo, "pdf2ocr_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            os.path.join(repo, "jobs", "run_extract.py"),
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(out_dir),
            "--partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # NOT the repo root: the zip must provide the pkg
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["result"]["processed"] == 4
    assert res["summary"]["partitions_succeeded"] == 4
    assert res["summary"]["files_processed"] == 500
