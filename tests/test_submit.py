"""End-to-end `spark-submit --py-files` integration: the north-rule ship
path. Builds the dist zip, submits the flagship job to a 2-executor
local-cluster (separate executor JVMs — imports must resolve from the zip,
not the repo checkout), and checks the result count against the in-process
engine."""

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_py_files(spark, tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import package as pkg

    zip_path = pkg.build()
    sf_dir = os.path.join(ROOT, "data", "synth", "sf0.001")

    from gdal_common_python_spark.operators import spatial_join as sj

    docs = spark.read.parquet(os.path.join(sf_dir, "documents_spans.parquet"))
    zones = spark.read.parquet(os.path.join(sf_dir, "zones.parquet"))
    expected = sj.spatial_join_points(spark, docs, zones).count()

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.executor.memory=2g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(ROOT, "scripts", "submit_job.py"),
            sf_dir,
            str(tmp_path / "out"),
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),  # NOT the repo root: imports must come from the zip
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_RESULT")]
    assert lines, f"stdout: {out.stdout[-2000:]}\nstderr: {out.stderr[-2000:]}"
    rows = int(lines[0].split("rows=")[1])
    assert rows == expected and rows > 0
