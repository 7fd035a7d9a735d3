"""Deployment-path evidence: spark-submit --py-files (north rule).

Builds the reproducible ``ffcl_spark.zip`` artifact and runs a real
``spark-submit --py-files`` job from a directory OUTSIDE the repo with
the repo stripped from PYTHONPATH — so every ``import ffcl_spark.*``
can only resolve from the shipped archive, exactly as it would on a
multi-executor cluster. The job runs a small end-to-end slice (grid
kNN join over synthesized points) and prints a checkable token.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys
from pyspark.sql import SparkSession, functions as F

spark = SparkSession.builder.getOrCreate()
from ffcl_spark import EngineConfig
from ffcl_spark.operators.search import knn_join
from ffcl_spark.operators.geo import geo_radius_join

pts = spark.range(200).select(
    F.col("id"),
    (F.pmod(F.col("id") * 2654435761 + 1013904223, 60000) / 1000 - 30).alias("x"),
    (F.pmod(F.col("id") * 2246822519 + 3266489917, 60000) / 1000 - 30).alias("y"),
)
out = knn_join(pts, pts, 3, EngineConfig(resolution=3))
n = out.count()
geo = pts.select("id", (F.col("x") * 3).alias("lat"), (F.col("y") * 6).alias("lon"))
m = geo_radius_join(geo, geo, 500_000.0).count()
assert n == 600, n
assert m >= 200, m  # at least the self-pairs
print(f"SUBMIT_OK knn={n} geo={m}")
spark.stop()
"""


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_pyfiles_zip", os.path.join(REPO, "scripts", "make_pyfiles_zip.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    zip_path = str(tmp_path / "ffcl_spark.zip")
    members = mod.build(zip_path)
    assert any(m.endswith("operators/geo.py") for m in members)

    job_path = tmp_path / "job.py"
    job_path.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[8]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(job_path),
        ],
        cwd=str(tmp_path),  # not the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SUBMIT_OK knn=600" in proc.stdout, proc.stdout[-2000:]
