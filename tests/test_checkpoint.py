import os

import pytest
from pyspark.sql import functions as F

from ffcl_spark.plans import checkpoint as CK
from ffcl_spark.sources import points as P
from ffcl_spark.datagen import docs_from_points


@pytest.fixture
def inp(spark, cfg):
    docs = docs_from_points(spark, "blobs", 300)
    return P.with_cell(P.media_points(docs), cfg)


def _op(part):
    return part.groupBy("cell").agg(F.count(F.lit(1)).alias("count"))


def test_resume_after_failure_is_idempotent(spark, cfg, inp, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(RuntimeError, match="simulated failure"):
        CK.run_checkpointed(spark, inp, _op, F.col("cell"), 5, out, ckpt, "j", fail_after=2)
    done_before = CK.job_metrics(spark, ckpt, "j").count()
    assert done_before == 2
    CK.run_checkpointed(spark, inp, _op, F.col("cell"), 5, out, ckpt, "j")
    # one lineage row per chunk, no duplicates from the resume
    metrics = CK.job_metrics(spark, ckpt, "j").toPandas()
    assert sorted(metrics.chunk) == [0, 1, 2, 3, 4]
    # output equals the one-shot run
    resumed = CK.read_output(spark, out).agg(F.sum("count")).collect()[0][0]
    assert resumed == inp.count()


def test_rerun_skips_everything(spark, cfg, inp, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    CK.run_checkpointed(spark, inp, _op, F.col("cell"), 3, out, ckpt, "j")
    t1 = CK.job_metrics(spark, ckpt, "j").toPandas().finished_at.tolist()
    CK.run_checkpointed(spark, inp, _op, F.col("cell"), 3, out, ckpt, "j")
    t2 = CK.job_metrics(spark, ckpt, "j").toPandas().finished_at.tolist()
    assert sorted(t1) == sorted(t2)  # nothing re-ran


def test_lineage_metrics_complete(spark, cfg, inp, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    CK.run_checkpointed(spark, inp, _op, F.col("cell"), 4, out, ckpt, "j")
    m = CK.job_metrics(spark, ckpt, "j").toPandas()
    assert (m.status == "done").all()
    assert (m.wall_ms >= 0).all()
    assert m.rows_in.sum() == inp.count()
