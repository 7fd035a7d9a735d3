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


def test_mst_round_checkpoint_resume(spark, tmp_path):
    """Iterative-round resume: a run killed after 1 committed round,
    resumed with the same ckpt_dir, produces the identical MST as an
    uninterrupted run (every round is deterministic)."""
    import numpy as np

    from ffcl_spark import EngineConfig
    from ffcl_spark.operators.boruvka import minimum_spanning_tree, mst_edges_local
    from tests.conftest import points_pdf

    pdf = points_pdf("blobs", 150)
    df = spark.createDataFrame(pdf)
    cfg = EngineConfig(resolution=3)
    ck = str(tmp_path / "mst_ck")

    partial = minimum_spanning_tree(df, cfg, ckpt_dir=ck, stop_after_rounds=1)
    n_partial = partial.count()
    assert 0 < n_partial < len(pdf) - 1  # committed but incomplete

    resumed = mst_edges_local(minimum_spanning_tree(df, cfg, ckpt_dir=ck))
    plain = mst_edges_local(minimum_spanning_tree(df, cfg))
    key = lambda es: sorted((min(a, b), max(a, b)) for a, b, _ in es)
    assert len(resumed) == len(pdf) - 1
    assert key(resumed) == key(plain)
    assert abs(sum(w for *_, w in resumed) - sum(w for *_, w in plain)) < 1e-9
    # idempotent: a third run with the complete checkpoint reruns no
    # rounds and returns the same edges straight from the state
    again = mst_edges_local(minimum_spanning_tree(df, cfg, ckpt_dir=ck))
    assert key(again) == key(resumed)


def test_iceberg_flag_without_runtime_raises(spark, cfg, inp, tmp_path):
    """Passing iceberg_table in an environment without the Iceberg
    runtime must fail loudly before any work, never silently fall back."""
    from ffcl_spark.plans.iceberg_sink import iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present — covered by the catalog test")
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        CK.run_checkpointed(
            spark, inp, _op, F.col("cell"), 5,
            str(tmp_path / "out"), str(tmp_path / "ckpt"), "j",
            iceberg_table="ice.db.t",
        )


def test_iceberg_catalog_roundtrip(spark, cfg, inp):
    """Catalog-backed path: snapshot-atomic chunk overwrite + lineage
    table + resume. Runs only where the Iceberg runtime + a configured
    catalog exist (skipped in this sandbox; SURVEY §7 P0 fallback)."""
    from ffcl_spark.plans import iceberg_sink as ice

    if not ice.iceberg_available(spark):
        pytest.skip("no Iceberg runtime in this environment")
    table = "ice.ffcl_test.chunks"
    CK.run_checkpointed(
        spark, inp, _op, F.col("cell"), 5, "", "", "j_ice", iceberg_table=table
    )
    out = ice.read_output(spark, table)
    assert out.agg(F.sum("count")).collect()[0][0] == inp.count()
    assert ice.done_chunks(spark, table, "j_ice") == {0, 1, 2, 3, 4}
