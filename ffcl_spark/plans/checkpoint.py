"""Chunked checkpoint / idempotent resume with per-chunk lineage.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The reference has no notion of this (single-process,
in-memory); the engine implements it as deterministic job *chunks*:

- the input is split into ``n_chunks`` disjoint chunks by a
  deterministic key expression (default: cell id mod n_chunks — cells
  are the engine's partitioning unit, so a chunk is a cell *set*);
- each chunk runs the operator independently and appends its output to
  the sink (``parquet`` partitioned by chunk — same layout an Iceberg
  partitioned write would produce);
- a lineage row (job_id, chunk, rows_in, rows_out, wall_ms, status,
  finished_at) is appended to the checkpoint table *after* the chunk's
  output commit;
- resume = anti-join: chunks present in the checkpoint table with
  status='done' are skipped, so a re-run after failure is idempotent
  (exactly-once per chunk).

At cluster scale the chunk is the unit of restart (a few thousand
cells each), not a Spark task — Spark's own task retry handles
finer-grained failure.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ffcl_spark.plans.cache import release

CKPT_SCHEMA = "job_id string, chunk int, rows_in long, rows_out long, wall_ms long, status string, finished_at string"


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — correct on
    HDFS/S3/anything Spark can read, where a driver-local
    ``os.path.exists`` would always be False and silently defeat
    resume (exactly-once-per-chunk contract)."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def _done_chunks(spark: SparkSession, ckpt_dir: str, job_id: str) -> set[int]:
    if not _path_exists(spark, ckpt_dir):
        return set()
    ck = spark.read.schema(CKPT_SCHEMA).parquet(ckpt_dir)
    rows = ck.where(
        (F.col("job_id") == job_id) & (F.col("status") == "done")
    ).select("chunk").collect()
    return {r["chunk"] for r in rows}


def run_checkpointed(
    spark: SparkSession,
    inputs: DataFrame,
    op: Callable[[DataFrame], DataFrame],
    chunk_key,
    n_chunks: int,
    out_dir: str,
    ckpt_dir: str,
    job_id: str = "job",
    fail_after: int | None = None,
    iceberg_table: str | None = None,
) -> None:
    """Run ``op`` over deterministic chunks of ``inputs`` with
    checkpointed resume.

    ``chunk_key``: a Column producing a non-negative long (e.g. the
    cell id); chunk = key % n_chunks. ``fail_after``: test hook —
    raise after N chunks to simulate a mid-job crash.

    ``iceberg_table``: catalog-backed sink flag (``plans.iceberg_sink``)
    — when set AND the Iceberg runtime is on the classpath, chunk
    outputs commit via snapshot-atomic dynamic partition overwrite and
    lineage via an Iceberg table; ``out_dir``/``ckpt_dir`` are unused
    on that path. Without the flag (or without the runtime) behavior is
    byte-identical to before: parquet dirs in Iceberg-compatible
    layout.
    """
    use_iceberg = False
    if iceberg_table is not None:
        from ffcl_spark.plans import iceberg_sink as ice

        if not ice.iceberg_available(spark):
            raise RuntimeError(
                "iceberg_table was passed but the Iceberg Spark runtime is "
                "not on the classpath — add the iceberg-spark-runtime jar "
                "and a catalog config, or drop the flag for parquet layout"
            )
        use_iceberg = True
    chunked = inputs.withColumn("_chunk", F.pmod(chunk_key, F.lit(n_chunks)).cast("int"))
    done = (
        ice.done_chunks(spark, iceberg_table, job_id)
        if use_iceberg
        else _done_chunks(spark, ckpt_dir, job_id)
    )
    ran = 0
    for chunk in range(n_chunks):
        if chunk in done:
            continue
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError(f"simulated failure after {ran} chunks")
        t0 = time.time()
        part = chunked.where(F.col("_chunk") == chunk).drop("_chunk")
        rows_in = part.count()
        result = op(part)
        if use_iceberg:
            ice.write_chunk(spark, result, iceberg_table, chunk)
        else:
            out_path = os.path.join(out_dir, f"chunk={chunk}")
            result.write.mode("overwrite").parquet(out_path)
        # operators with a cache hand-off plan (plans.cache) leave their
        # kernel intermediates persisted for the caller's action — the
        # write above was that action, so drop them before the next
        # chunk (iterative callers must not accumulate cached
        # partitions; round-3 ADVICE)
        release(result)
        rows_out = (
            spark.table(iceberg_table).where(F.col("_chunk") == chunk).count()
            if use_iceberg
            else spark.read.parquet(out_path).count()
        )
        lineage = spark.createDataFrame(
            [
                (
                    job_id,
                    chunk,
                    rows_in,
                    rows_out,
                    int((time.time() - t0) * 1000),
                    "done",
                    time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                )
            ],
            CKPT_SCHEMA,
        )
        # marker-last on both paths: data commit, then lineage row
        if use_iceberg:
            ice.append_lineage(spark, lineage, iceberg_table)
        else:
            lineage.write.mode("append").parquet(ckpt_dir)
        ran += 1


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "chunk=*"))


def job_metrics(spark: SparkSession, ckpt_dir: str, job_id: str) -> DataFrame:
    ck = spark.read.schema(CKPT_SCHEMA).parquet(ckpt_dir)
    return ck.where(F.col("job_id") == job_id)
