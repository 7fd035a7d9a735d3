"""Idempotent epoch-partitioned writes for the at-rest indexes.

All three index stores (points, ANN codes, postings) lay data out as
``<key>=.../epoch=<n>`` and append new batches with DYNAMIC partition
overwrite: a replayed epoch rewrites exactly its own subpartitions and
nothing else — the same discipline as ``streaming.dedup``'s
admitted-corpus stores, shared here so the three writers cannot
drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_epoch_partitions(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Write ``df`` partitioned by ``partition_cols`` (the last of
    which is conventionally ``epoch``), overwriting ONLY the
    partitions present in ``df`` (dynamic mode), then restore the
    session's previous overwrite mode."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set(key, prev)


def compact_epochs(spark, store_path: str, *partition_cols: str) -> None:
    """Collapse every epoch of an at-rest store into ``epoch=0`` —
    the small-files remedy after many appends (each append writes its
    own files per touched partition; probes read them all). One job
    rewrites the store partitioned by ``partition_cols`` + epoch=0,
    then swaps directories. The local swap is not atomic (documented:
    in production these stores are Iceberg tables and compaction is a
    rewrite_data_files snapshot commit); readers must not race it."""
    import os
    import shutil

    from pyspark.sql import functions as F

    local = store_path.replace("file:", "")
    tmp = f"{local}__compacting"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    # repartition on the partition cols so the rewrite emits exactly
    # one file per partition value — otherwise every rewrite task
    # would write a file per value it touches and compaction would
    # reintroduce the small files it exists to remove
    df = spark.read.parquet(store_path).drop("epoch")
    if partition_cols:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    (
        df.withColumn("epoch", F.lit(0))
        .write.mode("overwrite")
        .partitionBy(*partition_cols, "epoch")
        .parquet(tmp)
    )
    old = f"{local}__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(local, old)
    os.rename(tmp, local)
    shutil.rmtree(old)
