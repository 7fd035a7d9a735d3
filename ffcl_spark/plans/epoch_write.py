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
