"""Optional Iceberg-catalog sink for the chunked checkpoint runner.

SURVEY §7 P0 accepts parquet-in-Iceberg-layout as the sandbox fallback
(no Iceberg runtime ships in this container); this module is the
catalog-backed path behind a flag (round-3 VERDICT task #8): when the
Spark session has the Iceberg runtime on its classpath AND the caller
passes an explicit table identifier, chunk outputs and lineage commit
through the catalog instead of raw parquet directories.

Exactly-once per chunk maps onto Iceberg primitives directly:

- chunk output: ``writeTo(table).overwritePartitions()`` with the
  ``_chunk`` partition column — a redo after a crash replaces exactly
  its own partition in one snapshot commit (dynamic partition
  overwrite), the atomic version of the parquet path's
  ``chunk=N`` directory overwrite;
- lineage: an append-only ``<table>_lineage`` Iceberg table written
  AFTER the data commit (marker-last discipline, same as the parquet
  path) — resume reads chunks with status='done' from it;
- snapshots give time travel for free: a bad chunk can be rolled back
  with the catalog's snapshot API without touching the runner.

Nothing here executes unless ``iceberg_available()`` is true and a
table identifier is passed — behavior without the flag is unchanged
(the conditional test skips in environments without the runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _table_exists(spark: SparkSession, table: str) -> bool:
    try:
        return spark.catalog.tableExists(table)
    except Exception:
        return False


def write_chunk(spark: SparkSession, result: DataFrame, table: str, chunk: int) -> None:
    """Commit one chunk's output to ``table`` (identifier like
    ``catalog.db.name``), creating the ``_chunk``-partitioned table on
    first write. Overwrite semantics per partition → idempotent redo."""
    out = result.withColumn("_chunk", F.lit(chunk).cast("int"))
    if not _table_exists(spark, table):
        out.writeTo(table).partitionedBy("_chunk").create()
        return
    out.writeTo(table).overwritePartitions()


def append_lineage(spark: SparkSession, lineage: DataFrame, table: str) -> None:
    lt = f"{table}_lineage"
    if not _table_exists(spark, lt):
        lineage.writeTo(lt).create()
        return
    lineage.writeTo(lt).append()


def done_chunks(spark: SparkSession, table: str, job_id: str) -> set[int]:
    lt = f"{table}_lineage"
    if not _table_exists(spark, lt):
        return set()
    rows = (
        spark.table(lt)
        .where((F.col("job_id") == job_id) & (F.col("status") == "done"))
        .select("chunk")
        .collect()
    )
    return {r["chunk"] for r in rows}


def read_output(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table).drop("_chunk")
