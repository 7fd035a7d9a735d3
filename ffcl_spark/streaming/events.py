"""Structured Streaming rollups over event streams.

The reference has no streaming at all (SURVEY.md §2.10); the engine's
batch jobs checkpoint/resume via ``plans.checkpoint``. This module is
the streaming face of the same rollup operators: tumbling-window
aggregations with watermarked late-data handling, so an events feed
(or a file-drop directory of parquet) maintains the identical
``events_hourly``-style result incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-drop source: any parquet file landing under ``path`` is
    consumed exactly once (the streaming analogue of the batch scan)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type: count + integer-exact
    value sum (cents). The watermark bounds state: windows older than
    the watermark finalize and evict — the knob that keeps state O(1)
    per key on an unbounded stream."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(rollup: DataFrame, query_name: str = "events_rollup"):
    """Drain everything currently available into a memory sink (used by
    tests; a production job would writeStream to Iceberg/parquet with a
    checkpointLocation instead)."""
    q = (
        rollup.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
