"""Structured Streaming rollup == batch rollup on the same files."""

import os
import shutil

from pyspark.sql import functions as F

from ffcl_spark.streaming.events import hourly_rollup, read_events_stream, run_available_now


def test_stream_rollup_matches_batch(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # simulate a file-drop directory with several files
    drop = str(tmp_path / "drop")
    src.repartition(4).write.parquet(drop)

    stream = read_events_stream(spark, drop)
    assert stream.isStreaming
    run_available_now(hourly_rollup(stream), "rollup_t")
    got = spark.sql("select * from rollup_t").toPandas()

    cents = F.round(F.col("value") * 100).cast("long")
    exp = (
        src.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .toPandas()
    )
    key = ["hour", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert g[key + ["n", "sum_value"]].equals(e[key + ["n", "sum_value"]])
