"""Round-5 continuation: new-operator throughput at sf0.1 (addendum
measurements, OUTSIDE bench.py so BENCH_rN.json stays stage-comparable
across rounds). Best-of-N with per-rep cache release; prints one JSON
line per op plus raw reps.

    python BENCH/measure_round5b.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ffcl_spark import EngineConfig, get_spark

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def timed(spark, name, fn):
    outs = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        outs.append((time.time() - t0, n))
    best = min(t for t, _ in outs)
    print(
        json.dumps(
            {
                "op": name,
                "best_sec": round(best, 2),
                "rows": outs[0][1],
                "raw_sec": [round(t, 2) for t, _ in outs],
            }
        ),
        flush=True,
    )


def main():
    spark = get_spark(app_name="measure_r5b", master="local[32]", shuffle_partitions=32)
    from ffcl_spark.sources.docs import synth_docs
    from ffcl_spark.sources.points import media_points

    # the same big deterministic point table bench.py measures on
    # (913,722 points at sf0.1 — the documents table is only 5k docs)
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid"))
        .distinct()
    )
    pts = media_points(synth_docs(li, "pid", None)).select("id", "x", "y").cache()
    n_pts = pts.count()
    print(f"# points: {n_pts}", flush=True)
    geo = pts.select(
        "id", (F.col("x") * 3).alias("lat"), (F.col("y") * 6).alias("lon")
    ).cache()
    geo.count()

    from ffcl_spark.operators.geo import geo_knn_join, geo_radius_join
    from ffcl_spark.operators.sketches import (
        count_min_table,
        heavy_hitters,
        quantiles,
    )
    from ffcl_spark.operators import tiles as TL

    timed(spark, "geo_radius_join_100km", lambda: geo_radius_join(geo, geo, 100_000.0).count())
    timed(spark, "geo_knn_join_k5", lambda: geo_knn_join(geo, geo, 5).count())

    cfg = EngineConfig(resolution=4)
    big_tiles = TL.convex_tiles(spark, cfg, n_tiles=500, seed=3)
    timed(
        spark,
        "overlay_join_500x500",
        lambda: TL.overlay_join(big_tiles, big_tiles).count(),
    )
    timed(spark, "tile_measures_500", lambda: TL.tile_measures(big_tiles).count())

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # ×64 deterministic replication: the sf0.1 documents table is 5k
    # docs (~271k tokens) — the sketch paths need a token stream big
    # enough that aggregation, not job launch, dominates
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).crossJoin(spark.range(64).select(F.lit(1).alias("_m"))).select("tok").cache()
    n_toks = toks.count()
    print(f"# tokens: {n_toks}", flush=True)
    timed(spark, "heavy_hitters_tokens_1pct", lambda: heavy_hitters(toks, "tok", 0.01).count())
    timed(
        spark,
        "count_min_tokens_w4096_d4",
        lambda: count_min_table(toks, "tok", 4096, 4).count(),
    )
    timed(
        spark,
        "quantiles_nchars",
        lambda: quantiles(docs, "n_chars", [0.01, 0.5, 0.99]).count(),
    )

    from ffcl_spark.operators.temporal import trajectory_stats

    # events carry (user_id, ts) but no coordinates; derive a
    # deterministic planar position per event from its id (Knuth
    # multiplicative hash → [0, 1) per axis) so the trajectory path
    # scan measures the real window+agg plan on 100k hops
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id",
        "ts",
        ((F.col("event_id") * 2654435761) % 1_000_003 / 1_000_003.0).alias("x"),
        ((F.col("event_id") * 2246822519) % 1_000_033 / 1_000_033.0).alias("y"),
    )
    timed(spark, "trajectory_stats_events", lambda: trajectory_stats(ev).count())
    spark.stop()


if __name__ == "__main__":
    main()
