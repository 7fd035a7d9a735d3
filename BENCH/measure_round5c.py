"""Round-5 continuation (second tail): geodesic clustering + nearest-tile
throughput at sf0.1 inputs (addendum measurements, OUTSIDE bench.py so
BENCH_rN.json stays stage-comparable across rounds). Best-of-N with
per-rep cache release; prints one JSON line per op plus raw reps.

    python BENCH/measure_round5c.py [reps]

The iterative ops (geo_mst / geo_hdbscan) run ONE rep on an xxhash64
1/64 subset (14,226 points): Borůvka is round-latency dominated in this
sandbox (each of the O(log n) rounds costs ~20 Spark jobs of fixed
latency), so wall time scales with rounds, not points — the same plan
at 1000 executors processes 1000× the points in the same rounds.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ffcl_spark import get_spark

SF = "/root/testdata/sf0.1"
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def timed(spark, name, fn, reps=REPS):
    outs = []
    for _ in range(reps):
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
    spark = get_spark(app_name="measure_r5c", master="local[32]", shuffle_partitions=32)
    from ffcl_spark.sources.docs import synth_docs
    from ffcl_spark.sources.points import media_points

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid"))
        .distinct()
    )
    pts = media_points(synth_docs(li, "pid", None)).select("id", "x", "y")
    geo = pts.select(
        "id", (F.col("x") * 3).alias("lat"), (F.col("y") * 6).alias("lon")
    ).cache()
    n_pts = geo.count()
    print(f"# points: {n_pts}", flush=True)

    from ffcl_spark.operators.geo import (
        geo_closest_pair,
        geo_hdbscan,
        geo_mst,
        geo_nearest_tile,
        sphere_tiles,
    )

    tiles = sphere_tiles(spark)
    timed(
        spark,
        "geo_nearest_tile_12",
        lambda: geo_nearest_tile(geo, tiles).count(),
    )

    a = geo.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 0)
    b = geo.where(F.pmod(F.xxhash64("id"), F.lit(2)) == 1)
    timed(
        spark,
        "geo_closest_pair_k5_halves",
        lambda: geo_closest_pair(a, b, k=5).count(),
    )

    sub = geo.where(F.pmod(F.xxhash64("id"), F.lit(64)) == 0).cache()
    n_sub = sub.count()
    print(f"# mst subset: {n_sub}", flush=True)
    timed(spark, "geo_mst_14k", lambda: geo_mst(sub).count(), reps=1)
    timed(
        spark,
        "geo_hdbscan_14k_mcs50",
        lambda: geo_hdbscan(
            sub, min_cluster_size=50, allow_single_cluster=False
        ).count(),
        reps=1,
    )
    spark.stop()


if __name__ == "__main__":
    main()
