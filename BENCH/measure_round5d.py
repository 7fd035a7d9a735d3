"""Round-5 continuation (third tail): geodesic index-at-rest probes,
zonal statistics, and IDW interpolation throughput at sf0.1 inputs
(addendum measurements, OUTSIDE bench.py so BENCH_rN.json stays
stage-comparable across rounds). Best-of-N with per-rep cache release;
prints one JSON line per op plus raw reps.

    python BENCH/measure_round5d.py [reps]
"""

from __future__ import annotations

import json
import sys
import tempfile
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
    spark = get_spark(
        app_name="measure_r5d", master="local[32]", shuffle_partitions=32
    )
    from ffcl_spark.operators.geo import geo_zonal_stats, sphere_tiles
    from ffcl_spark.operators.interpolate import geo_idw
    from ffcl_spark.plans.cache import release
    from ffcl_spark.sources.docs import synth_docs
    from ffcl_spark.sources.geo_index import (
        geo_knn_probe,
        geo_radius_probe,
        write_geo_index,
    )
    from ffcl_spark.sources.points import media_points

    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid"))
        .distinct()
    )
    pts = media_points(synth_docs(li, "pid", None)).select(
        "id",
        (F.col("x") * 3).alias("lat"),
        (F.col("y") * 6).alias("lon"),
    )
    pts = pts.persist()
    n = pts.count()
    print(json.dumps({"op": "input", "rows": n}), flush=True)

    # geodesic index at rest: one-shot build (one shuffle, one file per
    # cell), then partition-pruned probes
    idx = tempfile.mkdtemp(prefix="r5d_geoidx_")
    t0 = time.time()
    write_geo_index(pts, idx)  # density-auto band height (~9.5° here)
    print(
        json.dumps({"op": "write_geo_index", "best_sec": round(time.time() - t0, 2),
                    "rows": n}),
        flush=True,
    )
    timed(
        spark,
        "geo_radius_probe_100km",
        lambda: geo_radius_probe(spark, idx, 10.0, 20.0, 100_000.0).count(),
    )
    timed(
        spark,
        "geo_knn_probe_k10",
        lambda: geo_knn_probe(spark, idx, 10.0, 20.0, 10).count(),
    )

    # zonal statistics over the 12 spherical fixture tiles: carry-through
    # PIP pass + |tiles|-row partial agg (no join-back shuffle)
    vals = pts.withColumn("v", F.pmod(F.xxhash64("id"), F.lit(1000)))
    tiles = sphere_tiles(spark)
    timed(
        spark,
        "geo_zonal_stats",
        lambda: geo_zonal_stats(vals, tiles, values=("v",)).count(),
    )

    # geodesic IDW at a 1/64 query subset (kNN join dominates; the fold
    # itself is one map-side aggregate)
    qs = pts.where(F.pmod(F.xxhash64("id"), F.lit(64)) == 0)
    nq = qs.count()
    samples = pts.withColumn("val", F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double"))

    def run_idw():
        out = geo_idw(qs, samples, 5)
        c = out.count()
        release(out)
        return c

    timed(spark, f"geo_idw_k5_q{nq}", run_idw)
    spark.stop()


if __name__ == "__main__":
    main()
