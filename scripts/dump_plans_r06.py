"""Dump .explain("formatted") for every bench stage → plans/r06/.

Usage: python scripts/dump_plans_r06.py <suffix>   (suffix: before|after)

Mirrors bench.py's construction exactly (same inputs, same cfg) but
builds the DataFrames lazily and writes their formatted plans instead
of timing them. Guide §1: capture plan shape (Exchange count, join
strategy, PushedFilters, Python-eval nodes) before and after.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ffcl_spark import EngineConfig, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
K = 5
RADIUS = 0.25
TILE_SIDE = 6.0
SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def main() -> None:
    from ffcl_spark.operators import dedup as DD
    from ffcl_spark.operators import similarity as SIM
    from ffcl_spark.operators import tiles as TL
    from ffcl_spark.operators.knn_kernel import knn_join_grid, knn_resolution
    from ffcl_spark.operators.search import radius_join
    from ffcl_spark.sources.docs import synth_docs
    from ffcl_spark.sources.points import media_points, with_cell

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(
        app_name="ffcl_spark_plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    cfg0 = EngineConfig()

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid"))
        .distinct()
    )
    docs = synth_docs(li, "pid", None).persist()
    n_docs = docs.count()

    def dump(name: str, df) -> None:
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(plan)
        print(f"dumped {name} ({SUFFIX})")

    pts = with_cell(media_points(docs), knn_resolution(2 * n_docs, K, cfg0))
    dump("extract_index", pts)
    pts = pts.persist()
    n_pts = pts.count()
    cfg = knn_resolution(n_pts, K, cfg0)
    pts_xy = pts.select("id", "x", "y")

    dump("knn_join", knn_join_grid(pts_xy, pts_xy, K, cfg))

    tiles = TL.grid_tiles(spark, cfg, side=TILE_SIDE)
    dump("pip_tiles", TL.pip_join(pts_xy, tiles, cfg))

    dump("radius_join", radius_join(pts_xy, pts_xy, RADIUS, cfg))

    from ffcl_spark.operators.geo import (
        geo_nearest_tile,
        nearest_tile_locals,
        sphere_tiles,
    )

    geo_pts = pts.select(
        "id", (F.col("x") * 3).alias("lat"), (F.col("y") * 6).alias("lon")
    )
    locs = nearest_tile_locals(sphere_tiles(spark))
    dump("geo_tile", geo_nearest_tile(geo_pts, None, tile_locals=locs))

    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dump("minhash_dedup", DD.minhash_dedup_pairs(documents, 0.05))

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") % 10 == 0)
    cents = SIM.train_ivf_centroids(emb, 16)
    dump("embed_ivf", SIM.ivf_topk(emb, qs, 10, cents, n_probe=4))
    dump("embed_lsh", SIM.lsh_neardup_pairs(emb, 0.9, dims=64))

    from ffcl_spark.operators.search_nd import knn_join_nd_blocked
    from ffcl_spark.sources.vectors import synth_features

    keys = li.select(F.col("pid")).where(F.col("pid") % 3 == 0)
    hi_refs = synth_features(keys, "pid", 64)
    hi_qs = hi_refs.where(F.col("id") % 100 == 0)
    dump(
        "knn_embed_blocked",
        knn_join_nd_blocked(hi_qs, hi_refs, 10, precise=False),
    )

    spark.stop()


if __name__ == "__main__":
    main()
