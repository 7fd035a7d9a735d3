"""Benchmark harness — headline engine queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline = the north_star pipeline over the lineitem-derived
interleaved-doc table (the largest table at each sf): synthesis →
media-span extraction → cell index → PIP tile assignment + kNN join.
Extra fields report docs/sec and join-output rows/sec (the
BASELINE.json metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ffcl_spark import EngineConfig, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# deterministic input multiplier (scaling runs use MULT>1 so per-core
# work dominates fixed overheads) and optional stage subset
MULT = int(os.environ.get("SPARK_GRAFT_MULT", "1"))
STAGES = os.environ.get("SPARK_GRAFT_STAGES", "all")
# repetitions per stage, minimum reported: this sandbox shows 3-20x
# run-to-run host noise on unchanged code (BENCH/BASELINE.md round-2
# note) — a single sample is not a measurement here
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
K = 5
RADIUS = 0.25
TILE_SIDE = 6.0


def _enabled(stage: str) -> bool:
    return STAGES == "all" or stage in STAGES.split(",")


def _timed(fn, clear_cache_with=None):
    """min-of-REPS wall time and the (stable) row count.

    ``clear_cache_with``: SparkSession to clearCache() after each rep —
    required for stages whose operators persist() internally, because
    Spark's CacheManager matches by logical plan and a later rep of the
    identical pipeline would otherwise measure a cache hit, not the
    operator. Only safe for stages that don't share a cached input.
    """
    best, rows = None, None
    for _ in range(REPS):
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if clear_cache_with is not None:
            clear_cache_with.catalog.clearCache()
    return best, rows


def main() -> None:
    from ffcl_spark.operators import dedup as DD
    from ffcl_spark.operators import similarity as SIM
    from ffcl_spark.operators import tiles as TL
    from ffcl_spark.operators.knn_kernel import knn_join_grid, knn_resolution
    from ffcl_spark.operators.search import radius_join
    from ffcl_spark.sources.docs import synth_docs
    from ffcl_spark.sources.points import media_points, with_cell

    spark = get_spark(
        app_name="ffcl_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select((F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("pid"))
        .distinct()
    )
    if MULT > 1:
        li = li.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(MULT - 1)),
                    lambda j: F.col("pid") * MULT + j,
                )
            ).alias("pid")
        )
    docs = synth_docs(li, "pid", None).persist()
    n_docs = docs.count()
    cfg0 = EngineConfig()

    from ffcl_spark.plans.cache import release

    # warmup: exercise codegen + Arrow + Python-worker paths once so the
    # timed stages measure the engine, not JVM/worker cold start
    warm = media_points(synth_docs(li.limit(20_000), "pid", None)).select("id", "x", "y")
    warm = warm.persist()
    warm.count()
    wdf = knn_join_grid(warm, warm, K, knn_resolution(40_000, K, cfg0))
    wdf.count()
    release(wdf)
    TL.pip_join(warm, TL.grid_tiles(spark, cfg0), cfg0).count()
    warm.unpersist()

    # --- q1: extract + cell index (the scan→index stage) ---
    # (not repeated: the persist would make rep 2 measure the cache)
    t0 = time.time()
    pts = with_cell(media_points(docs), knn_resolution(2 * n_docs, K, cfg0))
    pts = pts.persist()
    n_pts = pts.count()
    timings["extract_index"] = time.time() - t0

    cfg = knn_resolution(n_pts, K, cfg0)
    pts_xy = pts.select("id", "x", "y")

    # --- q2: kNN self-join k=5 (headline join) ---
    def run_knn():
        # count + release inside the timed region: the operator keeps
        # its kernel output persisted for the single consumer (the
        # r1-floor plan); releasing per rep makes rep 2 measure the
        # operator, not a CacheManager hit on the identical plan
        df = knn_join_grid(pts_xy, pts_xy, K, cfg)
        n = df.count()
        release(df)
        return n

    timings["knn_join"], knn_rows = _timed(run_knn)
    extras["knn_rows_per_sec"] = knn_rows / timings["knn_join"]

    # --- q3: PIP tile assignment ---
    tiles = TL.grid_tiles(spark, cfg, side=TILE_SIDE)
    timings["pip_tiles"], pip_rows = _timed(
        lambda: TL.pip_join(pts_xy, tiles, cfg).count()
    )
    extras["pip_rows_per_sec"] = pip_rows / timings["pip_tiles"]

    # --- q4: radius join (strict < r) ---
    radius_rows = 0
    if _enabled("radius_join"):
        timings["radius_join"], radius_rows = _timed(
            lambda: radius_join(pts_xy, pts_xy, RADIUS, cfg).count()
        )
        extras["radius_rows_per_sec"] = radius_rows / timings["radius_join"]

    # --- q6b: geodesic nearest-tile assignment — the geospatial
    # tier's map-only headline: every point mapped to (lat, lon) and
    # assigned its nearest of 12 spherical tiles with the EXACT
    # great-circle boundary distance (0 inside); tile frames ride the
    # task closure, one Arrow pass, NO shuffle. Opt-in extra stage
    # `geo_radius` measures the spherical-grid radius join (one
    # equi-join on the cell key + codegen haversine) — its N→4N
    # scaling is recorded in BENCH/BASELINE.md.
    if _enabled("geo_tile"):
        from ffcl_spark.operators.geo import (
            geo_nearest_tile,
            nearest_tile_locals,
            sphere_tiles,
        )

        geo_pts = pts.select(
            "id", (F.col("x") * 3).alias("lat"), (F.col("y") * 6).alias("lon")
        )
        locs = nearest_tile_locals(sphere_tiles(spark))
        timings["geo_tile"], geo_rows = _timed(
            lambda: geo_nearest_tile(geo_pts, None, tile_locals=locs).count()
        )
        extras["geo_tile_rows_per_sec"] = geo_rows / timings["geo_tile"]
    if STAGES != "all" and _enabled("geo_radius"):
        from ffcl_spark.operators.geo import geo_radius_join

        geo_pts = pts.select(
            "id", (F.col("x") * 3).alias("lat"), (F.col("y") * 6).alias("lon")
        )
        timings["geo_radius"], geo_pairs = _timed(
            lambda: geo_radius_join(geo_pts, geo_pts, 100_000.0).count()
        )
        extras["geo_radius_rows_per_sec"] = geo_pairs / timings["geo_radius"]
    # opt-in: Viterbi map matching — every point treated as a ping of
    # one of ~n/200 entities (ts from the point id, deterministic),
    # matched against the 4-route fixture; one shuffle on the entity
    # key, per-entity exact arc distances + O(t·L) Viterbi in Arrow
    if STAGES != "all" and _enabled("map_match"):
        from ffcl_spark.operators.geo import (
            geo_map_match,
            polyline_locals,
            sphere_routes,
        )

        pings = pts.select(
            F.col("id").alias("pt"),
            (F.col("x") * 3).alias("lat"),
            (F.col("y") * 6).alias("lon"),
        ).select(
            F.pmod(F.xxhash64("pt"), F.lit(max(n_pts // 200, 1))).alias(
                "entity_id"
            ),
            F.xxhash64("pt", F.lit(1)).alias("ts"),
            "lat",
            "lon",
        )
        rl = polyline_locals(sphere_routes(spark))
        timings["map_match"], mm_rows = _timed(
            lambda: geo_map_match(pings, None, line_locals=rl).count()
        )
        extras["map_match_pings_per_sec"] = mm_rows / timings["map_match"]

    # spatial intermediates are no longer needed — drop cached blocks so
    # the text/embedding stages measure themselves, not GC pressure
    spark.catalog.clearCache()

    # --- q5: MinHash-LSH near-dup over documents ---
    if _enabled("minhash_dedup"):
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        timings["minhash_dedup"], _ = _timed(
            lambda: DD.minhash_dedup_pairs(documents, 0.05).count(),
            clear_cache_with=spark,
        )

    # opt-in: cross-corpus contamination — every 7th doc acts as the
    # benchmark set; its distinct shingles broadcast, the corpus side
    # is one scan + an O(#docs) agg (the decontamination pass shape)
    if STAGES != "all" and _enabled("contamination"):
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        d = F.col("doc_id").cast("long")
        timings["contamination"], cont_rows = _timed(
            lambda: DD.ngram_contamination(
                documents.where(d % 7 != 0), documents.where(d % 7 == 0)
            ).count(),
            clear_cache_with=spark,
        )
        extras["contamination_docs_per_sec"] = (
            cont_rows / timings["contamination"]
        )

    # --- q6: embedding similarity — SCALE paths are the headline
    # (IVF-bucketed top-k, SRP-LSH near-dup); the brute crossJoin is
    # opt-in as the oracle baseline, not the engine measurement ---
    if _enabled("embed_ivf"):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.where(F.col("vec_id") % 10 == 0)
        cents = SIM.train_ivf_centroids(emb, 16)
        timings["embed_ivf"], _ = _timed(
            lambda: SIM.ivf_topk(emb, qs, 10, cents, n_probe=4).count()
        )
    if _enabled("embed_lsh"):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        timings["embed_lsh"], _ = _timed(
            lambda: SIM.lsh_neardup_pairs(emb, 0.9, dims=64).count()
        )
    if STAGES != "all" and _enabled("embed_topk"):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.where(F.col("vec_id") % 10 == 0)
        timings["embed_topk"], _ = _timed(
            lambda: SIM.cosine_topk(emb, qs, 10).count()
        )

    # --- q7: exact high-d kNN at scale — blocked brute cogroup over
    # synthesized 64-d features keyed by lineitem (the embeddings
    # parquet is fixture-sized; the scale statement needs row counts
    # that exceed the closure limit's regime) ---
    if _enabled("knn_embed_blocked"):
        from ffcl_spark.operators.search_nd import knn_join_nd_blocked
        from ffcl_spark.sources.vectors import synth_features

        keys = li.select(F.col("pid")).where(F.col("pid") % 3 == 0)
        hi_refs = synth_features(keys, "pid", 64).persist()
        n_hi = hi_refs.count()
        hi_qs = hi_refs.where(F.col("id") % 100 == 0)
        timings["knn_embed_blocked"], hi_rows = _timed(
            lambda: knn_join_nd_blocked(hi_qs, hi_refs, 10, precise=False).count()
        )
        extras["hi_d_refs"] = n_hi
        extras["hi_d_knn_rows_per_sec"] = hi_rows / timings["knn_embed_blocked"]
        hi_refs.unpersist()

    total = sum(timings.values())
    # the north_star throughput: docs through the spatial-join+tiling
    # pipeline (extract+index+knn+pip) per second
    spatial_sec = (
        timings["extract_index"] + timings["knn_join"] + timings["pip_tiles"]
    )
    extras["docs_per_sec"] = n_docs / spatial_sec
    extras["join_rows_per_sec"] = (knn_rows + pip_rows) / spatial_sec

    print(
        json.dumps(
            {
                "metric": "spatial_join_tiling_suite_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf,
                "cpus": CPUS,
                "reps": REPS,
                "n_docs": n_docs,
                "n_points": n_pts,
                "knn_rows": knn_rows,
                "pip_rows": pip_rows,
                "radius_rows": radius_rows,
                **{k: round(v, 1) for k, v in extras.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
