import numpy as np

from ffcl_spark.kernels.pip import points_in_polygon
from ffcl_spark.operators import tiles as TL


def test_grid_pip_matches_box_logic(spark, cfg, blobs):
    df, pdf = blobs
    tiles = TL.grid_tiles(spark, cfg)
    got = TL.pip_join(df, tiles, cfg).toPandas()
    expected = set()
    for _, r in pdf.iterrows():
        for tx in range(10):
            for ty in range(10):
                if (-30 + 6 * tx <= r.x <= -30 + 6 * (tx + 1)) and (
                    -30 + 6 * ty <= r.y <= -30 + 6 * (ty + 1)
                ):
                    expected.add((r.id, f"tile-{tx}-{ty}"))
    assert set(zip(got.id, got.tile_id)) == expected


def test_convex_pip_matches_numpy_oracle(spark, cfg, circles):
    df, pdf = circles
    tiles = TL.convex_tiles(spark, cfg)
    got = TL.pip_join(df, tiles, cfg).toPandas()
    expected = set()
    for t in tiles.toPandas().itertuples():
        ring = np.array([[v["x"], v["y"]] for v in t.ring])
        mask = points_in_polygon(pdf.x.to_numpy(), pdf.y.to_numpy(), ring)
        expected |= {(i, t.tile_id) for i in pdf.id[mask]}
    assert set(zip(got.id, got.tile_id)) == expected


def test_rasterize_vectorize_roundtrip(spark, cfg):
    tiles = TL.grid_tiles(spark, cfg)
    rast = TL.rasterize(tiles, cfg)
    # tile side 6.0 = 0.8 cells at res 3 (cell 7.5)… each tile covers
    # 1..4 cells; every tile must appear
    pdf = rast.toPandas()
    assert set(pdf.tile_id) == {f"tile-{x}-{y}" for x in range(10) for y in range(10)}
    vec = TL.vectorize(rast, cfg).toPandas()
    assert len(vec) == 100
    # bbox of the rasterized cells must contain the tile
    for t in vec.itertuples():
        tx, ty = map(int, t.tile_id.split("-")[1:])
        assert t.x_lo <= -30 + 6 * tx and t.x_hi >= -30 + 6 * (tx + 1) - 1e-9
        assert t.y_lo <= -30 + 6 * ty and t.y_hi >= -30 + 6 * (ty + 1) - 1e-9


def test_pip_boundary_points_double_assigned(spark, cfg):
    # a point exactly on a shared tile edge belongs to both tiles
    df = spark.createDataFrame([("edge", -12.0, 3.0)], "id string, x double, y double")
    tiles = TL.grid_tiles(spark, cfg)
    got = TL.pip_join(df, tiles, cfg).toPandas()
    assert set(got.tile_id) == {"tile-2-5", "tile-3-5"}


def test_pip_broadcast_path_matches_closure_path(spark, cfg):
    from ffcl_spark.operators.tiles import convex_tiles, grid_tiles, pip_join, pip_join_broadcast
    from tests.conftest import points_pdf

    pts = spark.createDataFrame(points_pdf("blobs", 500)).cache()
    for tiles in (grid_tiles(spark, cfg, side=6.0), convex_tiles(spark, cfg, n_tiles=10)):
        tiles = tiles.cache()
        a = pip_join(pts, tiles, cfg).toPandas()
        b = pip_join_broadcast(pts, tiles, cfg).toPandas()
        ka = set(zip(a.id, a.tile_id))
        kb = set(zip(b.id, b.tile_id))
        assert ka == kb and len(a) == len(b)


def test_pip_join_routes_large_tile_tables(spark, cfg):
    from ffcl_spark.operators.tiles import grid_tiles, pip_join
    from tests.conftest import points_pdf

    pts = spark.createDataFrame(points_pdf("blobs", 300)).cache()
    tiles = grid_tiles(spark, cfg, side=6.0)
    # force the broadcast-join path with a tiny closure limit
    a = pip_join(pts, tiles, cfg, closure_tile_limit=1).toPandas()
    b = pip_join(pts, tiles, cfg).toPandas()
    assert set(zip(a.id, a.tile_id)) == set(zip(b.id, b.tile_id))


def _box_dist(x, y, xlo, ylo, xhi, yhi):
    gx = max(0.0, xlo - x, x - xhi)
    gy = max(0.0, ylo - y, y - yhi)
    return float(np.sqrt(gx * gx + gy * gy))


def test_nearest_tile_boxes(spark, cfg, blobs):
    df, pdf = blobs
    # a sparse box set so most points are OUTSIDE every box
    rows = [
        ("box-a", -20.0, -20.0, -10.0, -10.0),
        ("box-b", 5.0, 5.0, 15.0, 15.0),
        ("box-c", -2.0, -2.0, 2.0, 2.0),
    ]
    boxes = spark.createDataFrame(
        rows, "tile_id string, x_lo double, y_lo double, x_hi double, y_hi double"
    )
    got = TL.nearest_tile_boxes(df, boxes).toPandas().set_index("id")
    inside = outside = 0
    for _, r in pdf.iterrows():
        ds = sorted(
            (_box_dist(r.x, r.y, *b[1:]), b[0]) for b in rows
        )
        assert got.loc[r.id].tile_id == ds[0][1], r.id
        assert got.loc[r.id].dist == ds[0][0], r.id
        inside += ds[0][0] == 0.0
        outside += ds[0][0] > 0.0
    assert inside > 0 and outside > 0  # both regimes exercised


def test_nearest_tile_boxes_tie_break(spark):
    # point equidistant between two boxes → smallest tile_id wins
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    boxes = spark.createDataFrame(
        [("z", 2.0, -1.0, 4.0, 1.0), ("a", -4.0, -1.0, -2.0, 1.0)],
        "tile_id string, x_lo double, y_lo double, x_hi double, y_hi double",
    )
    r = TL.nearest_tile_boxes(pts, boxes).collect()[0]
    assert r.tile_id == "a" and r.dist == 2.0


def test_nearest_tile_rings_matches_numpy(spark, cfg, circles):
    df, pdf = circles
    tiles = TL.convex_tiles(spark, cfg, n_tiles=5)
    got = TL.nearest_tile(df, tiles).toPandas().set_index("id")
    tl = [
        (t.tile_id, np.array([[v["x"], v["y"]] for v in t.ring]))
        for t in tiles.toPandas().itertuples()
    ]

    def seg_d(px, py, a, b):
        vx, vy = b[0] - a[0], b[1] - a[1]
        den = vx * vx + vy * vy
        t = max(0.0, min(1.0, ((px - a[0]) * vx + (py - a[1]) * vy) / den)) if den > 0 else 0.0
        return float(np.hypot(px - (a[0] + t * vx), py - (a[1] + t * vy)))

    n_zero = 0
    for _, r in pdf.iterrows():
        best = (np.inf, "")
        for tid, ring in sorted(tl):
            if points_in_polygon(np.array([r.x]), np.array([r.y]), ring)[0]:
                d = 0.0
            else:
                d = min(seg_d(r.x, r.y, ring[i], ring[i + 1]) for i in range(len(ring) - 1))
            if (d, tid) < best:
                best = (d, tid)
        assert got.loc[r.id].tile_id == best[1], r.id
        assert np.isclose(got.loc[r.id].dist, best[0], atol=1e-12), r.id
        n_zero += best[0] == 0.0
    assert n_zero > 0 and n_zero < len(pdf)  # inside and outside both hit


# ------------------------------------------------------------- overlay


def test_overlay_kernel_cases():
    from ffcl_spark.kernels.overlay import polys_intersect, ring_area, ring_centroid

    sq = lambda x0, y0, s: np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]
    )
    # proper edge crossing
    assert polys_intersect(sq(0, 0, 2), sq(1, 1, 2))
    # containment without any edge crossing (nested squares, both ways)
    assert polys_intersect(sq(0, 0, 10), sq(3, 3, 1))
    assert polys_intersect(sq(3, 3, 1), sq(0, 0, 10))
    # corner touch at a single point counts (boundary semantics)
    assert polys_intersect(sq(0, 0, 1), sq(1, 1, 1))
    # collinear edge overlap without proper crossing
    assert polys_intersect(sq(0, 0, 1), sq(0.25, 1, 1))
    # disjoint
    assert not polys_intersect(sq(0, 0, 1), sq(5, 5, 1))
    # shoelace twins
    assert ring_area(sq(2, 3, 4)) == 16.0  # CCW positive
    cx, cy = ring_centroid(sq(2, 3, 4))
    assert (cx, cy) == (4.0, 5.0)


def test_overlay_join_matches_brute(spark, cfg):
    from ffcl_spark.kernels.overlay import polys_intersect

    tiles = TL.convex_tiles(spark, cfg, n_tiles=10, seed=3)
    rows = tiles.select("tile_id", "ring").collect()
    rings = {
        r.tile_id: np.array([[v["x"], v["y"]] for v in r.ring], dtype=np.float64)
        for r in rows
    }
    want = sorted(
        (a, b)
        for a in rings
        for b in rings
        if polys_intersect(rings[a], rings[b])
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in TL.overlay_join(tiles, tiles).collect()
    )
    assert got == want
    assert all((t, t) in got for t in rings)  # self-pairs present


def test_overlay_join_two_tables(spark, cfg):
    from ffcl_spark.kernels.overlay import polys_intersect

    a = TL.grid_tiles(spark, cfg, side=15.0)  # 16 coarse boxes
    b = TL.convex_tiles(spark, cfg, n_tiles=6, seed=11)
    ra = {
        r.tile_id: np.array([[v["x"], v["y"]] for v in r.ring]) for r in a.collect()
    }
    rb = {
        r.tile_id: np.array([[v["x"], v["y"]] for v in r.ring]) for r in b.collect()
    }
    want = sorted(
        (i, j) for i in ra for j in rb if polys_intersect(ra[i], rb[j])
    )
    got = sorted((r.a_id, r.b_id) for r in TL.overlay_join(a, b).collect())
    assert got == want
    assert len(got) >= len(rb)  # every convex tile overlaps some box


def test_tile_measures_match_numpy(spark, cfg):
    from ffcl_spark.kernels.overlay import ring_area, ring_centroid

    tiles = TL.convex_tiles(spark, cfg, n_tiles=8, seed=7)
    got = {r.tile_id: r for r in TL.tile_measures(tiles).collect()}
    for row in tiles.select("tile_id", "ring").collect():
        ring = np.array([[v["x"], v["y"]] for v in row.ring], dtype=np.float64)
        g = got[row.tile_id]
        assert g.area == abs(ring_area(ring))
        cx, cy = ring_centroid(ring)
        assert abs(g.centroid_x - cx) < 1e-12 and abs(g.centroid_y - cy) < 1e-12
        # perimeter: sequential fold both sides
        x, y = ring[:, 0], ring[:, 1]
        per = float(np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2).sum())
        assert abs(g.perimeter - per) < 1e-12


def test_zonal_stats_matches_pandas_twin(spark, cfg, blobs):
    import pandas as pd
    from pyspark.sql import functions as F

    df, pdf = blobs
    vals = df.withColumn("v", (F.col("id") % 97).cast("long")).withColumn(
        "w", F.col("x") * 0.5
    )
    tiles = TL.grid_tiles(spark, cfg)
    got = TL.zonal_stats(vals, tiles, cfg, values=("v", "w")).toPandas()

    asg = TL.pip_join(df, tiles, cfg).toPandas()
    vpdf = pdf.assign(v=(pdf.id % 97).astype("int64"), w=pdf.x * 0.5)
    j = asg.merge(vpdf[["id", "v", "w"]], on="id")
    want = j.groupby("tile_id").agg(
        n_points=("id", "size"),
        sum_v=("v", "sum"),
        min_v=("v", "min"),
        max_v=("v", "max"),
        min_w=("w", "min"),
        max_w=("w", "max"),
    )
    g = got.set_index("tile_id").sort_index()
    want = want.sort_index()
    assert list(g.index) == list(want.index) and len(g) > 5
    for c in ("n_points", "sum_v", "min_v", "max_v", "min_w", "max_w"):
        assert (g[c].to_numpy() == want[c].to_numpy()).all(), c
    # float sums agree to reorder tolerance
    sw = j.groupby("tile_id").w.sum().sort_index()
    assert np.allclose(g["sum_w"].to_numpy(), sw.to_numpy(), rtol=1e-12)

    # broadcast path (forced) produces the identical aggregate
    got_b = (
        TL.zonal_stats(vals, tiles, cfg, values=("v",), closure_tile_limit=0)
        .toPandas()
        .set_index("tile_id")
        .sort_index()
    )
    assert (got_b["n_points"].to_numpy() == want["n_points"].to_numpy()).all()
    assert (got_b["sum_v"].to_numpy() == want["sum_v"].to_numpy()).all()
