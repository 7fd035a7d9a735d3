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
