"""Geodesic point index at rest (sources/geo_index.py): stored==fly
probes vs NumPy haversine brute force, partition pruning at the scan,
and idempotent epoch append + compaction."""

import numpy as np
import pandas as pd
import pytest

from ffcl_spark.kernels.geo import haversine_np
from ffcl_spark.sources.geo_index import (
    append_geo_index,
    compact_geo_index,
    geo_knn_probe,
    geo_radius_probe,
    read_geo_index,
    write_geo_index,
)
from tests.test_geo import world_pdf

# probes hit the adversarial fixture regions: pole cap, antimeridian
# straddle, background mid-latitude, and a point far from everything
PROBES = [
    (89.95, 10.0),     # north pole cap
    (10.0, 179.95),    # antimeridian, east side
    (10.0, -179.97),   # antimeridian, west side
    (-35.0, 40.0),     # background
]


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    pdf = world_pdf(400, seed=23)
    df = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("geo_idx") / "store")
    write_geo_index(df, path, delta_deg=2.0)
    return path, pdf


def _brute(pdf: pd.DataFrame, lat: float, lon: float) -> np.ndarray:
    return haversine_np(
        np.full(len(pdf), lat), np.full(len(pdf), lon),
        pdf.lat.to_numpy(), pdf.lon.to_numpy(),
    )


def test_geo_radius_probe_matches_brute(spark, store):
    path, pdf = store
    for lat, lon in PROBES:
        for r_m in (50_000.0, 500_000.0, 3_000_000.0):
            got = geo_radius_probe(spark, path, lat, lon, r_m).toPandas()
            d = _brute(pdf, lat, lon)
            want = set(pdf.id[d < r_m])
            assert set(got.id) == want, (lat, lon, r_m)
            # strict < and metre-scale agreement with the twin
            if len(got):
                byid = dict(zip(got.id, got.dist_m))
                for i in want:
                    assert abs(byid[i] - d[pdf.id == i][0]) < 1e-3
    # at least one probe/radius combination is non-trivial
    assert (_brute(pdf, *PROBES[0]) < 500_000.0).sum() > 3


def test_geo_radius_probe_partition_prunes(spark, store):
    path, _ = store
    got = geo_radius_probe(spark, path, -35.0, 40.0, 200_000.0)
    txt = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in txt
    assert "cell" in txt.split("PartitionFilters", 1)[1][:200]


def test_geo_index_one_file_per_cell(spark, store):
    """The write repartitions on the partition column, so each cell is
    exactly one parquet file — a probe's task count equals its covered
    cells, and a small store cannot explode into tasks × cells files."""
    path, _ = store
    df = spark.read.parquet(f"{path}/points")
    n_cells = df.select("cell").distinct().count()
    assert len(df.inputFiles()) == n_cells


def test_geo_knn_probe_matches_brute(spark, store):
    path, pdf = store
    ids = pdf.id.to_numpy()
    for (lat, lon), k in zip(PROBES, (5, 3, 7, 1)):
        got = geo_knn_probe(spark, path, lat, lon, k).toPandas()
        d = _brute(pdf, lat, lon)
        order = np.lexsort((ids, d))[:k]
        assert list(got.id) == [ids[i] for i in order], (lat, lon, k)
        assert list(got["rank"]) == list(range(1, k + 1))
        np.testing.assert_allclose(
            got.dist_m.to_numpy(), d[order], atol=1e-3
        )


def test_geo_knn_probe_k_exceeds_store(spark, store):
    path, pdf = store
    got = geo_knn_probe(spark, path, 0.0, 0.0, len(pdf) + 50).toPandas()
    assert len(got) == len(pdf)
    d = _brute(pdf, 0.0, 0.0)
    order = np.lexsort((pdf.id.to_numpy(), d))
    assert list(got.id) == [pdf.id.to_numpy()[i] for i in order]


def test_geo_index_append_and_compact(spark, tmp_path):
    pdf = world_pdf(360, seed=41)
    first, second = pdf.iloc[:200], pdf.iloc[200:]
    path = str(tmp_path / "geo_idx_epochs")
    write_geo_index(spark.createDataFrame(first), path, delta_deg=2.0)
    append_geo_index(spark.createDataFrame(second), path, epoch=1)
    # replaying the epoch is idempotent (dynamic overwrite of its own
    # subpartitions only)
    append_geo_index(spark.createDataFrame(second), path, epoch=1)
    df, delta, n = read_geo_index(spark, path)
    assert n == len(pdf) and df.count() == len(pdf) and delta == 2.0

    lat, lon, r_m = -35.0, 40.0, 2_000_000.0
    d = _brute(pdf, lat, lon)
    want = set(pdf.id[d < r_m])
    got = set(geo_radius_probe(spark, path, lat, lon, r_m).toPandas().id)
    assert got == want and len(want) > 2

    compact_geo_index(spark, path)
    got2 = set(geo_radius_probe(spark, path, lat, lon, r_m).toPandas().id)
    assert got2 == want
    # all epochs collapsed
    eps = (
        spark.read.parquet(f"{path}/points").select("epoch").distinct().collect()
    )
    assert [r["epoch"] for r in eps] == [0]


def test_auto_delta_deg_density_sizing(spark, tmp_path):
    from ffcl_spark.sources.geo_index import auto_delta_deg

    # expected rows per cell ≈ target: n/(41253/δ²) within 2× of 2000
    for n in (10_000, 1_000_000, 100_000_000):
        d = auto_delta_deg(n)
        cells = 41_252.96 / d**2
        assert 0.05 <= d <= 30.0
        if 0.05 < d < 30.0 and cells > 49:
            assert 1_000 <= n / cells <= 4_000, (n, d)
    # tiny stores floor at ≥48 cells worth of granularity, huge at 0.05°
    assert auto_delta_deg(10) <= 30.0

    # a default-delta store answers probes identically to a brute twin
    pdf = world_pdf(250, seed=77)
    path = str(tmp_path / "geo_idx_auto")
    write_geo_index(spark.createDataFrame(pdf), path)
    d = _brute(pdf, 20.0, -60.0)
    want = set(pdf.id[d < 2_500_000.0])
    got = set(geo_radius_probe(spark, path, 20.0, -60.0, 2_500_000.0).toPandas().id)
    assert got == want and len(want) > 2


def test_geo_box_probe_stored_eq_fly(spark, store):
    """Box probe against the store equals geo_box_search on the source
    frame — plain, antimeridian-wrapping, and pole-touching boxes."""
    from ffcl_spark.operators.geo import geo_box_search
    from ffcl_spark.sources.geo_index import geo_box_probe

    path, pdf = store
    src = spark.createDataFrame(pdf)
    boxes = [
        (-20.0, 35.0, 10.0, 95.0),      # plain
        (-30.0, 30.0, 160.0, -160.0),   # antimeridian wrap
        (85.0, 90.0, -180.0, 180.0),    # pole cap band
    ]
    nonempty = 0
    for la0, la1, lo0, lo1 in boxes:
        got = set(geo_box_probe(spark, path, la0, la1, lo0, lo1).toPandas().id)
        want = set(
            geo_box_search(src, la0, la1, lo0, lo1).toPandas().id
        )
        assert got == want, (la0, la1, lo0, lo1)
        nonempty += bool(want)
    assert nonempty == 3  # fixture exercises all three shapes
