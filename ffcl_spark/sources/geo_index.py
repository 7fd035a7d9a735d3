"""Geodesic point index at rest — the spherical member of the
at-rest store family (``sources/points.write_point_index`` for the
planar grid, ``similarity.write_ann_index`` for vectors,
``ranking.write_postings`` for text).

(id, lat, lon) points are written as parquet PARTITIONED BY their
latitude-band spherical cell (``functions/sphere.py`` — the engine's
H3/S2-style on-sphere grid), so a geodesic probe's spherical-cap cell
cover becomes PartitionFilters: the scan reads only the covered
cells' files, and bytes read scale with the probe's cap area, not the
corpus. Cell assignment at write time and the Python-side cover at
probe time both derive from ONE ``band_m_table`` (the topology-shared
contract ``geo_pip_join`` established), so they can never disagree on
grid shape.

Probes mirror the planar trio and the reference's single-tree query
semantics (``TreeTraverser.hpp:218-269``): radius = strict ``< r``
(``Ball.hpp:73-77``), kNN = expanding-radius rounds under the
≥k-in-radius exactness rule (every point with great-circle distance
< r lives in a covered cell, so once k candidates sit strictly inside
r the true top-k is among the loaded rows — the sibling-visit twin on
the sphere). Layout is ``cell=<id>/epoch=<n>`` so
:func:`append_geo_index` adds batches idempotently under the same
dynamic-partition-overwrite discipline as the other stores.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.functions import sphere as S
from ffcl_spark.operators.geo import EARTH_RADIUS_M, haversine_m
from ffcl_spark.plans.epoch_write import compact_epochs, overwrite_epoch_partitions


def _with_sphere_cell(
    points: DataFrame,
    delta_deg: float,
    m_table: list[int],
    id_col: str,
    lat_col: str,
    lon_col: str,
) -> DataFrame:
    return points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        S.sphere_cell_table(
            F.col(lat_col), F.col(lon_col), delta_deg, m_table
        ).alias("cell"),
    )


# whole-sphere solid angle in square degrees: a δ×δ grid has ≈ this/δ²
# cells, the sizing identity behind the density-based default below
_SPHERE_SQ_DEG = 41_252.96


def auto_delta_deg(n: int, rows_per_cell: int = 2_000) -> float:
    """Density-based band height: size the grid so the EXPECTED cell
    holds ~``rows_per_cell`` points (uniform bound; city-skewed real
    data still splits at read via row groups). Over-partitioning is
    the store's failure mode — a 1° grid for 1M points makes ~15k
    near-empty cells whose directory LISTING dominates probe latency
    (measured 21 s for a 32-row probe at sf0.1); at 10⁹ points the
    same formula lands at ~0.3° and listing amortizes."""
    cells = max(48.0, n / max(rows_per_cell, 1))
    return max(0.05, min(30.0, math.sqrt(_SPHERE_SQ_DEG / cells)))


def write_geo_index(
    points: DataFrame,
    path: str,
    *,
    delta_deg: float | None = None,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> None:
    """Build the geodesic index at rest: points partitioned by their
    spherical cell at ``epoch=0``, plus a JSON sidecar carrying the
    grid parameter and the row count (the kNN probe sizes its start
    radius from global density, like ``sphere_knn_join``). With the
    default ``delta_deg=None`` the band height is sized from the row
    count (:func:`auto_delta_deg`)."""
    n = points.count()
    if delta_deg is None:
        delta_deg = auto_delta_deg(n)
    m_table = S.band_m_table(delta_deg)
    pts = _with_sphere_cell(points, delta_deg, m_table, id_col, lat_col, lon_col)
    # repartition on the partition column first: without it every write
    # task emits one file per cell it touches (tasks × cells tiny
    # files — measured 17.8k files for a 20k-row store); with it each
    # cell is exactly one file and a probe's task count equals its
    # covered-cell count. Oversized hot cells still split at read time
    # via maxPartitionBytes (parquet row groups).
    pts.repartition("cell").withColumn("epoch", F.lit(0)).write.mode(
        "overwrite"
    ).partitionBy("cell", "epoch").parquet(f"{path}/points")
    with open(f"{path}/meta.json".replace("file:", ""), "w") as f:
        json.dump({"delta_deg": delta_deg, "n": n}, f)


def append_geo_index(
    points: DataFrame,
    path: str,
    epoch: int,
    *,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    refresh_n: bool = True,
) -> None:
    """Add a batch under ``epoch=<n>`` with dynamic partition
    overwrite — replaying an epoch rewrites exactly its own
    subpartitions (idempotent resume, same discipline as
    ``append_point_index``). With ``refresh_n`` the sidecar's row
    count is recomputed from the whole store (one store scan) so kNN
    probe density stays current; streaming callers pass ``False`` —
    O(store) per epoch is the wrong shape for an unbounded ingest, and
    a stale ``n`` only widens the kNN probe's START radius (extra
    rounds at worst, never a wrong answer)."""
    meta_path = f"{path}/meta.json".replace("file:", "")
    with open(meta_path) as f:
        meta = json.load(f)
    delta_deg = meta["delta_deg"]
    m_table = S.band_m_table(delta_deg)
    pts = _with_sphere_cell(points, delta_deg, m_table, id_col, lat_col, lon_col)
    overwrite_epoch_partitions(
        pts.repartition("cell").withColumn("epoch", F.lit(int(epoch))),
        f"{path}/points",
        "cell",
        "epoch",
    )
    if refresh_n:
        spark = points.sparkSession
        meta["n"] = spark.read.parquet(f"{path}/points").count()
        with open(meta_path, "w") as f:
            json.dump(meta, f)


def compact_geo_index(spark, path: str) -> None:
    """Collapse all epochs into ``epoch=0`` (small-files remedy);
    query-identical by construction."""
    compact_epochs(spark, f"{path}/points", "cell")


def read_geo_index(
    spark, path: str, cells: list[int] | None = None
) -> tuple[DataFrame, float, int]:
    """Load the store. With ``cells``, the scan carries an IN-filter
    over the partition column (PartitionFilters — only those cells'
    files are read). Returns (points, delta_deg, n)."""
    with open(f"{path}/meta.json".replace("file:", "")) as f:
        meta = json.load(f)
    df = spark.read.parquet(f"{path}/points").drop("epoch")
    if cells is not None:
        df = df.where(F.col("cell").isin([int(c) for c in cells]))
    return df, float(meta["delta_deg"]), int(meta["n"])


def _probe_read(
    spark, path: str, lat: float, lon: float, radius_m: float,
    earth_radius_m: float,
) -> DataFrame:
    """Rows of every cell the probe cap covers (superset by the padded
    Python cover — floating-point disagreement with the stored JVM
    assignment can only WIDEN the read, never exclude a true hit)."""
    with open(f"{path}/meta.json".replace("file:", "")) as f:
        meta = json.load(f)
    delta_deg = float(meta["delta_deg"])
    r_deg = math.degrees(radius_m / earth_radius_m) * (1 + 1e-9) + 1e-9
    m_table = S.band_m_table(delta_deg)
    covered = sorted(S.cover_cells_py(lat, lon, r_deg, delta_deg, m_table))
    df = spark.read.parquet(f"{path}/points").drop("epoch")
    return df.where(F.col("cell").isin(covered))


def geo_radius_probe(
    spark,
    path: str,
    lat: float,
    lon: float,
    radius_m: float,
    *,
    earth_radius_m: float = EARTH_RADIUS_M,
) -> DataFrame:
    """All stored points with great-circle ``dist_m < radius_m``
    (strict, ``Ball.hpp:73-77``) of one probe coordinate, reading only
    the spherical cells the probe's cap covers. Value-identical to
    ``geo.sphere_radius_join`` on the fly (pinned in tests)."""
    d = haversine_m(
        F.lit(float(lat)), F.lit(float(lon)), F.col("lat"), F.col("lon"),
        earth_radius_m,
    )
    return (
        _probe_read(spark, path, lat, lon, radius_m, earth_radius_m)
        .withColumn("dist_m", d)
        .where(F.col("dist_m") < F.lit(float(radius_m)))
        .drop("cell")
    )


def _box_cover_cells_py(
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
    delta_deg: float,
    m_table: list[int],
) -> list[int]:
    """Every spherical cell intersecting a lat/lon box (``lon_lo >
    lon_hi`` = antimeridian wrap), padded one band / one lon cell per
    side so float disagreement with the stored JVM assignment can only
    WIDEN the cover."""
    nb = len(m_table)
    b_lo = max(0, math.floor((lat_lo + 90.0) / delta_deg) - 1)
    b_hi = min(nb - 1, math.floor((lat_hi + 90.0) / delta_deg) + 1)
    spans = (
        [(lon_lo, lon_hi)]
        if lon_lo <= lon_hi
        else [(lon_lo, 180.0), (-180.0, lon_hi)]
    )
    cells: set[int] = set()
    for band in range(b_lo, b_hi + 1):
        m = m_table[band]
        for a, b in spans:
            j_lo = math.floor((a + 180.0) * m / 360.0) - 1
            j_hi = min(math.floor((b + 180.0) * m / 360.0) + 1, j_lo + m - 1)
            for j in range(j_lo, j_hi + 1):
                cells.add(band * (1 << 32) + (j % m))
    return sorted(cells)


def geo_box_probe(
    spark,
    path: str,
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
) -> DataFrame:
    """All stored points inside a lat/lon box (bounds inclusive;
    ``lon_lo > lon_hi`` crosses the antimeridian), reading only the
    cells the box covers — value-identical to ``geo.geo_box_search``
    on the fly. Completes the geodesic probe trio (radius, kNN, box),
    mirroring the planar store's ``box_search_indexed``."""
    with open(f"{path}/meta.json".replace("file:", "")) as f:
        meta = json.load(f)
    delta_deg = float(meta["delta_deg"])
    m_table = S.band_m_table(delta_deg)
    covered = _box_cover_cells_py(
        lat_lo, lat_hi, lon_lo, lon_hi, delta_deg, m_table
    )
    df = spark.read.parquet(f"{path}/points").drop("epoch")
    lat_ok = F.col("lat").between(lat_lo, lat_hi)
    if lon_lo <= lon_hi:
        lon_ok = F.col("lon").between(lon_lo, lon_hi)
    else:
        lon_ok = (F.col("lon") >= lon_lo) | (F.col("lon") <= lon_hi)
    return df.where(F.col("cell").isin(covered)).where(lat_ok & lon_ok).drop(
        "cell"
    )


def geo_knn_probe(
    spark,
    path: str,
    lat: float,
    lon: float,
    k: int,
    *,
    earth_radius_m: float = EARTH_RADIUS_M,
    growth: float = 3.0,
) -> DataFrame:
    """k nearest stored points of one probe coordinate — the
    reference's headline single-tree kNN (``TreeTraverser.hpp:218-269``)
    against the spherical store.

    Expanding-radius rounds: read the cap cover at r (partition-pruned),
    rank candidates by (dist_m, id); if ≥ k rows land strictly inside r
    the top-k is exact (every point with dist < r lives in a covered
    cell — the sphere's sibling-visit rule), else retry at ``growth·r``
    (cap area ×growth², geometric). The final round covers the whole
    sphere so termination is unconditional; a store with fewer than k
    rows emits what exists. Bytes read scale with the rings the answer
    needs, not the corpus. Returns (id, lat, lon, dist_m, rank)."""
    with open(f"{path}/meta.json".replace("file:", "")) as f:
        meta = json.load(f)
    n = max(1, int(meta["n"]))
    r_m = max(4.0 * math.sqrt(k / n) * earth_radius_m, 1.0)
    half_circ = math.pi * earth_radius_m
    id_type = "string"
    while True:
        last = r_m >= half_circ
        cand = geo_radius_probe(
            spark, path, lat, lon, min(r_m, half_circ * 1.001),
            earth_radius_m=earth_radius_m,
        )
        id_type = cand.schema["id"].dataType.simpleString()
        rows = cand.orderBy("dist_m", "id").limit(k).collect()
        if len(rows) >= k or last:
            out_schema = (
                f"id {id_type}, lat double, lon double, dist_m double, rank int"
            )
            data = [
                (r["id"], r["lat"], r["lon"], r["dist_m"], i + 1)
                for i, r in enumerate(rows)
            ]
            return spark.createDataFrame(data, out_schema)
        r_m *= growth
