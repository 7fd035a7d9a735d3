"""IDW interpolation (operators/interpolate.py): NumPy twins for the
planar and geodesic paths, the exact-hit rule, and the deterministic
fold order (partitioning invariance)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ffcl_spark.kernels.geo import haversine_np
from ffcl_spark.operators.interpolate import geo_idw, idw_interpolate
from ffcl_spark.plans.cache import release
from tests.test_geo import world_pdf

K = 5


@pytest.fixture(scope="module")
def world(spark):
    pdf = world_pdf()
    return spark.createDataFrame(pdf).cache(), pdf


def _idw_twin(dists: np.ndarray, ids: np.ndarray, vals: np.ndarray,
              k: int, power: float, eps: float) -> float:
    order = np.lexsort((ids, dists))[:k]
    num = den = 0.0
    for i in order:
        if dists[i] == 0.0:
            return float(vals[i])
        w = 1.0 / max(dists[i], eps) ** power
        num += w * vals[i]
        den += w
    return num / den


def test_idw_planar_matches_twin(spark, cfg, blobs):
    df, pdf = blobs
    vals = pdf.id.to_numpy().astype(np.float64) * 0.37 - 11.0
    samples = df.withColumn("val", F.col("id") * 0.37 - 11.0)
    qs = df.where(F.col("id") % 5 == 0)
    out = idw_interpolate(qs, samples, K, cfg)
    got = {r["q_id"]: r["idw"] for r in out.collect()}
    release(out)
    X = pdf[["x", "y"]].to_numpy()
    ids = pdf.id.to_numpy()
    assert len(got) == (pdf.id % 5 == 0).sum()
    for qi in pdf.id[pdf.id % 5 == 0]:
        q = X[ids == qi][0]
        d = np.sqrt(((X - q) ** 2).sum(axis=1))
        want = _idw_twin(d, ids, vals, K, 2.0, 1e-12)
        # the query is its own sample at distance 0 → exact hit
        assert got[qi] == want == vals[ids == qi][0], qi


def test_idw_planar_distinct_queries(spark, cfg, blobs):
    """Queries offset from every sample: the weighted fold itself."""
    df, pdf = blobs
    samples = df.withColumn("val", F.col("id") * 0.37 - 11.0)
    vals = pdf.id.to_numpy().astype(np.float64) * 0.37 - 11.0
    qpdf = pdf.head(40).copy()
    qpdf["x"] = qpdf.x + 0.123
    qpdf["y"] = qpdf.y - 0.456
    qs = spark.createDataFrame(qpdf[["id", "x", "y"]])
    out = idw_interpolate(qs, samples, K, cfg)
    got = {r["q_id"]: r["idw"] for r in out.collect()}
    release(out)
    X = pdf[["x", "y"]].to_numpy()
    ids = pdf.id.to_numpy()
    for row in qpdf.itertuples():
        d = np.sqrt((X[:, 0] - row.x) ** 2 + (X[:, 1] - row.y) ** 2)
        want = _idw_twin(d, ids, vals, K, 2.0, 1e-12)
        assert np.isclose(got[row.id], want, rtol=1e-12), row.id


def test_idw_partitioning_invariance(spark, cfg, blobs):
    """The rank-sorted JVM fold makes the float result EXACTLY
    invariant under input partitioning."""
    df, pdf = blobs
    samples = df.withColumn("val", F.col("id") * 0.37 - 11.0)
    qpdf = pdf.head(30).copy()
    qpdf["x"] = qpdf.x + 0.321
    qs1 = spark.createDataFrame(qpdf[["id", "x", "y"]]).repartition(1)
    qs2 = spark.createDataFrame(qpdf[["id", "x", "y"]]).repartition(16)
    o1 = idw_interpolate(qs1, samples.repartition(1), K, cfg)
    a = {r["q_id"]: r["idw"] for r in o1.collect()}
    release(o1)
    o2 = idw_interpolate(qs2, samples.repartition(16), K, cfg)
    b = {r["q_id"]: r["idw"] for r in o2.collect()}
    release(o2)
    assert a == b  # bitwise


def test_geo_idw_matches_haversine_twin(spark, world):
    df, pdf = world
    vals = (pdf.id.to_numpy() % 113).astype(np.float64) * 1.5
    samples = df.withColumn("val", (F.col("id") % 113).cast("double") * 1.5)
    qpdf = world_pdf(60, seed=99)
    qpdf["id"] = qpdf["id"] + 10_000  # distinct from sample ids
    qs = spark.createDataFrame(qpdf)
    out = geo_idw(qs, samples, K)
    got = {r["q_id"]: r["idw"] for r in out.collect()}
    release(out)
    ids = pdf.id.to_numpy()
    for row in qpdf.itertuples():
        d = haversine_np(
            np.full(len(pdf), row.lat), np.full(len(pdf), row.lon),
            pdf.lat.to_numpy(), pdf.lon.to_numpy(),
        )
        want = _idw_twin(d, ids, vals, K, 2.0, 1e-6)
        assert np.isclose(got[row.id], want, rtol=1e-9), row.id
    assert len(got) == len(qpdf)


def test_geo_idw_exact_hit(spark, world):
    df, pdf = world
    samples = df.withColumn("val", (F.col("id") % 113).cast("double") * 1.5)
    # probe AT a station coordinate → station value, not a blend
    hit = pdf.iloc[7]
    qs = spark.createDataFrame(
        pd.DataFrame({"id": [77777], "lat": [hit.lat], "lon": [hit.lon]})
    )
    out = geo_idw(qs, samples, K)
    got = out.collect()
    release(out)
    assert len(got) == 1
    assert got[0]["idw"] == float((hit.id % 113) * 1.5)
