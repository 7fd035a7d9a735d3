"""Distributed result sets == NumPy brute force — the reference's own
oracle-test pattern (SearchTest.cpp:954-995)."""

import numpy as np
from pyspark.sql import functions as F

from ffcl_spark import EngineConfig
from ffcl_spark.kernels import neighbors as K
from ffcl_spark.operators import search as S


def knn_sets(pdf):
    return set(zip(pdf.q_id, pdf.r_id))


def test_knn_matches_oracle(spark, cfg, blobs):
    df, pdf = blobs
    k = 5
    got = S.knn_join(df, df, k, cfg).toPandas()
    oq, on, od = K.knn(pdf[["x", "y"]].to_numpy(), pdf[["x", "y"]].to_numpy(), pdf.id.to_numpy(), k)
    assert knn_sets(got) == set(zip(pdf.id.to_numpy()[oq], on))
    # self included at distance 0
    selfs = got[got.q_id == got.r_id]
    assert len(selfs) == len(pdf)
    assert (selfs.dist == 0).all()


def test_knn_deterministic_ties(spark, cfg, grid_exact):
    # exact lattice: massive distance ties; (dist, id) tie-break must
    # give identical sets at different resolutions and parallelism
    df, pdf = grid_exact
    a = S.knn_join(df, df, 4, EngineConfig(resolution=0)).toPandas()
    b = S.knn_join(df, df, 4, EngineConfig(resolution=4)).toPandas()
    assert knn_sets(a) == knn_sets(b)
    oq, on, _ = K.knn(pdf[["x", "y"]].to_numpy(), pdf[["x", "y"]].to_numpy(), pdf.id.to_numpy(), 4)
    assert knn_sets(a) == set(zip(pdf.id.to_numpy()[oq], on))


def test_knn_query_not_in_refs(spark, cfg, blobs, circles):
    dq, pq = circles
    dr, pr = blobs
    got = S.knn_join(dq.where(F.col("id") < 50), dr, 3, cfg).toPandas()
    qp = pq[pq.id < 50]
    oq, on, od = K.knn(qp[["x", "y"]].to_numpy(), pr[["x", "y"]].to_numpy(), pr.id.to_numpy(), 3)
    assert knn_sets(got) == set(zip(qp.id.to_numpy()[oq], on))


def test_radius_matches_oracle(spark, cfg, circles):
    df, pdf = circles
    r = 3.0
    got = S.radius_join(df, df, r, cfg).toPandas()
    xy = pdf[["x", "y"]].to_numpy()
    oa, ob, od = K.radius_pairs(xy, pdf.id.to_numpy(), xy, pdf.id.to_numpy(), r)
    assert set(zip(got.q_id, got.r_id)) == set(zip(oa, ob))
    # strictness: no pair at exactly dist == r
    assert (got.dist < r).all()


def test_box_search_inclusive(spark, cfg, blobs):
    df, pdf = blobs
    got = S.box_search(df, -5.0, -5.0, 5.0, 5.0).toPandas()
    m = (
        (pdf.x >= -5.0) & (pdf.x <= 5.0) & (pdf.y >= -5.0) & (pdf.y <= 5.0)
    )
    assert set(got.id) == set(pdf.id[m])


def test_core_distances_match_oracle(spark, cfg, blobs):
    df, pdf = blobs
    k = 5
    got = S.core_distances(df, k, cfg).toPandas().set_index("id").core_distance
    exp = K.core_distance(pdf[["x", "y"]].to_numpy(), pdf.id.to_numpy(), k)
    assert np.allclose(got.loc[pdf.id].to_numpy(), exp, atol=1e-9)


def test_mutual_reachability(spark, cfg, blobs):
    df, pdf = blobs
    core = S.core_distances(df, 3, cfg)
    edges = S.knn_join(df, df, 3, cfg).where(F.col("q_id") != F.col("r_id"))
    mr = S.mutual_reachability(edges, core).toPandas()
    cd = S.core_distances(df, 3, cfg).toPandas().set_index("id").core_distance
    exp = np.maximum(
        np.maximum(cd.loc[mr.q_id].to_numpy(), cd.loc[mr.r_id].to_numpy()), mr.dist
    )
    assert np.allclose(mr.mreach, exp)


def test_knn_kernel_matches_jvm_and_oracle(spark, cfg, blobs):
    from ffcl_spark.operators.knn_kernel import knn_join_kernel

    df, pdf = blobs
    k = 5
    jvm = S.knn_join(df, df, k, cfg).toPandas()
    ker = knn_join_kernel(df, df, k, cfg).toPandas()
    assert knn_sets(jvm) == knn_sets(ker)
    # bit-equal distances between the two physical plans
    a = jvm.sort_values(["q_id", "r_id"]).reset_index(drop=True)
    b = ker.sort_values(["q_id", "r_id"]).reset_index(drop=True)
    assert (a.dist.to_numpy() == b.dist.to_numpy()).all()


def test_knn_kernel_ties_and_resolutions(spark, grid_exact):
    from ffcl_spark.operators.knn_kernel import knn_join_kernel

    df, pdf = grid_exact
    for res in (0, 2, 5):
        got = knn_join_kernel(df, df, 4, EngineConfig(resolution=res)).toPandas()
        oq, on, _ = K.knn(
            pdf[["x", "y"]].to_numpy(), pdf[["x", "y"]].to_numpy(), pdf.id.to_numpy(), 4
        )
        assert knn_sets(got) == set(zip(pdf.id.to_numpy()[oq], on)), res


def test_knn_kernel_string_ids(spark, cfg):
    from ffcl_spark.datagen import docs_from_points
    from ffcl_spark.operators.knn_kernel import knn_join_kernel
    from ffcl_spark.sources import points as P

    docs = docs_from_points(spark, "noisy_moons", 200)
    pts = P.media_points(docs).cache()
    got = knn_join_kernel(pts, pts, 3, cfg).toPandas()
    pdf = pts.toPandas()
    oq, on, _ = K.knn(
        pdf[["x", "y"]].to_numpy(), pdf[["x", "y"]].to_numpy(),
        pdf.id.to_numpy(), 3,
    )
    assert knn_sets(got) == set(zip(pdf.id.to_numpy()[oq], on))


def test_knn_grid_matches_oracle_and_jvm(spark, cfg, blobs, grid_exact, circles):
    from ffcl_spark.operators.knn_kernel import knn_join_grid

    for df, pdf, k in [(blobs[0], blobs[1], 5), (grid_exact[0], grid_exact[1], 4), (circles[0], circles[1], 7)]:
        got = knn_join_grid(df, df, k, EngineConfig(resolution=4)).toPandas()
        oq, on, _ = K.knn(
            pdf[["x", "y"]].to_numpy(), pdf[["x", "y"]].to_numpy(), pdf.id.to_numpy(), k
        )
        assert knn_sets(got) == set(zip(pdf.id.to_numpy()[oq], on))


def test_knn_grid_cross_set_and_resolutions(spark, blobs, circles):
    from ffcl_spark.operators.knn_kernel import knn_join_grid

    dq, pq = circles
    dr, pr = blobs
    for res in (0, 1, 3, 6):
        got = knn_join_grid(
            dq.where(F.col("id") < 40), dr, 3, EngineConfig(resolution=res)
        ).toPandas()
        qp = pq[pq.id < 40]
        oq, on, _ = K.knn(qp[["x", "y"]].to_numpy(), pr[["x", "y"]].to_numpy(), pr.id.to_numpy(), 3)
        assert knn_sets(got) == set(zip(qp.id.to_numpy()[oq], on)), res


def test_knn_with_memory_excludes_visited(spark, cfg, blobs):
    df, pdf = blobs
    visited = df.where(F.col("id") % 3 == 0).select("id")
    got = S.knn_with_memory(df, df, visited, 4, cfg).toPandas()
    assert not (got.r_id % 3 == 0).any()
    keep = pdf[pdf.id % 3 != 0]
    oq, on, _ = K.knn(
        pdf[["x", "y"]].to_numpy(), keep[["x", "y"]].to_numpy(), keep.id.to_numpy(), 4
    )
    assert knn_sets(got) == set(zip(pdf.id.to_numpy()[oq], on))


def test_closest_pair_matches_bruteforce(spark, cfg, blobs, circles):
    da, pa = blobs
    db, pb = circles
    got = S.closest_pair(da, db, cfg).toPandas()
    assert len(got) == 1
    axy = pa[["x", "y"]].to_numpy()
    bxy = pb[["x", "y"]].to_numpy()
    d = np.sqrt(((axy[:, None, :] - bxy[None, :, :]) ** 2).sum(-1))
    d[d == 0] = np.inf
    i, j = np.unravel_index(d.argmin(), d.shape)
    assert got.src[0] == pa.id.to_numpy()[i]
    assert got.dst[0] == pb.id.to_numpy()[j]
    assert abs(got.dist[0] - d[i, j]) < 1e-12


def test_manhattan_radius_and_knn(spark, cfg, blobs):
    df, pdf = blobs
    xy = pdf[["x", "y"]].to_numpy()
    d1 = np.abs(xy[:, None, :] - xy[None, :, :]).sum(-1)

    r = 4.0
    got = S.radius_join(df, df, r, cfg, metric="manhattan").toPandas()
    qi, ri = np.nonzero(d1 < r)
    ids = pdf.id.to_numpy()
    assert set(zip(got.q_id, got.r_id)) == set(zip(ids[qi], ids[ri]))

    k = 4
    nn = S.knn_join(df, df, k, cfg, metric="manhattan").toPandas()
    expected = set()
    for i in range(len(xy)):
        order = np.lexsort((ids, d1[i]))[:k]
        expected |= {(ids[i], ids[j]) for j in order}
    assert knn_sets(nn) == expected


def test_closest_pair_with_many_coincident_refs(spark, cfg):
    """≥2 refs coincident with a query must not crowd positive edges
    out of the per-query buffer (ADVICE round-2): the k shortest
    positive edges stay exact at any duplicate multiplicity."""
    import pandas as pd

    # 4 queries; ref set = 3 exact copies of every query location plus
    # a few positive-distance refs
    q = pd.DataFrame({"id": [0, 1, 2, 3], "x": [0.0, 5.0, -5.0, 9.0], "y": [0.0, 5.0, -5.0, -9.0]})
    dup = pd.concat([q.assign(id=q.id + 100 * (i + 1)) for i in range(3)])
    extra = pd.DataFrame(
        {"id": [900, 901, 902], "x": [0.5, 5.7, -4.4], "y": [0.0, 5.0, -5.0]}
    )
    refs = pd.concat([dup, extra], ignore_index=True)
    qdf = spark.createDataFrame(q)
    rdf = spark.createDataFrame(refs)
    k = 3
    got = S.closest_pair(qdf, rdf, cfg, k=k).toPandas()
    # brute oracle: all positive edges, k smallest by (dist, src, dst)
    qxy = q[["x", "y"]].to_numpy()
    rxy = refs[["x", "y"]].to_numpy()
    d = np.sqrt(((qxy[:, None, :] - rxy[None, :, :]) ** 2).sum(-1))
    edges = [
        (d[i, j], int(q.id[i]), int(refs.id[j]))
        for i in range(len(q))
        for j in range(len(refs))
        if d[i, j] > 0
    ]
    exp = sorted(edges)[:k]
    got_edges = sorted(zip(got.dist, got.src, got.dst))
    assert [(s, t) for _, s, t in got_edges] == [(s, t) for _, s, t in exp]
    assert np.allclose([w for w, *_ in got_edges], [w for w, *_ in exp])
