"""k-medoids suite: kernel swap-optimality oracle, CLARA operator
parity with the driver kernel, per-cell kernel parity, n-D input.
Reference: ``KMedoids.hpp`` / ``FasterPAM.hpp`` / ``PAMBuild.hpp``."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from ffcl_spark import EngineConfig
from ffcl_spark.kernels.pam import distance_matrix, pam
from ffcl_spark.operators.kmedoids import kmedoids, kmedoids_per_cell


def test_pam_swap_optimal_and_deterministic():
    rng = np.random.default_rng(3)
    centers = rng.uniform(-10, 10, size=(4, 2))
    mat = np.vstack([c + rng.normal(0, 0.7, size=(40, 2)) for c in centers])
    med, td = pam(mat, 4)
    d = distance_matrix(mat)
    cur = d[med].min(axis=0).sum()
    assert abs(cur - td) < 1e-9
    for mi in range(4):
        for xc in range(len(mat)):
            if xc in med:
                continue
            trial = list(med)
            trial[mi] = xc
            assert d[trial].min(axis=0).sum() >= cur - 1e-12
    med2, td2 = pam(mat, 4)
    assert np.array_equal(med, med2) and td == td2


def test_pam_medoids_hit_planted_centers():
    rng = np.random.default_rng(9)
    centers = np.array([[-8.0, -8.0], [8.0, 8.0], [8.0, -8.0]])
    mat = np.vstack([c + rng.normal(0, 0.5, size=(30, 2)) for c in centers])
    med, _ = pam(mat, 3)
    got = np.sort(mat[med][:, 0])
    assert np.allclose(np.sign(got), [-1, 1, 1])


def test_kmedoids_full_sample_matches_driver_pam(blobs):
    df, pdf = blobs
    med_ids, td, labels = kmedoids(df, 4, sample_rows=100_000)
    # driver oracle on the same (full) data
    loc = pdf.sort_values("id").reset_index(drop=True)
    mat = loc[["x", "y"]].to_numpy()
    med_rows, td_loc = pam(mat, 4)
    exp_ids = loc["id"].to_numpy()[med_rows]
    assert sorted(med_ids) == sorted(exp_ids.tolist())
    assert abs(td - td_loc) < 1e-6
    # labels = nearest medoid id
    got = labels.toPandas().sort_values("id")["label"].to_numpy()
    d = distance_matrix(mat)[:, med_rows]
    exp = exp_ids[d.argmin(axis=1)]
    assert (got == exp).all()


def test_kmedoids_parallelism_invariant(blobs):
    df, _ = blobs
    a = kmedoids(df.repartition(1), 3, sample_rows=100_000)
    b = kmedoids(df.repartition(11), 3, sample_rows=100_000)
    assert sorted(a[0]) == sorted(b[0])
    # medoids and labels are exactly invariant; the REPORTED total
    # deviation is a float sum over partitions (summation-order
    # dependent at the ulp level)
    assert np.isclose(a[1], b[1], rtol=1e-12)
    pa = a[2].toPandas().sort_values("id").reset_index(drop=True)
    pb = b[2].toPandas().sort_values("id").reset_index(drop=True)
    assert pa.equals(pb)


def test_kmedoids_nd(spark):
    rng = np.random.default_rng(4)
    centers = rng.uniform(-6, 6, size=(3, 5))
    mat = np.vstack([c + rng.normal(0, 0.5, size=(40, 5)) for c in centers])
    ids = np.arange(len(mat), dtype=np.int64)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": ids, "features": [list(r) for r in mat]}), schema
    )
    med_ids, td, labels = kmedoids(df, 3, sample_rows=100_000, vec_col="features")
    med_rows, td_loc = pam(mat, 3)
    assert sorted(med_ids) == sorted(ids[med_rows].tolist())
    assert abs(td - td_loc) < 1e-6


def test_kmedoids_per_cell_matches_local(blobs, cfg):
    from ffcl_spark.kernels.grid import axis_index

    df, pdf = blobs
    out = kmedoids_per_cell(df, 2, cfg).toPandas()
    # local replica, cell by cell
    loc = pdf.sort_values("id").reset_index(drop=True)
    ix = axis_index(loc["x"].to_numpy(), cfg.x0, cfg.cell_size, cfg.grid_n)
    iy = axis_index(loc["y"].to_numpy(), cfg.y0, cfg.cell_size, cfg.grid_n)
    cell = cfg.resolution * (1 << 52) + ix * (1 << 26) + iy
    for c, grp in loc.assign(cell=cell).groupby("cell"):
        mat = grp[["x", "y"]].to_numpy()
        med_rows, td = pam(mat, 2)
        exp = set(grp["id"].to_numpy()[med_rows].tolist())
        got_rows = out[out["cell"] == c]
        assert set(got_rows["medoid_id"]) == exp
        assert np.allclose(got_rows["local_td"].to_numpy(), td)


def test_fastermsc_swap_optimal_under_msc_objective():
    from ffcl_spark.kernels.pam import msc_loss, pam

    rng = np.random.default_rng(13)
    centers = rng.uniform(-10, 10, size=(4, 2))
    mat = np.vstack([c + rng.normal(0, 0.8, size=(30, 2)) for c in centers])
    d = distance_matrix(mat)
    for k in (2, 3, 4):
        med, loss = pam(mat, k, algorithm="fastermsc")
        cur = msc_loss(d, list(med))
        assert abs(cur - loss) < 1e-9
        for mi in range(k):
            for xc in range(len(mat)):
                if xc in med:
                    continue
                trial = list(med)
                trial[mi] = xc
                assert msc_loss(d, trial) >= cur - 1e-9


def test_kmedoids_fastermsc_matches_driver(blobs):
    from ffcl_spark.kernels.pam import pam as pam_local

    df, pdf = blobs
    med_ids, loss, labels = kmedoids(df, 3, sample_rows=100_000, algorithm="fastermsc")
    loc = pdf.sort_values("id").reset_index(drop=True)
    mat = loc[["x", "y"]].to_numpy()
    med_rows, loss_loc = pam_local(mat, 3, algorithm="fastermsc")
    assert sorted(med_ids) == sorted(loc["id"].to_numpy()[med_rows].tolist())
    assert abs(loss - loss_loc) < 1e-6


def test_weighted_pam_unit_weights_match_unweighted():
    rng = np.random.default_rng(21)
    mat = rng.uniform(-10, 10, size=(120, 2))
    a_med, a_td = pam(mat, 4)
    b_med, b_td = pam(mat, 4, weights=np.ones(len(mat)))
    assert np.array_equal(a_med, b_med) and a_td == b_td


def test_weighted_pam_equals_replication():
    # weight w ≡ the sample repeated w times: the weighted solve on
    # uniques must reach the same TD as the flat solve on the
    # replicated set (medoid positions from the unique set)
    rng = np.random.default_rng(22)
    base = rng.uniform(-10, 10, size=(40, 2))
    w = rng.integers(1, 5, size=40)
    rep = np.repeat(base, w, axis=0)
    med_w, td_w = pam(base, 3, weights=w.astype(float))
    med_r, td_r = pam(rep, 3)
    assert abs(td_w - td_r) < 1e-9
    assert {tuple(base[i]) for i in med_w} == {tuple(rep[i]) for i in med_r}


def test_kmedoids_two_level_quality(blobs, cfg):
    from ffcl_spark.operators.kmedoids import kmedoids_two_level

    df, pdf = blobs
    med_ids, td2, labels = kmedoids_two_level(df, 4, cfg, k_local=4)
    assert len(med_ids) == 4
    assert labels.count() == len(pdf)
    # flat exact solve as the quality bar
    _, td_flat, _ = kmedoids(df, 4, sample_rows=100_000)
    assert td2 <= td_flat * 1.25, (td2, td_flat)
    # determinism across parallelism
    med_b, td_b, _ = kmedoids_two_level(df.repartition(7), 4, cfg, k_local=4)
    assert sorted(med_ids) == sorted(med_b)


def test_kmedoids_manhattan_matches_driver(blobs):
    """metric='manhattan' must assign/score under L1 end to end
    (ADVICE round-2: the exposed metric silently ran euclidean)."""
    df, pdf = blobs
    med_ids, td, labels = kmedoids(df, 3, sample_rows=100_000, metric="manhattan")
    loc = pdf.sort_values("id").reset_index(drop=True)
    mat = loc[["x", "y"]].to_numpy()
    med_rows, td_loc = pam(mat, 3, metric="manhattan")
    exp_ids = loc["id"].to_numpy()[med_rows]
    assert sorted(med_ids) == sorted(exp_ids.tolist())
    assert abs(td - td_loc) < 1e-6
    # labels = nearest medoid by L1, ties toward the smaller medoid id
    got = labels.toPandas().sort_values("id")["label"].to_numpy()
    order = np.argsort(exp_ids)
    ids_sorted = exp_ids[order]
    d1 = np.abs(mat[:, None, :] - mat[med_rows][order][None, :, :]).sum(-1)
    exp = ids_sorted[d1.argmin(axis=1)]
    assert (got == exp).all()
