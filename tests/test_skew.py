"""Skew handling: hot-cell salting keeps results identical and keys even."""

import numpy as np
import pandas as pd
from dataclasses import replace

from ffcl_spark import EngineConfig
from ffcl_spark.kernels import neighbors as K
from ffcl_spark.operators import search as S
from ffcl_spark.operators.knn_kernel import knn_join_grid


def _skewed(spark, n=2000, seed=5):
    # 90% of points crammed into one cell, rest uniform
    rng = np.random.default_rng(seed)
    hot = rng.uniform(0.0, 0.4, (int(n * 0.9), 2))  # one res-4 cell is 3.75 wide
    cold = rng.uniform(-29, 29, (n - len(hot), 2))
    xy = np.concatenate([hot, cold])
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "x": xy[:, 0], "y": xy[:, 1]})
    return spark.createDataFrame(pdf).cache(), pdf


def test_salted_radius_join_exact_on_skew(spark):
    cfg = replace(EngineConfig(resolution=4), hot_cell_rows=200, salt_buckets=8)
    df, pdf = _skewed(spark)
    r = 0.5
    got = S.radius_join(df, df, r, cfg, salt_hot_cells=True).toPandas()
    plain = S.radius_join(df, df, r, cfg, salt_hot_cells=False).toPandas()
    xy = pdf[["x", "y"]].to_numpy()
    oa, ob, _ = K.radius_pairs(xy, pdf.id.to_numpy(), xy, pdf.id.to_numpy(), r)
    exp = set(zip(oa, ob))
    assert set(zip(got.q_id, got.r_id)) == exp
    assert set(zip(plain.q_id, plain.r_id)) == exp


def test_knn_grid_correct_on_skew(spark):
    cfg = EngineConfig(resolution=5)
    df, pdf = _skewed(spark, n=1500)
    got = knn_join_grid(df, df, 5, cfg).toPandas()
    oq, on, _ = K.knn(
        pdf[["x", "y"]].to_numpy(), pdf[["x", "y"]].to_numpy(), pdf.id.to_numpy(), 5
    )
    assert set(zip(got.q_id, got.r_id)) == set(zip(pdf.id.to_numpy()[oq], on))


def test_knn_grid_adaptive_split_on_hot_group(spark, cfg, blobs):
    """hot_group_rows small enough that every group splits to fine
    cells: result identical to the unsplit plan and the oracle."""
    import numpy as np

    from ffcl_spark.kernels import neighbors as NK
    from ffcl_spark.operators.knn_kernel import knn_join_grid

    df, pdf = blobs
    k = 4
    split = knn_join_grid(df, df, k, cfg, hot_group_rows=10).toPandas()
    plain = knn_join_grid(df, df, k, cfg, hot_group_rows=None).toPandas()
    key = lambda p: set(zip(p.q_id, p.r_id, p.dist))
    assert key(split) == key(plain)
    xy = pdf[["x", "y"]].to_numpy()
    qi, ni, dd = NK.knn(xy, xy, pdf.id.to_numpy(), k)
    exp = {(pdf.id.to_numpy()[q], n, d) for q, n, d in zip(qi, ni, dd)}
    assert key(split) == exp


def test_knn_grid_adaptive_split_single_hot_cell(spark, cfg):
    """Pathological skew: most points in ONE fine cell. The split plan
    must stay exact (ring-1 refs of every query present per group)."""
    import numpy as np
    import pandas as pd

    from ffcl_spark.kernels import neighbors as NK
    from ffcl_spark.operators.knn_kernel import knn_join_grid

    rng = np.random.default_rng(3)
    hot = rng.uniform(0.0, 0.4, size=(400, 2))  # inside one fine cell
    rest = rng.uniform(-12.0, 12.0, size=(100, 2))
    xy = np.vstack([hot, rest])
    pdf = pd.DataFrame({"id": np.arange(len(xy)), "x": xy[:, 0], "y": xy[:, 1]})
    df = spark.createDataFrame(pdf)
    k = 5
    got = knn_join_grid(df, df, k, cfg, hot_group_rows=50).toPandas()
    qi, ni, dd = NK.knn(xy, xy, pdf.id.to_numpy(), k)
    exp = {(int(q), int(n_), d) for q, n_, d in zip(qi, ni, dd)}
    assert set(zip(got.q_id, got.r_id, got.dist)) == exp
