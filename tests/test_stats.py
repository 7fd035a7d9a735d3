import numpy as np
from pyspark.sql import functions as F

from ffcl_spark.operators import stats as ST


def test_feature_stats_matches_numpy(spark, cfg, blobs):
    df, pdf = blobs
    row = ST.feature_stats(df).collect()[0]
    assert abs(row["mean_x"] - pdf.x.mean()) < 1e-9
    assert abs(row["var_y"] - pdf.y.var(ddof=1)) < 1e-9
    per_cell = ST.feature_stats(df, cfg).toPandas()
    assert per_cell.n.sum() == len(pdf)


def test_argmax_variance_axis(spark, blobs):
    df, pdf = blobs
    stretched = df.select("id", (F.col("x") * 100).alias("x"), "y")
    assert ST.argmax_variance_axis(stretched, sampling_rate=1.0) == "x"


def silhouette_oracle(xy, labels):
    n = len(xy)
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    s = np.zeros(n)
    for i in range(n):
        own = (labels == labels[i]) & (np.arange(n) != i)
        if not own.any():
            continue
        a = d[i][own].mean()
        bs = [
            d[i][labels == l].mean()
            for l in set(labels)
            if l != labels[i]
        ]
        if not bs:
            continue
        b = min(bs)
        s[i] = (b - a) / max(a, b)
    return s


def test_silhouette_matches_oracle(spark, blobs):
    df, pdf = blobs
    labels_pdf = pdf.copy()
    labels_pdf["label"] = (labels_pdf.x > 0).astype(int)
    labels = spark.createDataFrame(labels_pdf[["id", "label"]])
    got = ST.silhouette_samples(df, labels).toPandas().sort_values("id")
    exp = silhouette_oracle(
        pdf.sort_values("id")[["x", "y"]].to_numpy(),
        labels_pdf.sort_values("id")["label"].to_numpy(),
    )
    assert np.allclose(got.silhouette.to_numpy(), exp, atol=1e-9)
    score = ST.silhouette_score(df, labels)
    assert abs(score - exp.mean()) < 1e-9


def test_silhouette_bounded_exact_when_cap_covers(spark, blobs):
    """The bounded scale path with cap >= every cluster keeps the whole
    reference side -- same values as the exact form (up to float
    summation order: the size join changes the avg() fold order)."""
    df, pdf = blobs
    labels_pdf = pdf.copy()
    labels_pdf["label"] = (labels_pdf.x > 0).astype(int)
    labels = spark.createDataFrame(labels_pdf[["id", "label"]])
    exact = ST.silhouette_samples(df, labels).toPandas().sort_values("id")
    capped = (
        ST.silhouette_samples(df, labels, max_refs_per_cluster=len(pdf))
        .toPandas()
        .sort_values("id")
    )
    assert np.allclose(
        exact.silhouette.to_numpy(), capped.silhouette.to_numpy(), atol=1e-12
    )
    assert np.allclose(
        exact.a.to_numpy(), capped.a.to_numpy(), atol=1e-12, equal_nan=True
    )
    assert np.allclose(
        exact.b.to_numpy(), capped.b.to_numpy(), atol=1e-12, equal_nan=True
    )


def test_silhouette_bounded_sampled_estimator(spark, blobs):
    """With a small cap the sampled estimator stays close to the exact
    metric on well-separated labels, is deterministic under a fixed
    seed, and its pair volume is actually bounded."""
    df, pdf = blobs
    labels_pdf = pdf.copy()
    labels_pdf["label"] = (labels_pdf.x > 0).astype(int)
    labels = spark.createDataFrame(labels_pdf[["id", "label"]])
    cap = 60
    s1 = ST.silhouette_samples(df, labels, max_refs_per_cluster=cap).toPandas()
    s2 = ST.silhouette_samples(df, labels, max_refs_per_cluster=cap).toPandas()
    a1 = s1.sort_values("id").silhouette.to_numpy()
    assert np.array_equal(a1, s2.sort_values("id").silhouette.to_numpy())
    exact = ST.silhouette_score(df, labels)
    assert abs(float(s1.silhouette.mean()) - exact) < 0.15


def test_feature_stats_exact_invariant_and_correct(spark, cfg, blobs):
    """Fixed-point stats: bit-identical across parallelism (the float
    form is summation-order dependent), and numerically equal to the
    NumPy mean/var within fixed-point quantization."""
    import numpy as np

    from ffcl_spark.operators.stats import feature_stats_exact

    df, pdf = blobs
    a = feature_stats_exact(df.repartition(1), cfg).toPandas().sort_values("cell").reset_index(drop=True)
    b = feature_stats_exact(df.repartition(13), cfg).toPandas().sort_values("cell").reset_index(drop=True)
    assert a.equals(b)  # bit-identical, not just close
    g = feature_stats_exact(df).toPandas().iloc[0]
    q = np.round(pdf[["x", "y"]].to_numpy() * 1000)  # the operator's quantization
    assert abs(g.mean_x - q[:, 0].mean() / 1000) < 1e-12
    assert abs(g.var_x - q[:, 0].var(ddof=1) / 1e6) < 1e-9
    assert g.n == len(pdf)


def test_silhouette_small_cap_keeps_every_cluster(spark, blobs):
    # round-4 ADVICE: independent per-cluster sampling could empty a
    # cluster's ref sample, silently biasing a(i)/b(i) (NULL → 0.0) and
    # dropping clusters from the b(i) min. The guarantee keeps the two
    # smallest ids of every cluster, so even cap=1 leaves every
    # ≥2-point cluster represented: no point of a multi-point cluster
    # may have a NULL a or b (i.e. silhouette exactly 0.0 by the NULL
    # branch), and the estimator mean stays in a sane band.
    import pandas as pd
    from pyspark.sql import functions as F

    from ffcl_spark.operators import stats as ST

    df, pdf = blobs
    labels = df.select("id", (F.col("id") % 3).alias("label"))
    got = ST.silhouette_samples(df, labels, max_refs_per_cluster=1).toPandas()
    assert not got["a"].isna().any()
    assert not got["b"].isna().any()
    # deterministic across reruns
    again = ST.silhouette_samples(df, labels, max_refs_per_cluster=1).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True),
        again.sort_values("id").reset_index(drop=True),
    )
