import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from ffcl_spark.operators.temporal import asof_join, band_join


def _events(seed: int, n: int, n_users: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 3_600_000_000, size=n).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "ts": ts,
            "value": np.round(rng.uniform(0, 100, size=n), 2),
        }
    )


def _asof_oracle(lp, rp, direction="backward", tolerance_s=None):
    rows = []
    for _, l in lp.iterrows():
        cand = rp[rp.user_id == l.user_id]
        if direction == "backward":
            cand = cand[cand.ts <= l.ts]
            cand = cand.sort_values(["ts", "event_id"], ascending=[False, False])
        else:
            cand = cand[cand.ts >= l.ts]
            cand = cand.sort_values(["ts", "event_id"], ascending=[True, True])
        m = cand.iloc[0] if len(cand) else None
        if m is not None and tolerance_s is not None:
            if abs((l.ts - m.ts).total_seconds()) > tolerance_s:
                m = None
        rows.append(
            (
                l.event_id,
                None if m is None else m.event_id,
                None if m is None else m.ts,
            )
        )
    return (
        pd.DataFrame(rows, columns=["event_id", "event_id_r", "ts_r"])
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _run_asof(spark, lp, rp, **kw):
    out = asof_join(
        spark.createDataFrame(lp),
        spark.createDataFrame(rp),
        ["user_id"],
        tie_col="event_id",
        **kw,
    )
    return (
        out.select("event_id", "event_id_r", "ts_r")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_bruteforce(spark, direction):
    lp, rp = _events(1, 120), _events(2, 90)
    got = _run_asof(spark, lp, rp, direction=direction)
    want = _asof_oracle(lp, rp, direction=direction)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_equal_ts_inclusive_and_tie_break(spark):
    # three right rows share the exact left timestamp -> inclusive
    # match, deterministic pick: backward = largest event_id,
    # forward = smallest event_id
    t = np.datetime64("2024-01-01T01:00:00", "us")
    lp = pd.DataFrame(
        {"event_id": [100], "user_id": [3], "ts": [t], "value": [1.0]}
    )
    rp = pd.DataFrame(
        {
            "event_id": [10, 11, 12],
            "user_id": [3, 3, 3],
            "ts": [t, t, t],
            "value": [5.0, 6.0, 7.0],
        }
    )
    back = _run_asof(spark, lp, rp, direction="backward")
    fwd = _run_asof(spark, lp, rp, direction="forward")
    assert back.event_id_r.tolist() == [12]
    assert fwd.event_id_r.tolist() == [10]


def test_asof_tolerance_nulls_far_matches(spark):
    lp, rp = _events(3, 80), _events(4, 60)
    tol = 120.0
    got = _run_asof(spark, lp, rp, direction="backward", tolerance_s=tol)
    want = _asof_oracle(lp, rp, direction="backward", tolerance_s=tol)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # tolerance must actually bite on this fixture
    assert got.event_id_r.isna().sum() > _asof_oracle(lp, rp).event_id_r.isna().sum()


def test_asof_no_match_keeps_left_row(spark):
    lp = _events(5, 40)
    rp = _events(6, 30)
    # right side entirely after every left row -> backward finds nothing
    rp["ts"] = rp["ts"] + np.timedelta64(365, "D")
    got = _run_asof(spark, lp, rp, direction="backward")
    assert len(got) == len(lp)
    assert got.event_id_r.isna().all()


def test_asof_result_invariant_across_parallelism(spark):
    lp, rp = _events(7, 150), _events(8, 110)
    a = _run_asof(spark, lp.copy(), rp.copy())
    b = _run_asof(
        spark,
        lp.sample(frac=1.0, random_state=9).reset_index(drop=True),
        rp.sample(frac=1.0, random_state=10).reset_index(drop=True),
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def _band_oracle(lp, rp, lo, hi):
    rows = []
    for _, l in lp.iterrows():
        cand = rp[
            (rp.user_id == l.user_id)
            & (rp.ts >= l.ts + pd.Timedelta(seconds=lo))
            & (rp.ts <= l.ts + pd.Timedelta(seconds=hi))
        ]
        rows.extend((l.event_id, r.event_id) for _, r in cand.iterrows())
    return (
        pd.DataFrame(rows, columns=["event_id", "event_id_r"])
        .sort_values(["event_id", "event_id_r"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("lo,hi", [(0.0, 300.0), (-120.0, 120.0), (60.0, 60.0)])
def test_band_join_matches_bruteforce(spark, lo, hi):
    lp, rp = _events(11, 120), _events(12, 150)
    if lo == hi:
        # zero-width band: only EXACT ts offsets match — plant some
        planted = lp.head(10).copy()
        planted["event_id"] = planted["event_id"] + 10_000
        planted["ts"] = planted["ts"] + np.timedelta64(int(lo), "s")
        rp = pd.concat([rp, planted], ignore_index=True)
    got = (
        band_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            ["user_id"],
            lower_s=lo,
            upper_s=hi,
        )
        .select("event_id", "event_id_r")
        .toPandas()
        .sort_values(["event_id", "event_id_r"])
        .reset_index(drop=True)
    )
    want = _band_oracle(lp, rp, lo, hi)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0  # the band must be non-trivial on this fixture


def test_band_join_edges_inclusive(spark):
    t = np.datetime64("2024-01-01T00:00:00", "us")
    lp = pd.DataFrame({"event_id": [0], "user_id": [1], "ts": [t], "value": [0.0]})
    rp = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "ts": [
                t + np.timedelta64(60, "s"),
                t + np.timedelta64(120, "s"),
                t + np.timedelta64(59, "s"),
                t + np.timedelta64(121, "s"),
            ],
            "value": [0.0, 0.0, 0.0, 0.0],
        }
    )
    got = (
        band_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            ["user_id"],
            lower_s=60.0,
            upper_s=120.0,
        )
        .select("event_id_r")
        .toPandas()
    )
    assert sorted(got.event_id_r.tolist()) == [1, 2]


def test_temporal_plans_are_jvm_only(spark):
    lp, rp = _events(13, 50), _events(14, 50)
    l, r = spark.createDataFrame(lp), spark.createDataFrame(rp)
    for df in (
        band_join(l, r, ["user_id"], lower_s=0.0, upper_s=600.0),
        asof_join(l, r, ["user_id"], tie_col="event_id"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # no per-row or Arrow Python stages


# ---------------------------------------------------------- trajectories


def _walk_pdf(n_users=6, steps=40, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for u in range(n_users):
        x, y = rng.uniform(-10, 10, 2)
        t = t0
        for i in range(steps - (u % 3)):  # ragged lengths
            t = t + pd.Timedelta(seconds=int(rng.integers(1, 300)))
            x += rng.normal(0, 0.5)
            y += rng.normal(0, 0.5)
            rows.append((u, t, x, y))
    return pd.DataFrame(rows, columns=["user_id", "ts", "x", "y"])


def test_trajectory_stats_matches_numpy(spark):
    from ffcl_spark.operators.temporal import trajectory_stats

    pdf = _walk_pdf()
    got = (
        trajectory_stats(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    for u, grp in pdf.sort_values(["ts", "x", "y"]).groupby("user_id"):
        hops = np.sqrt(np.diff(grp.x.values) ** 2 + np.diff(grp.y.values) ** 2)
        g = got.loc[u]
        assert g.n_points == len(grp)
        assert g.path_len == pytest.approx(hops.sum(), rel=1e-12)
        assert g.max_hop == hops.max()
        assert (g.x_min, g.x_max) == (grp.x.min(), grp.x.max())
        assert g.duration_us == (grp.ts.max() - grp.ts.min()).value // 1000


def test_trajectory_stats_single_point_and_parallelism(spark):
    from ffcl_spark.operators.temporal import trajectory_stats

    pdf = _walk_pdf(n_users=3, steps=2, seed=5)
    single = pd.DataFrame(
        [(99, pd.Timestamp("2024-01-01"), 1.0, 2.0)],
        columns=["user_id", "ts", "x", "y"],
    )
    df = spark.createDataFrame(pd.concat([pdf, single], ignore_index=True))
    a = trajectory_stats(df.repartition(1)).toPandas().sort_values("user_id")
    b = trajectory_stats(df.repartition(16)).toPandas().sort_values("user_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    lone = a[a.user_id == 99].iloc[0]
    assert (lone.n_points, lone.path_len, lone.max_hop, lone.duration_us) == (1, 0.0, 0.0, 0)


def test_trajectory_stats_accepts_timestamp_ntz(spark):
    """Parquet timestamps commonly load as TIMESTAMP_NTZ (the events
    table does); duration math must admit them like the as-of/band
    joins do — regression for the unix_micros type mismatch."""
    from ffcl_spark.operators.temporal import trajectory_stats

    pdf = _walk_pdf(n_users=2, steps=4, seed=11)
    df = spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = trajectory_stats(df).toPandas().set_index("user_id").sort_index()
    ref = (
        trajectory_stats(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got.equals(ref)


def test_trajectory_stats_haversine_matches_numpy(spark):
    from ffcl_spark.kernels.geo import haversine_np
    from ffcl_spark.operators.temporal import trajectory_stats

    rng = np.random.default_rng(23)
    rows = []
    for u in range(4):
        ts = pd.date_range("2024-03-01", periods=6, freq="h")
        lat = rng.uniform(-80, 80, 6)
        lon = rng.uniform(-179, 179, 6)
        rows.append(
            pd.DataFrame({"user_id": u, "ts": ts, "x": lat, "y": lon})
        )
    pdf = pd.concat(rows, ignore_index=True)
    got = (
        trajectory_stats(spark.createDataFrame(pdf), metric="haversine")
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    for u, grp in pdf.sort_values(["ts", "x", "y"]).groupby("user_id"):
        hops = haversine_np(
            grp.x.values[:-1], grp.y.values[:-1], grp.x.values[1:], grp.y.values[1:]
        )
        g = got.loc[u]
        assert g.n_points == len(grp)
        assert g.path_len == pytest.approx(hops.sum(), rel=1e-9)
        assert g.max_hop == pytest.approx(hops.max(), rel=1e-9)
        assert (g.x_min, g.x_max) == (grp.x.min(), grp.x.max())


def test_trajectory_stats_unknown_metric_raises(spark):
    from ffcl_spark.operators.temporal import trajectory_stats

    with pytest.raises(ValueError):
        trajectory_stats(spark.range(1).toDF("user_id"), metric="chebyshev")


def test_trajectory_stats_quantized_exact_integers(spark):
    """quantize=q floors each hop to q-sized units BEFORE aggregation
    (sum of floors, not floor of sum) and returns BIGINT path/max —
    order-independent accounting, bitwise stable at any parallelism."""
    from ffcl_spark.kernels.geo import haversine_np
    from ffcl_spark.operators.temporal import trajectory_stats

    rng = np.random.default_rng(31)
    rows = []
    for u in range(5):
        ts = pd.date_range("2024-03-01", periods=7, freq="h")
        rows.append(
            pd.DataFrame(
                {
                    "user_id": u,
                    "ts": ts,
                    "x": rng.uniform(-80, 80, 7),
                    "y": rng.uniform(-179, 179, 7),
                }
            )
        )
    pdf = pd.concat(rows, ignore_index=True)
    df = spark.createDataFrame(pdf)
    got = (
        trajectory_stats(df, metric="haversine", quantize=1000.0)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert got.path_len.dtype == np.int64 and got.max_hop.dtype == np.int64
    for u, grp in pdf.sort_values(["ts", "x", "y"]).groupby("user_id"):
        hops = np.floor(
            haversine_np(
                grp.x.values[:-1], grp.y.values[:-1],
                grp.x.values[1:], grp.y.values[1:],
            )
            / 1000.0
        ).astype(np.int64)
        g = got.loc[u]
        assert g.path_len == hops.sum()
        assert g.max_hop == hops.max()
    lo = (
        trajectory_stats(df.repartition(16), metric="haversine", quantize=1000.0)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert lo.equals(got)
