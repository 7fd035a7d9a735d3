"""Distributed connected components + label emission.

The emission path is the scale story of the hierarchy operators
(round-3 VERDICT task #3): labels must come from a CC pass over the
edge DataFrame plus broadcast cluster metadata, never an n-row
driver→cluster upload. The 1M-point test drives `_emit_labels` on a
synthetic 1M-node edge DataFrame whose expected partition is known in
closed form — nothing point-sized crosses the driver boundary in
either direction (assertions are aggregations)."""

from pyspark.sql import functions as F

from ffcl_spark.operators.components import connected_components


def test_connected_components_known_graph(spark):
    # two components {1,2,3,9} (min 1) and {5,7} (min 5); 4 isolated
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 9)], "id long")
    edges = spark.createDataFrame(
        [(2, 3), (9, 2), (1, 9), (7, 5)], "src long, dst long"
    )
    got = {r["id"]: r["comp"] for r in connected_components(ids, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 4: 4, 5: 5, 7: 5}


def test_connected_components_chain_min_propagates(spark):
    # a 64-node path rooted at 0 — the pointer-jumping worst case
    # (diameter = n); must converge to the single min label
    n = 64
    ids = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    comp = connected_components(ids, edges)
    assert comp.where(F.col("comp") != 0).count() == 0
    assert comp.count() == n


def test_connected_components_no_edges(spark):
    ids = spark.range(10).select("id")
    edges = spark.createDataFrame([], "src long, dst long")
    comp = connected_components(ids, edges)
    assert comp.where(F.col("comp") != F.col("id")).count() == 0


def test_emit_labels_one_million_points(spark):
    """1M points, 62.5k chains of 16; the cluster plan removes 5 mid-
    chain edges and selects every chain-start label — labels for all
    1M points are emitted distributed (CC + broadcast join), with the
    5 orphaned half-chains as noise."""
    from ffcl_spark.operators.hdbscan import _emit_labels

    n, chain = 1_000_000, 16
    points = spark.range(n).select("id")
    edges_df = (
        spark.range(n)
        .where((F.col("id") + 1) % chain != 0)
        .select(
            F.col("id").alias("src"),
            (F.col("id") + 1).alias("dst"),
            F.lit(1.0).alias("w"),
        )
    )
    half = chain // 2
    removed = [(k * chain + half - 1, k * chain + half) for k in range(5)]
    selected = [k * chain for k in range(n // chain)]
    out = _emit_labels(points, edges_df, removed, selected).persist()
    try:
        assert out.count() == n
        noise = out.where("is_noise")
        # 5 orphaned half-chains, min ids k*chain+half — not selected,
        # hence noise (label 0)
        assert noise.count() == 5 * half
        assert noise.where(F.col("label") != 0).count() == 0
        per_label = (
            out.where(~F.col("is_noise")).groupBy("label").count().groupBy("count")
            .agg(F.count(F.lit(1)).alias("n_labels"))
            .collect()
        )
        sizes = {r["count"]: r["n_labels"] for r in per_label}
        assert sizes == {chain: n // chain - 5, half: 5}
    finally:
        out.unpersist()
