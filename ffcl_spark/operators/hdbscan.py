"""HDBSCAN pipeline: distributed Borůvka (mutual reachability) →
driver-side dendrogram → condensed-tree selection.

Reference ``HDBSCAN.hpp:91-116``: (a) core distances (k NN, self
counted), (b) Borůvka MST under mutual reachability, (c) single-
linkage tree, (d) condensed tree + excess-of-mass flat extraction.
Defaults mirror the reference options (``HDBSCAN.hpp:26-63``):
k_nearest_neighbors=1 (plain distances), min_cluster_size=5,
allow_single_cluster=True.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ffcl_spark.config import EngineConfig
from ffcl_spark.kernels.hierarchy import cut_tree, hdbscan_labels, single_linkage_tree
from ffcl_spark.operators.boruvka import minimum_spanning_tree


def hdbscan(
    points: DataFrame,
    cfg: EngineConfig,
    k_nearest_neighbors: int = 1,
    min_cluster_size: int = 5,
    allow_single_cluster: bool = True,
    local_cutoff: int = 0,
) -> DataFrame:
    """(id, label): HDBSCAN flat labels, canonical (min member id per
    cluster), noise 0."""
    ids = [r["id"] for r in points.select("id").collect()]
    core_k = k_nearest_neighbors if k_nearest_neighbors > 1 else None
    edges = minimum_spanning_tree(points, cfg, core_k=core_k, local_cutoff=local_cutoff)
    labels = hdbscan_labels(ids, edges, min_cluster_size, allow_single_cluster)
    spark = points.sparkSession
    id_sql = points.schema["id"].dataType.simpleString()
    return spark.createDataFrame(
        [(i, labels[i]) for i in ids], schema=f"id {id_sql}, label {id_sql}"
    )


def single_linkage_cut(
    points: DataFrame,
    cfg: EngineConfig,
    cut_level: float,
    min_cluster_size: int = 1,
    local_cutoff: int = 0,
) -> DataFrame:
    """Flat single-linkage clustering at ``cut_level`` over the plain-
    distance MST (reference ``SingleLinkageClusterTree.hpp:151-175``)."""
    ids = [r["id"] for r in points.select("id").collect()]
    edges = minimum_spanning_tree(points, cfg, local_cutoff=local_cutoff)
    root = single_linkage_tree(ids, edges)
    labels = cut_tree(root, cut_level, min_cluster_size) if root else {i: 0 for i in ids}
    spark = points.sparkSession
    id_sql = points.schema["id"].dataType.simpleString()
    return spark.createDataFrame(
        [(i, labels[i]) for i in ids], schema=f"id {id_sql}, label {id_sql}"
    )
