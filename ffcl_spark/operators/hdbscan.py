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
from ffcl_spark.operators.boruvka import minimum_spanning_tree, mst_edges_local


def hdbscan(
    points: DataFrame,
    cfg: EngineConfig,
    k_nearest_neighbors: int = 1,
    min_cluster_size: int = 5,
    allow_single_cluster: bool = True,
    local_cutoff: int = 0,
    features_col: str | None = None,
    ckpt_dir: str | None = None,
) -> DataFrame:
    """(id, label, is_noise): HDBSCAN flat labels, canonical (min
    member id per cluster), noise label 0 with ``is_noise`` true —
    the explicit flag disambiguates a cluster whose min member id IS
    the noise sentinel (ids may legitimately start at 0).
    ``features_col``: n-D ``array<double>`` input (reference
    n-features contract) — routed through the n-D MST. ``ckpt_dir``:
    round-resumable MST phase (see ``minimum_spanning_tree``)."""
    core_k = k_nearest_neighbors if k_nearest_neighbors > 1 else None
    edges = mst_edges_local(
        minimum_spanning_tree(
            points, cfg, core_k=core_k, local_cutoff=local_cutoff,
            features_col=features_col, ckpt_dir=ckpt_dir,
        )
    )
    # the MST spans every point, so its endpoints ARE the id universe —
    # no separate all-ids collect (the edge list is the O(n) driver
    # artifact this pipeline outputs by contract)
    if edges:
        ids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    else:
        ids = [r["id"] for r in points.select("id").limit(2).collect()]
    labels = hdbscan_labels(ids, edges, min_cluster_size, allow_single_cluster)
    spark = points.sparkSession
    id_sql = points.schema["id"].dataType.simpleString()
    rows = [
        (i, labels[i] if labels[i] is not None else _zero(ids), labels[i] is None)
        for i in ids
    ]
    return spark.createDataFrame(
        rows, schema=f"id {id_sql}, label {id_sql}, is_noise boolean"
    )


def _zero(ids):
    """Noise sentinel in the id's type (0, or "0" for string ids)."""
    return "0" if ids and isinstance(ids[0], str) else 0


def single_linkage_cut(
    points: DataFrame,
    cfg: EngineConfig,
    cut_level: float,
    min_cluster_size: int = 1,
    local_cutoff: int = 0,
) -> DataFrame:
    """Flat single-linkage clustering at ``cut_level`` over the plain-
    distance MST (reference ``SingleLinkageClusterTree.hpp:151-175``).
    Returns (id, label, is_noise); noise label 0 with is_noise true."""
    edges = mst_edges_local(minimum_spanning_tree(points, cfg, local_cutoff=local_cutoff))
    if edges:
        ids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    else:
        ids = [r["id"] for r in points.select("id").limit(2).collect()]
    root = single_linkage_tree(ids, edges)
    labels = cut_tree(root, cut_level, min_cluster_size) if root else {i: None for i in ids}
    spark = points.sparkSession
    id_sql = points.schema["id"].dataType.simpleString()
    rows = [
        (i, labels[i] if labels[i] is not None else _zero(ids), labels[i] is None)
        for i in ids
    ]
    return spark.createDataFrame(
        rows, schema=f"id {id_sql}, label {id_sql}, is_noise boolean"
    )
