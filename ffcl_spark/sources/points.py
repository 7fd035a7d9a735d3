"""Extract the points projection from interleaved documents.

The narrow ``(pid, doc_id, offset, x, y)`` DataFrame is the engine's
working set — the analogue of the reference's flat row-major sample
matrix + index array (``KDTree.hpp:180-186``; row identity = doc_id +
span offset instead of an integer row index). Extraction is a JVM-side
explode + regexp on ``media_ref`` — no Python in the path — and column
pruning means parquet scans only read ``doc_id, spans``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.config import EngineConfig
from ffcl_spark.functions import cells as C

X_RE = r"[?&]x=(-?[0-9.]+)"
Y_RE = r"[?&]y=(-?[0-9.]+)"


def media_points(docs: DataFrame) -> DataFrame:
    """One row per media span: (doc_id, offset, x, y).

    The coordinate parse uses substring_index on the fixed
    ``?x=...&y=...`` layout — an order of magnitude cheaper than a
    regexp at 10^9-row scale, same extracted values (the regexp form is
    kept above as documentation of the accepted grammar)."""
    s = F.explode("spans").alias("span")
    ref = F.col("span.media_ref")
    x_str = F.substring_index(F.substring_index(ref, "?x=", -1), "&y=", 1)
    y_str = F.substring_index(ref, "&y=", -1)
    return (
        docs.select("doc_id", s)
        .where(F.col("span.kind") == "media")
        .select(
            F.concat_ws("#", "doc_id", F.col("span.offset").cast("string")).alias("id"),
            "doc_id",
            F.col("span.offset").alias("offset"),
            x_str.cast("double").alias("x"),
            y_str.cast("double").alias("y"),
        )
    )


def with_cell(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    return points.withColumn("cell", C.cell_id(F.col("x"), F.col("y"), cfg))


def cell_stats(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Per-cell count + tight bbox — the analogue of the reference's
    per-node AABB (``Interval.hpp:109-142`` make_tight_bound), used
    broadcast-side for cell-pair pruning and salting decisions."""
    return with_cell(points, cfg).groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


def cell_rollup(points: DataFrame, cfg: EngineConfig, min_res: int = 0) -> DataFrame:
    """Multi-resolution cell statistics — ``cell_stats`` at every grid
    level from ``cfg.resolution`` down to ``min_res`` in ONE data scan
    (the hypertable-rollup shape).

    The points are aggregated once at the finest resolution; every
    coarser level re-aggregates those *partials* (count/bbox compose
    associatively — sum of sums, min of mins) after shifting the cell
    coordinates up the quad tree. The finest stats frame is persisted
    so the per-level branches read ≤ 4^resolution cached rows instead
    of rescanning the corpus; the handle rides on the result for
    ``plans.cache.release`` (one-shot caller convention).

    Output: (res, cell, n, x_min, x_max, y_min, y_max); ``cell`` is the
    packed id AT ITS OWN resolution, so every row is probe-able with
    the same ``cell_id`` arithmetic used everywhere else.
    """
    from ffcl_spark.plans.cache import carry

    finest = cell_stats(points, cfg).persist()
    levels = [finest.withColumn("res", F.lit(cfg.resolution))]
    for res in range(cfg.resolution - 1, min_res - 1, -1):
        shift = cfg.resolution - res
        ix = F.shiftright(C.cell_ix(F.col("cell")), shift)
        iy = F.shiftright(C.cell_iy(F.col("cell")), shift)
        up = (
            F.lit(res).cast("long") * F.lit(1 << C.RES_SHIFT)
            + ix * F.lit(C.AXIS_MOD)
            + iy
        )
        levels.append(
            finest.groupBy(up.alias("cell"))
            .agg(
                F.sum("n").alias("n"),
                F.min("x_min").alias("x_min"),
                F.max("x_max").alias("x_max"),
                F.min("y_min").alias("y_min"),
                F.max("y_max").alias("y_max"),
            )
            .withColumn("res", F.lit(res))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return carry(
        out.select("res", "cell", "n", "x_min", "x_max", "y_min", "y_max"), finest
    )


def index_tree(points: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Hierarchical index snapshot — the engine analogue of the
    reference's recursive kd-tree serialization (``KDTree.hpp:384-464``
    emits per-node options, cut axis, bounds, points): one row per
    NODE, i.e. per occupied grid cell at every depth 0..cfg.resolution,
    with (depth, cell, parent_cell, n, tight bbox, cut_axis).

    - built from ONE leaf-level aggregation over the points, then
      depth-by-depth rollups over CELL rows (sum counts, min/max
      bounds) — points are scanned once, every level above costs
      O(occupied cells);
    - ``cut_axis`` is the MaximumSpread axis-selection policy
      (``AxisSelectionPolicy.hpp``) evaluated on the node's tight
      bound: 0 (x) when the x-extent ≥ y-extent, else 1 — the axis the
      reference's kd-tree would cut at this node;
    - parent linkage is the bit-shift relation of the packed cell id
      (child ix >> 1 = parent ix), so the tree is reconstructable from
      the flat rows; ``plans.checkpoint`` can persist it as the index
      metadata table, and a dendrogram-sized top can be exported to
      nested JSON driver-side.
    """
    leaf = cell_stats(points, cfg).withColumn(
        "depth", F.lit(cfg.resolution)
    )
    levels = [leaf]
    cur = leaf
    for d in range(cfg.resolution - 1, -1, -1):
        pcell = (
            F.lit(d).cast("long") * F.lit(1 << C.RES_SHIFT)
            + F.shiftright(C.cell_ix(F.col("cell")), 1) * F.lit(C.AXIS_MOD)
            + F.shiftright(C.cell_iy(F.col("cell")), 1)
        )
        cur = (
            cur.select(
                pcell.alias("cell"), "n", "x_min", "x_max", "y_min", "y_max"
            )
            .groupBy("cell")
            .agg(
                F.sum("n").alias("n"),
                F.min("x_min").alias("x_min"),
                F.max("x_max").alias("x_max"),
                F.min("y_min").alias("y_min"),
                F.max("y_max").alias("y_max"),
            )
            .withColumn("depth", F.lit(d))
        )
        levels.append(cur)
    tree = levels[0]
    for lv in levels[1:]:
        tree = tree.unionByName(lv)
    # root sentinel -1, not NULL: a nullable BIGINT column degrades to
    # float64 in Arrow/pandas consumers, which cannot represent the
    # 2^52-magnitude packed ids exactly
    parent = F.when(
        F.col("depth") > 0,
        (F.col("depth") - 1).cast("long") * F.lit(1 << C.RES_SHIFT)
        + F.shiftright(C.cell_ix(F.col("cell")), 1) * F.lit(C.AXIS_MOD)
        + F.shiftright(C.cell_iy(F.col("cell")), 1),
    ).otherwise(F.lit(-1).cast("long"))
    cut = F.when(
        (F.col("x_max") - F.col("x_min")) >= (F.col("y_max") - F.col("y_min")),
        F.lit(0),
    ).otherwise(F.lit(1))
    return tree.select(
        "depth",
        "cell",
        parent.alias("parent_cell"),
        "n",
        "x_min",
        "x_max",
        "y_min",
        "y_max",
        cut.cast("int").alias("cut_axis"),
    )


def tree_to_json(tree_rows: list, max_depth: int | None = None) -> dict:
    """Driver-side nested-JSON export of an ``index_tree`` snapshot —
    the recursive form of the reference serialization. ``tree_rows`` =
    collected Rows (dendrogram-sized top levels only; the flat
    DataFrame is the scale artifact)."""
    by_parent: dict = {}
    nodes: dict = {}
    for r in tree_rows:
        if max_depth is not None and r["depth"] > max_depth:
            continue
        nodes[r["cell"]] = {
            "depth": r["depth"],
            "cell": r["cell"],
            "n": r["n"],
            "bound": [r["x_min"], r["y_min"], r["x_max"], r["y_max"]],
            "cut_axis": r["cut_axis"],
            "children": [],
        }
        by_parent.setdefault(r["parent_cell"], []).append(r["cell"])
    for pc, kids in by_parent.items():
        if pc in nodes:
            nodes[pc]["children"] = sorted(kids)
    roots = [nodes[c] for c in by_parent.get(-1, [])]

    def attach(node):
        node["children"] = [attach(dict(nodes[c])) for c in node["children"] if c in nodes]
        return node

    return {"roots": [attach(dict(r)) for r in sorted(roots, key=lambda n: n["cell"])]}


# --------------------------------------------------- point index at rest

def write_point_index(points: DataFrame, path: str, cfg: EngineConfig) -> None:
    """Persist the spatial index at rest: the (id, doc_id, offset,
    x, y) points written as parquet PARTITIONED BY their grid cell,
    plus a JSON sidecar with the grid parameters. Extract + index
    once, query many times — a box/radius probe's covered cells become
    partition filters, so the scan reads only those cells' files. The
    spatial member of the at-rest trilogy (`similarity.write_ann_index`
    for vectors, `ranking.write_postings` for text). Layout is
    ``cell=<id>/epoch=<n>`` with the initial build at ``epoch=0`` so
    :func:`append_point_index` can add batches under the same
    partition scheme."""
    import json

    # repartition on the partition column first: without it every
    # write task emits one file per cell it touches (tasks × cells
    # tiny files); with it each cell is exactly one file and a probe's
    # task count equals its covered-cell count (oversized cells still
    # split at read via maxPartitionBytes row groups)
    with_cell(points, cfg).repartition("cell").withColumn(
        "epoch", F.lit(0)
    ).write.mode("overwrite").partitionBy("cell", "epoch").parquet(
        f"{path}/points"
    )
    meta = {
        "x0": cfg.x0,
        "y0": cfg.y0,
        "domain": cfg.domain,
        "resolution": cfg.resolution,
    }
    with open(f"{path}/meta.json".replace("file:", ""), "w") as f:
        json.dump(meta, f)


def read_point_index(spark, path: str, cells: list[int] | None = None):
    """Load a point index written by ``write_point_index``. With
    ``cells``, the scan carries a cell IN-filter over the partition
    column (PartitionFilters — only those cells' files are read).
    Returns (points_with_cell, cfg)."""
    import json

    with open(f"{path}/meta.json".replace("file:", "")) as f:
        m = json.load(f)
    cfg = EngineConfig(
        x0=m["x0"], y0=m["y0"], domain=m["domain"], resolution=m["resolution"]
    )
    df = spark.read.parquet(f"{path}/points").drop("epoch")
    if cells is not None:
        df = df.where(F.col("cell").isin([int(c) for c in cells]))
    return df, cfg


def cover_cells(
    x_lo: float, y_lo: float, x_hi: float, y_hi: float, cfg: EngineConfig
) -> list[int]:
    """Driver twin of the cell packing: every grid cell whose square
    intersects the box (clamped at the domain edge — the kernel's
    ``axis_index`` clamping). Bounded by the probe's area in cells —
    the 2-D analogue of the probe-term bucket list. The ONE canonical
    driver-side cover computation (``operators.tiles`` aliases it)."""
    import numpy as np

    from ffcl_spark.kernels import grid as G

    ix0 = int(G.axis_index(np.array([x_lo]), cfg.x0, cfg.cell_size, cfg.grid_n)[0])
    ix1 = int(G.axis_index(np.array([x_hi]), cfg.x0, cfg.cell_size, cfg.grid_n)[0])
    iy0 = int(G.axis_index(np.array([y_lo]), cfg.y0, cfg.cell_size, cfg.grid_n)[0])
    iy1 = int(G.axis_index(np.array([y_hi]), cfg.y0, cfg.cell_size, cfg.grid_n)[0])
    base = cfg.resolution * (1 << 52)
    return [
        base + ix * (1 << 26) + iy
        for ix in range(ix0, ix1 + 1)
        for iy in range(iy0, iy1 + 1)
    ]


def box_search_indexed(
    spark, path: str, x_lo: float, y_lo: float, x_hi: float, y_hi: float
) -> DataFrame:
    """Box search against the index at rest: covered cells prune the
    scan, then the exact inclusive box predicate filters — value-
    identical to ``search.box_search`` on the fly (pinned)."""
    pts, cfg = read_point_index(spark, path)
    covered = cover_cells(x_lo, y_lo, x_hi, y_hi, cfg)
    return (
        pts.where(F.col("cell").isin(covered))
        .where(
            F.col("x").between(x_lo, x_hi) & F.col("y").between(y_lo, y_hi)
        )
        .drop("cell")
    )


def radius_probe_indexed(
    spark, path: str, qx: float, qy: float, radius: float
) -> DataFrame:
    """All stored points with strict ``dist < radius`` of one probe
    point (reference Ball.hpp semantics), reading only the cells the
    ball's bounding box covers."""
    pts, cfg = read_point_index(spark, path)
    covered = cover_cells(qx - radius, qy - radius, qx + radius, qy + radius, cfg)
    d = F.sqrt(
        (F.col("x") - F.lit(qx)) * (F.col("x") - F.lit(qx))
        + (F.col("y") - F.lit(qy)) * (F.col("y") - F.lit(qy))
    )
    return (
        pts.where(F.col("cell").isin(covered))
        .withColumn("dist", d)
        .where(F.col("dist") < radius)
        .drop("cell")
    )


def knn_probe_indexed(spark, path: str, qx: float, qy: float, k: int) -> DataFrame:
    """k nearest stored points of one probe point against the index at
    rest — the reference's headline single-tree kNN query
    (``TreeTraverser.hpp:218-269``) over the cell-partitioned store.

    Ring expansion in cell space: load the probe's cell, then widening
    Chebyshev rings, each read partition-pruned to ONLY that ring's
    files. Terminates when the current k-th distance is strictly
    inside the loaded square's boundary (the engine-wide twin of the
    sibling-visit rule ``KDNodeView.hpp:235-243`` — expand while
    ``kth ≥ boundary`` so an unloaded equal-distance tie can never be
    missed), or when the whole grid is loaded. Ties break
    deterministically by (dist, id). Returns (id, x, y, dist, rank);
    bytes read scale with the rings the answer needs, not the corpus.
    """
    pts, cfg = read_point_index(spark, path)
    grid_n = 1 << cfg.resolution
    cs = cfg.cell_size
    base = cfg.resolution * (1 << 52)

    def clamp(i: int) -> int:
        return max(0, min(grid_n - 1, i))

    qix, qiy = clamp(int((qx - cfg.x0) // cs)), clamp(int((qy - cfg.y0) // cs))

    d = F.sqrt(
        (F.col("x") - F.lit(qx)) * (F.col("x") - F.lit(qx))
        + (F.col("y") - F.lit(qy)) * (F.col("y") - F.lit(qy))
    )
    best: list = []  # (dist, id, x, y), lexicographic → deterministic ties
    loaded: list[int] = []
    max_r = grid_n  # covers the grid from any (clamped) probe cell
    for r in range(max_r + 1):
        ring = [
            base + ix * (1 << 26) + iy
            for ix in range(clamp(qix - r), clamp(qix + r) + 1)
            for iy in range(clamp(qiy - r), clamp(qiy + r) + 1)
            if max(abs(ix - qix), abs(iy - qiy)) == r
        ]
        if ring:
            loaded.extend(ring)
            rows = (
                pts.where(F.col("cell").isin(ring))
                .select("id", "x", "y", d.alias("dist"))
                .orderBy("dist", "id")
                .limit(k)
                .collect()
            )
            best.extend((row["dist"], row["id"], row["x"], row["y"]) for row in rows)
            best.sort()
            best = best[:k]
        # min distance from the probe to OUTSIDE the loaded square
        # (sides clamped at the domain edge have nothing beyond them)
        edges = []
        if qix - r > 0:
            edges.append(qx - (cfg.x0 + (qix - r) * cs))
        if qix + r < grid_n - 1:
            edges.append((cfg.x0 + (qix + r + 1) * cs) - qx)
        if qiy - r > 0:
            edges.append(qy - (cfg.y0 + (qiy - r) * cs))
        if qiy + r < grid_n - 1:
            edges.append((cfg.y0 + (qiy + r + 1) * cs) - qy)
        if not edges:
            break  # whole grid loaded
        boundary = min(edges)
        if len(best) >= k and best[k - 1][0] < boundary:
            break

    from pyspark.sql import types as T

    rows = [
        (rec[1], rec[2], rec[3], rec[0], i + 1) for i, rec in enumerate(best)
    ]
    # id keeps the STORED column's type (string doc#offset ids in the
    # production extraction, longs in fixtures)
    schema = T.StructType(
        [
            T.StructField("id", pts.schema["id"].dataType),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("dist", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def append_point_index(points: DataFrame, path: str, epoch: int) -> None:
    """Incremental maintenance of the point index at rest: write a new
    batch of points under ``(cell, epoch)`` partitions. Replaying an
    epoch (crash/retry) rewrites exactly its own ``epoch=<id>``
    subpartitions and nothing else (dynamic partition overwrite — the
    same idempotent-epoch discipline as ``streaming.dedup``'s
    admitted-corpus stores). Probes are unchanged: their cell
    partition filters prune across every epoch."""
    from ffcl_spark.plans.epoch_write import overwrite_epoch_partitions

    _, cfg = read_point_index(points.sparkSession, path)
    overwrite_epoch_partitions(
        with_cell(points, cfg)
        .repartition("cell")
        .withColumn("epoch", F.lit(int(epoch))),
        f"{path}/points",
        "cell",
        "epoch",
    )


def compact_point_index(spark, path: str) -> None:
    """Collapse all epochs of a point index into one (small-files
    maintenance after many appends). Probe results are unchanged."""
    from ffcl_spark.plans.epoch_write import compact_epochs

    compact_epochs(spark, f"{path}/points", "cell")


def pip_probe_indexed(spark, path: str, ring: list[tuple[float, float]]) -> DataFrame:
    """All stored points inside one polygon (even–odd rule, closed
    ``ring`` of (x, y) vertices), reading only the cells the polygon's
    bounding box covers — the fourth probe of the index at rest (box,
    radius, kNN, polygon). The inside test is the same JVM column
    expression as ``operators.tiles.nearest_tile`` (no Python rows)."""
    if ring[0] != ring[-1]:
        ring = list(ring) + [ring[0]]
    pts, cfg = read_point_index(spark, path)
    xs, ys = [p[0] for p in ring], [p[1] for p in ring]
    covered = cover_cells(min(xs), min(ys), max(xs), max(ys), cfg)
    edges = F.array(
        *[
            F.struct(
                F.lit(float(a[0])).alias("ax"),
                F.lit(float(a[1])).alias("ay"),
                F.lit(float(b[0])).alias("bx"),
                F.lit(float(b[1])).alias("by"),
            )
            for a, b in zip(ring[:-1], ring[1:])
        ]
    )
    x, y = F.col("x"), F.col("y")

    def crosses(e):
        straddle = (e["ay"] > y) != (e["by"] > y)
        xint = e["ax"] + (y - e["ay"]) / (e["by"] - e["ay"]) * (e["bx"] - e["ax"])
        return straddle & (x < xint)

    inside = F.size(F.filter(edges, crosses)) % 2 == 1
    return pts.where(F.col("cell").isin(covered)).where(inside).drop("cell")
