"""Distributed Borůvka minimum spanning tree (exact), with the
mutual-reachability variant used by HDBSCAN.

Reference ``BoruvkasAlgorithm.hpp:239-460``: per round, every
component finds its minimum outgoing edge via per-point nearest-
neighbor queries that skip same-component candidates
(``WithUnionFind.hpp:47-77``); all found edges merge at once
(union-find); repeat until one component remains.

Distributed form — exact, with the reference's prune translated:

- per round, every point gets a k-NN list (``knn_join_grid``). If the
  list contains any cross-component candidate, the closest such is
  that point's *exact* nearest-other-component neighbor (everything
  closer is in the list and same-component).
- points whose whole list is same-component only matter if they could
  beat their component's current best candidate; their unseen
  neighbors are all farther than the list's k-th distance, so the
  component-level prune is ``kth ≥ comp_best`` (for mutual
  reachability: ``max(core_p, kth) ≥ comp_best``, since
  mreach ≥ max(core_p, d)). Survivors escalate with doubled k —
  exactly the buffer-bound prune of ``KDNodeView.hpp:235-243`` lifted
  to components.
- the ≤ n_components found edges are merged on the driver
  (``UnionFind.hpp`` semantics); components at least halve per round →
  O(log n) rounds.
- the id → component map is a *persisted DataFrame*, never collected:
  each round it is updated by a broadcast join against the (≤ 2×merges
  rows) relabel map derived from the merged edges. Only edges and the
  relabel map ever reach the driver — the driver's memory footprint is
  O(MST edges), which is the size of the requested output itself.

Edge weights: Euclidean distance, or mutual reachability
``max(core_a, core_b, dist)`` (``BoruvkasAlgorithm.hpp:307-308``) when
``core_k`` is given. Ties broken by (weight, src, dst) so the MST is
deterministic even on tie-heavy lattices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffcl_spark.config import EngineConfig
from ffcl_spark.operators.dbscan import UnionFind
from ffcl_spark.operators.knn_kernel import knn_join_grid
from ffcl_spark.operators.search import core_distances


def minimum_spanning_tree(
    points: DataFrame,
    cfg: EngineConfig,
    core_k: int | None = None,
    k0: int = 8,
    local_cutoff: int = 0,
    features_col: str | None = None,
    axes: tuple[int, int] = (0, 1),
) -> list[tuple]:
    """Exact MST edges [(src, dst, weight), ...] (n−1 edges, collected:
    the MST is O(n) rows — driver-sized by definition for the scales
    where a *tree over every point* is itself the requested output).

    ``local_cutoff``: inputs at or below this size skip the distributed
    rounds and run the identical-semantics local Prim kernel — the
    small-relation local-execution optimization (each Borůvka round
    costs O(1) Spark jobs of latency; below a few thousand points the
    latency dwarfs the O(n²) local solve).

    ``features_col``: when given, points carry an n-D
    ``array<double>`` feature column instead of (x, y) — the reference
    n-features contract (``KDTree.hpp:137``). Neighbor queries route
    through the n-D ring-expansion join (grid on ``axes``); distances
    are the full n-D metric, bit-equal between the distributed fold and
    the local Prim kernel.
    """
    import numpy as np

    if features_col is None:
        pts = points.select("id", "x", "y").persist()

        def _knn(q, r_, k_):
            return knn_join_grid(q, r_, k_, cfg)

        def _core(p, k_):
            return core_distances(p, k_, cfg)

        def _matrix(pdf):
            return pdf[["x", "y"]].to_numpy()
    else:
        from ffcl_spark.operators.search_nd import core_distances_nd, knn_join_nd

        pts = points.select("id", F.col(features_col).alias("features")).persist()

        def _knn(q, r_, k_):
            return knn_join_nd(q, r_, k_, cfg, "features", axes)

        def _core(p, k_):
            return core_distances_nd(p, k_, cfg, "features", axes)

        def _matrix(pdf):
            return np.array(pdf["features"].tolist(), dtype=np.float64)

    n = pts.count()
    if n <= 1:
        return []
    if n <= local_cutoff:
        from ffcl_spark.kernels.mst_local import prim_mst

        pdf = pts.toPandas().sort_values("id").reset_index(drop=True)
        return prim_mst(_matrix(pdf), pdf["id"].to_numpy(), core_k=core_k)

    core = None
    if core_k is not None:
        core = _core(pts, core_k).persist()
        core.count()

    # distributed component map (id -> comp), never collected. Plain
    # (non-hinted) joins everywhere it is used: AQE broadcasts it while
    # small-enough and shuffles otherwise — at 100× the map is n rows
    # and must not be forced through the driver or a broadcast.
    spark = points.sparkSession
    id_type = points.schema["id"].dataType
    id_sql = id_type.simpleString()
    comp_df = pts.select("id", F.col("id").alias("comp")).persist()
    comp_df.count()
    n_comp = n
    edges: list[tuple] = []
    base_nn = None  # k0-NN lists, shared across rounds

    while n_comp > 1:
        k = min(k0, n)
        pend = pts
        best: dict = {}  # q_comp -> (w, src_id, dst_id, dst_comp)
        first_pass = True
        while True:
            if first_pass:
                # the base k-NN lists are component-independent — computed
                # once before round 1 and reused every round
                if base_nn is None:
                    base_nn = (
                        _knn(pts, pts, k)
                        .where(F.col("q_id") != F.col("r_id"))
                        .persist()
                    )
                    base_nn.count()
                nn = base_nn
            else:
                nn = _knn(pend, pts, k).where(F.col("q_id") != F.col("r_id"))
            first_pass = False
            nn = (
                nn.join(
                    comp_df.select(F.col("id").alias("q_id"), F.col("comp").alias("q_comp")),
                    "q_id",
                )
                .join(
                    comp_df.select(F.col("id").alias("r_id"), F.col("comp").alias("r_comp")),
                    "r_id",
                )
            )
            if core is not None:
                nn = (
                    nn.join(
                        core.select(F.col("id").alias("q_id"), F.col("core_distance").alias("core_q")), "q_id"
                    )
                    .join(
                        core.select(F.col("id").alias("r_id"), F.col("core_distance").alias("core_r")), "r_id"
                    )
                    .withColumn("w", F.greatest("core_q", "core_r", "dist"))
                )
            else:
                nn = nn.withColumn("w", F.col("dist"))

            cross = nn.where(F.col("q_comp") != F.col("r_comp"))
            # exact per-point best cross edge, then per-component best
            cand = (
                cross.groupBy("q_comp")
                .agg(F.min(F.struct("w", "q_id", "r_id", "r_comp")).alias("e"))
                .select("q_comp", "e.w", "e.q_id", "e.r_id", "e.r_comp")
                .collect()
            )
            for row in cand:
                cur = best.get(row["q_comp"])
                e = (row["w"], row["q_id"], row["r_id"], row["r_comp"])
                if cur is None or e[:3] < cur[:3]:
                    best[row["q_comp"]] = e

            if k >= n:
                break
            # escalation: points whose whole list was same-component AND
            # whose unseen-neighbor lower bound could beat their
            # component's best
            per_q = nn.groupBy("q_id", "q_comp").agg(
                F.max("dist").alias("kth"),
                F.max(F.when(F.col("q_comp") != F.col("r_comp"), 1).otherwise(0)).alias("has_cross"),
                F.max(F.col("core_q") if core is not None else F.lit(0.0)).alias("core_q"),
            )
            best_rows = [(c, e[0]) for c, e in best.items()]
            if best_rows:
                # plain join: AQE broadcasts while the per-component
                # best list is small, shuffles when it is O(n) (round 1)
                best_df = spark.createDataFrame(
                    best_rows, schema=f"q_comp {id_sql}, comp_best double"
                )
                per_q = per_q.join(best_df, "q_comp", "left")
            else:
                per_q = per_q.withColumn("comp_best", F.lit(None).cast("double"))
            if core is not None:
                # mreach: even a point WITH a cross candidate can be
                # beaten by an unseen farther point with smaller core —
                # escalate whenever the unseen lower bound
                # max(core_p, kth) could still beat the component best
                lb = F.greatest("core_q", "kth")
                pend_cond = F.col("comp_best").isNull() | (lb < F.col("comp_best"))
            else:
                # distance: a found cross candidate is the point's exact
                # nearest-other-component neighbor; only all-same-comp
                # lists can improve
                pend_cond = (F.col("has_cross") == 0) & (
                    F.col("comp_best").isNull() | (F.col("kth") < F.col("comp_best"))
                )
            pend_ids = per_q.where(pend_cond).select(F.col("q_id").alias("id"))
            pend = pts.join(F.broadcast(pend_ids), "id", "left_semi")
            if pend.isEmpty():
                break
            k = min(n, k * 2)

        # merge all found edges on a FRESH per-round union-find over
        # component labels only (≤ 2×|round edges| entries), then push
        # the relabel map back into the distributed component map
        round_edges = set()
        for q_comp, (w, src, dst, r_comp) in best.items():
            a, b = (src, dst) if src < dst else (dst, src)
            ca, cb = (q_comp, r_comp) if src < dst else (r_comp, q_comp)
            round_edges.add((w, a, b, ca, cb))
        uf = UnionFind()
        merged_any = False
        n_merges = 0
        for w, a, b, ca, cb in sorted(round_edges):
            if uf.find(ca) != uf.find(cb):
                uf.merge(ca, cb)
                edges.append((a, b, w))
                merged_any = True
                n_merges += 1
        if not merged_any:
            break
        # canonical new label per merged group = min old comp label
        touched = {c for *_, ca, cb in round_edges for c in (ca, cb)}
        canon: dict = {}
        for c in touched:
            r = uf.find(c)
            if r not in canon or c < canon[r]:
                canon[r] = c
        mapping = [(c, canon[uf.find(c)]) for c in touched if canon[uf.find(c)] != c]
        if mapping:
            relabel = spark.createDataFrame(
                mapping, schema=f"comp {id_sql}, newc {id_sql}"
            )
            new_comp = (
                comp_df.join(F.broadcast(relabel), "comp", "left")
                .select("id", F.coalesce("newc", "comp").alias("comp"))
                .persist()
            )
            new_comp.count()
            comp_df.unpersist()
            comp_df = new_comp
        n_comp -= n_merges

    comp_df.unpersist()
    pts.unpersist()
    if core is not None:
        core.unpersist()
    if base_nn is not None:
        base_nn.unpersist()
    return edges
