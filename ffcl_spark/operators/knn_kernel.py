"""Scale-path kNN join: per-cell vectorized NumPy kernel.

The all-JVM ring-expansion join (``operators.search.knn_join``)
materializes every candidate pair through the shuffle + window — fine
at moderate candidate fan-in, wasteful when cells are dense. This
operator keeps the same two-level decomposition (grid = the global
kd-tree levels) but runs the leaf scan as a *cogrouped Arrow kernel*:

- refs are replicated to the cells they can serve (their Chebyshev-
  ``ring`` neighborhood — replication factor (2·ring+1)², one shuffle);
- queries shuffle once to their own cell;
- per cell, a NumPy block scan computes exact top-k for every query in
  the cell against all serving refs (float64, same IEEE operation
  order as the SQL path → bit-equal distances);
- the FFCL sibling-prune termination (``KDNodeView.hpp:235-243``) is
  evaluated *inside* the kernel: a query whose k-th distance is
  strictly below the guaranteed-covered radius is done; the (rare)
  rest fall back to the iterative JVM ring expansion starting past the
  pre-searched ring.

Resolution should put O(max(48, 3k)) points per cell
(``knn_resolution``) — the analogue of FFCL's bucket_size leaf cutoff
(``KDTree.hpp:60-67``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ffcl_spark.config import EngineConfig
from ffcl_spark.functions import cells as C
from ffcl_spark.kernels import grid as G
from ffcl_spark.kernels.neighbors import topk_rows

PAIR_BUDGET = 4_000_000  # elements per distance block inside the kernel


def knn_resolution(n_rows: int, k: int, cfg: EngineConfig) -> EngineConfig:
    """Deepest resolution keeping ≈max(48, 3k) rows per cell."""
    target = max(48, 3 * k)
    res = 0
    while res < 14 and n_rows / (4 ** (res + 1)) >= target:
        res += 1
    return cfg.with_resolution(res)


def knn_join_kernel(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    cfg: EngineConfig,
    ring: int = 1,
) -> DataFrame:
    """(q_id, r_id, dist, rank) — exact kNN, FFCL semantics, ties by
    r_id. Same contract as ``search.knn_join``; different physical
    plan (grouped-kernel leaf scan instead of pair materialization).
    """
    id_type = queries.schema["id"].dataType
    q = queries.select(
        F.col("id").alias("q_id"),
        F.col("x").alias("q_x"),
        F.col("y").alias("q_y"),
        C.cell_id(F.col("x"), F.col("y"), cfg).alias("cell"),
    )
    r = refs.select(
        F.col("id").alias("r_id"),
        F.col("x").alias("r_x"),
        F.col("y").alias("r_y"),
        F.explode(
            C.neighbor_cells(C.cell_id(F.col("x"), F.col("y"), cfg), ring, cfg)
        ).alias("cell"),
    )

    out_schema = T.StructType(
        [
            T.StructField("q_id", id_type),
            T.StructField("r_id", refs.schema["id"].dataType),
            T.StructField("dist", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
            T.StructField("done", T.BooleanType()),
        ]
    )

    grid_n = cfg.grid_n

    def kernel(qpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0:
            return pd.DataFrame(
                {"q_id": [], "r_id": [], "dist": [], "rank": [], "done": []}
            ).astype({"rank": "int32", "done": "bool"})
        qx = qpdf["q_x"].to_numpy()
        qy = qpdf["q_y"].to_numpy()
        nq = len(qpdf)
        nr = len(rpdf)
        ix, iy = G.cell_ixy(qpdf["cell"].to_numpy())
        gr = G.guaranteed_radius(qx, qy, ix, iy, ring, cfg)
        covers_all = ring >= grid_n
        if nr == 0:
            # no serving refs: emit nothing — these queries fall out of
            # the done set and are picked up by the fallback expansion
            return pd.DataFrame(
                {"q_id": [], "r_id": [], "dist": [], "rank": [], "done": []}
            ).astype({"rank": "int32", "done": "bool"})
        # pre-sort refs by id → stable distance sort breaks ties by id
        order = np.argsort(rpdf["r_id"].to_numpy(), kind="stable")
        rx = rpdf["r_x"].to_numpy()[order]
        ry = rpdf["r_y"].to_numpy()[order]
        rids = rpdf["r_id"].to_numpy()[order]
        kk = min(k, nr)
        block = max(16, PAIR_BUDGET // max(nr, 1))
        out = []
        for s in range(0, nq, block):
            e = min(s + block, nq)
            dx = qx[s:e, None] - rx[None, :]
            dy = qy[s:e, None] - ry[None, :]
            d = dx * dx + dy * dy
            part, dd = topk_rows(d, kk)  # exact (distance, id) tie-break
            dd = np.sqrt(dd)
            kth = dd[:, -1]
            done = covers_all | ((kk >= k) & (kth < gr[s:e]))
            out.append(
                pd.DataFrame(
                    {
                        "q_id": np.repeat(qpdf["q_id"].to_numpy()[s:e], kk),
                        "r_id": rids[part].ravel(),
                        "dist": dd.ravel(),
                        "rank": np.tile(np.arange(1, kk + 1, dtype="int32"), e - s),
                        "done": np.repeat(done, kk),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    grouped = q.groupBy("cell").cogroup(r.groupBy("cell")).applyInPandas(
        kernel, out_schema
    )
    grouped = grouped.persist()
    done_rows = grouped.where(F.col("done")).select("q_id", "r_id", "dist", "rank")
    # pending = queries without a done result (covers the not-done flag
    # AND queries whose cell had zero serving refs)
    pend_q = queries.join(
        done_rows.select(F.col("q_id").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    if pend_q.count() == 0:
        return done_rows
    # fallback: iterative JVM ring expansion for the stragglers (their
    # count is tiny — dense areas always terminate in ring 1)
    from ffcl_spark.operators.search import knn_join

    rest = knn_join(pend_q, refs, k, cfg, start_ring=ring + 1)
    return done_rows.unionByName(rest)
