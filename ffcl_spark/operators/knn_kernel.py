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
    """Deepest resolution keeping ≈max(48, 3k) rows per cell.

    (r6 note: a finer target — max(12, 2k), 4× fewer candidate
    distances per query — was measured at the bench scale and was NOT
    faster: the grouped kernel is bounded by per-group/py-boundary
    overhead and output construction, not by the NumPy distance scan,
    and the 4× group count outweighed the saved flops. Kept at the
    r5 value; see OPTIMIZATION_r06.md.)"""
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
    checkpoint: bool = False,
) -> DataFrame:
    """(q_id, r_id, dist, rank) — exact kNN, FFCL semantics, ties by
    r_id. Same contract as ``search.knn_join``; different physical
    plan (grouped-kernel leaf scan instead of pair materialization).

    ``checkpoint``: see ``plans.cache`` — True for iterative callers
    (materialize + unpersist per call), False (default) keeps the
    kernel output persisted and hands it to the caller for release.
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
            # sqrt BEFORE ranking: the (dist, id) tie-break is defined
            # on the sqrt'd distance (sqrt rounding can create ties the
            # squared values don't have)
            d = np.sqrt(dx * dx + dy * dy)
            part, dd = topk_rows(d, kk)  # exact (distance, id) tie-break
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

    from ffcl_spark.plans.cache import carry

    grouped = q.groupBy("cell").cogroup(r.groupBy("cell")).applyInPandas(
        kernel, out_schema
    )
    grouped = grouped.persist()
    done_rows = grouped.where(F.col("done")).select("q_id", "r_id", "dist", "rank")
    if checkpoint:
        # iterative callers: materialize final rows off the cached
        # kernel output, then drop the cache — repeated calls must not
        # accumulate cached partitions
        done_rows = done_rows.localCheckpoint()
    # pending = queries without a done result (covers the not-done flag
    # AND queries whose cell had zero serving refs)
    pend_q = queries.join(
        done_rows.select(F.col("q_id").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    n_pend = pend_q.count()
    if checkpoint:
        grouped.unpersist()
    if n_pend == 0:
        pend_q.unpersist()
        return done_rows if checkpoint else carry(done_rows, grouped)
    # fallback: iterative JVM ring expansion for the stragglers (their
    # count is tiny — dense areas always terminate in ring 1)
    from ffcl_spark.operators.search import knn_join

    rest = knn_join(pend_q, refs, k, cfg, start_ring=ring + 1, checkpoint=checkpoint)
    pend_q.unpersist()
    out = done_rows.unionByName(rest)
    return out if checkpoint else carry(out, grouped, rest)


# ---------------------------------------------------------------------
# Two-level kernel: coarse groups outside, fine-grid candidates inside.


def _coarse_key_expr(ixc, iyc, gshift: int):
    return F.shiftleft(F.shiftright(ixc, gshift), 26) + F.shiftright(iyc, gshift)


def _plan_row_count(df: DataFrame) -> int | None:
    """Catalyst's row-count statistic when it is EXACT (materialized
    cache statistics); None otherwise. Never runs a job. Row-preserving
    wrappers (Project / SubqueryAlias — a column selection over a
    cached table, the common caller shape) are walked through, because
    the default size-only stats visitor drops rowCount at them."""
    try:
        node = df._jdf.queryExecution().optimizedPlan()
        for _ in range(8):
            rc = node.stats().rowCount()
            if rc.isDefined():
                return int(str(rc.get()))
            name = node.getClass().getSimpleName()
            if name in ("Project", "SubqueryAlias") and node.children().size() == 1:
                node = node.children().apply(0)
            else:
                break
    except Exception:  # pragma: no cover - py4j edge
        pass
    return None


def hot_coarse_groups(
    refs: DataFrame,
    cfg: EngineConfig,
    group_delta: int = 2,
    hot_group_rows: int = 2_000_000,
) -> list[int]:
    """Coarse group keys whose ref count exceeds ``hot_group_rows`` —
    ONE ref-set aggregation. Iterative callers (Borůvka escalation
    rounds, chunked pipelines) whose ref set is fixed compute this once
    and pass it to every ``knn_join_grid`` call via ``hot_groups``,
    instead of paying a full ref scan per call (round-3 ADVICE). The
    list is grid-bounded metadata (≤ #coarse cells), never point-sized."""
    if cfg.resolution < group_delta:
        return []
    # Catalyst row-count shortcut (r6): a cached/statistics-bearing ref
    # set whose TOTAL row count is at or below the hot threshold cannot
    # contain a hot group — skip the detection scan outright (one full
    # aggregation job per call otherwise; the bench pays it per rep).
    # Plan-only: hot classification never changes results, only the
    # physical grouping.
    rc = _plan_row_count(refs)
    if rc is not None and rc <= hot_group_rows:
        return []
    fr = C.cell_id(F.col("x"), F.col("y"), cfg)
    base = refs.select(fr.alias("fcell"))
    key = _coarse_key_expr(C.cell_ix(F.col("fcell")), C.cell_iy(F.col("fcell")), group_delta)
    return [
        row["g"]
        for row in (
            base.select(key.alias("g"))
            .groupBy("g")
            .count()
            .where(F.col("count") > hot_group_rows)
            .select("g")
            .collect()
        )
    ]


def knn_join_grid(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    cfg: EngineConfig,
    group_delta: int = 2,
    checkpoint: bool = False,
    hot_group_rows: int | None = 2_000_000,
    hot_groups: list[int] | None = None,
) -> DataFrame:
    """Scale-tuned kNN join: same contract/result as ``knn_join_kernel``
    but with a two-level decomposition that minimizes both shuffle
    volume and per-group overhead:

    - *outside*: grouping happens at the coarse resolution
      ``cfg.resolution - group_delta`` (16× fewer pandas groups at
      delta=2). Refs are replicated only to the coarse groups their
      fine ring-1 neighborhood touches — replication factor ≈
      1 + perimeter/area (~1.5) instead of the 9× of fine-cell
      cogrouping.
    - *inside*: the kernel buckets refs by fine cell (lexsort +
      searchsorted — the top levels of a local kd-tree) and scans each
      query fine-cell block against its 3×3 fine neighborhood with the
      vectorized leaf kernel (``topk_rows``: exact (dist, id) ties).

    Termination is the FFCL sibling-prune rule at fine ring 1
    (``KDNodeView.hpp:235-243``); stragglers fall back to the JVM
    ring-expansion join.

    Skew (``hot_group_rows``): one cheap ref-count aggregation finds
    coarse groups whose ref count exceeds the threshold; points of hot
    groups key by their FINE cell instead (adaptive group splitting —
    the engine's analogue of the reference's hot-node median split,
    ``KDTreeAlgorithms.hpp:157-223``), so a pathological hot spot
    becomes up-to-16 independently-sized Arrow tasks instead of one
    straggler. Refs near a hot region replicate to the fine groups
    their ring-1 neighborhood touches (~9×, but only there); the
    kernel and the termination rule are unchanged. ``None`` disables
    the stats pass. ``hot_groups``: a precomputed list from
    :func:`hot_coarse_groups` — iterative callers with a fixed ref set
    pass it to skip the per-call detection scan (round-3 ADVICE).

    ``checkpoint``: cache hand-off mode (see ``plans.cache``) — False
    (default, one-shot callers) returns a view over the persisted
    kernel output, no second materialization; True (iterative callers
    like Borůvka) checkpoints the final rows and unpersists before
    returning.
    """
    if cfg.resolution < group_delta:
        return knn_join_kernel(queries, refs, k, cfg, ring=1, checkpoint=checkpoint)
    id_type = queries.schema["id"].dataType
    gshift = group_delta
    n = cfg.grid_n

    FINE_FLAG = 1 << 53  # keeps fine-cell group keys disjoint from coarse keys

    fr = C.cell_id(F.col("x"), F.col("y"), cfg)
    r_base = refs.select(
        F.col("id").alias("r_id"),
        F.col("x").alias("r_x"),
        F.col("y").alias("r_y"),
        fr.alias("fcell"),
    )

    def coarse_key(ixc, iyc):
        return _coarse_key_expr(ixc, iyc, gshift)

    if hot_groups is not None:
        hot = list(hot_groups)
    elif hot_group_rows is not None:
        hot = hot_coarse_groups(refs, cfg, group_delta, hot_group_rows)
    else:
        hot = []

    def gkey(ixc, iyc):
        ck = coarse_key(ixc, iyc)
        if not hot:
            return ck
        return F.when(
            ck.isin(hot), F.shiftleft(ixc, 26) + iyc + F.lit(FINE_FLAG)
        ).otherwise(ck)

    fq = C.cell_id(F.col("x"), F.col("y"), cfg)
    q = queries.select(
        F.col("id").alias("q_id"),
        F.col("x").alias("q_x"),
        F.col("y").alias("q_y"),
        fq.alias("fcell"),
    ).withColumn(
        "grp", gkey(C.cell_ix(F.col("fcell")), C.cell_iy(F.col("fcell")))
    )

    # serving groups of a ref = group keys of its fine ring-1
    # neighborhood (distinct; with no hot groups this reduces to the
    # coarse parents — ~1.5× replication — and to ≤9 fine groups only
    # inside split hot regions)
    rix = C.cell_ix(F.col("fcell"))
    riy = C.cell_iy(F.col("fcell"))
    neigh_keys = []
    for dxx in (-1, 0, 1):
        for dyy in (-1, 0, 1):
            cx = F.greatest(F.lit(0), F.least(F.lit(n - 1), rix + dxx))
            cy = F.greatest(F.lit(0), F.least(F.lit(n - 1), riy + dyy))
            neigh_keys.append(gkey(cx, cy))
    r = (
        r_base.withColumn("grp", F.explode(F.array_distinct(F.array(*neigh_keys))))
        .drop("fcell")
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
    empty = pd.DataFrame(
        {"q_id": [], "r_id": [], "dist": [], "rank": [], "done": []}
    ).astype({"rank": "int32", "done": "bool"})

    def kernel(qpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        nq = len(qpdf)
        if nq == 0:
            return empty
        qx = qpdf["q_x"].to_numpy()
        qy = qpdf["q_y"].to_numpy()
        qids = qpdf["q_id"].to_numpy()
        qfx, qfy = G.cell_ixy(qpdf["fcell"].to_numpy())
        nr = len(rpdf)
        if nr == 0:
            # placeholder rows keep every query represented so the
            # pending check never needs an anti-join against queries
            return pd.DataFrame(
                {
                    "q_id": qids,
                    "r_id": qids,
                    "dist": np.full(nq, np.nan),
                    "rank": np.zeros(nq, dtype="int32"),
                    "done": np.zeros(nq, dtype=bool),
                }
            )
        # bucket refs by fine cell. Ids are ranked into integer codes
        # ONCE per group (one object sort) so all per-block tie-break
        # work is integer-only.
        rx = rpdf["r_x"].to_numpy()
        ry = rpdf["r_y"].to_numpy()
        rids = rpdf["r_id"].to_numpy()
        id_rank = np.empty(nr, dtype=np.int64)
        id_rank[np.argsort(rids, kind="stable")] = np.arange(nr)
        rfx = G.axis_index(rx, cfg.x0, cfg.cell_size, grid_n)
        rfy = G.axis_index(ry, cfg.y0, cfg.cell_size, grid_n)
        rkey = rfx * grid_n + rfy
        order = np.lexsort((id_rank, rkey))
        rx, ry, rids, rkey = rx[order], ry[order], rids[order], rkey[order]
        rcode = id_rank[order]

        qkey = qfx * grid_n + qfy
        qorder = np.argsort(qkey, kind="stable")
        bounds = np.nonzero(np.diff(qkey[qorder]))[0] + 1
        blocks = np.split(qorder, bounds)

        # accumulate flat numpy arrays; build ONE frame per group
        acc_q: list[np.ndarray] = []
        acc_r: list[np.ndarray] = []
        acc_d: list[np.ndarray] = []
        acc_rank: list[np.ndarray] = []
        acc_done: list[np.ndarray] = []
        for blk in blocks:
            a = int(qfx[blk[0]])
            b = int(qfy[blk[0]])
            slices = []
            for dxx in (-1, 0, 1):
                cx = a + dxx
                if cx < 0 or cx >= grid_n:
                    continue
                lo = np.searchsorted(rkey, cx * grid_n + max(0, b - 1), side="left")
                hi = np.searchsorted(rkey, cx * grid_n + min(grid_n - 1, b + 1), side="right")
                if hi > lo:
                    slices.append((lo, hi))
            if not slices:
                acc_q.append(qids[blk])
                acc_r.append(qids[blk])
                acc_d.append(np.full(len(blk), np.nan))
                acc_rank.append(np.zeros(len(blk), dtype="int32"))
                acc_done.append(np.zeros(len(blk), dtype=bool))
                continue
            cand = (
                np.arange(*slices[0])
                if len(slices) == 1
                else np.concatenate([np.arange(lo, hi) for lo, hi in slices])
            )
            # candidate columns in ascending id-code order (int sort)
            cid_order = np.argsort(rcode[cand], kind="stable")
            cand = cand[cid_order]
            crx, cry = rx[cand], ry[cand]
            bqx = qx[blk]
            bqy = qy[blk]
            kk = min(k, len(cand))
            dxm = bqx[:, None] - crx[None, :]
            dym = bqy[:, None] - cry[None, :]
            # sqrt before ranking — tie-break is on the final distance
            d = np.sqrt(dxm * dxm + dym * dym)
            part, dd = topk_rows(d, kk)
            gr = G.guaranteed_radius(bqx, bqy, np.full(len(blk), a), np.full(len(blk), b), 1, cfg)
            done = (grid_n <= 1) | ((kk >= k) & (dd[:, -1] < gr))
            acc_q.append(np.repeat(qids[blk], kk))
            acc_r.append(rids[cand[part.ravel()]])
            acc_d.append(dd.ravel())
            acc_rank.append(np.tile(np.arange(1, kk + 1, dtype="int32"), len(blk)))
            acc_done.append(np.repeat(done, kk))
        if not acc_q:
            return empty
        return pd.DataFrame(
            {
                "q_id": np.concatenate(acc_q),
                "r_id": np.concatenate(acc_r),
                "dist": np.concatenate(acc_d),
                "rank": np.concatenate(acc_rank),
                "done": np.concatenate(acc_done),
            }
        )

    from ffcl_spark.plans.cache import carry

    grouped = (
        q.groupBy("grp")
        .cogroup(r.groupBy("grp"))
        .applyInPandas(kernel, out_schema)
        .persist()
    )
    done_rows = grouped.where(F.col("done")).select("q_id", "r_id", "dist", "rank")
    if checkpoint:
        # iterative callers: checkpoint final rows off the cached
        # kernel output, then drop the cache — Borůvka calls this per
        # escalation round and must not accumulate cached partitions
        done_rows = done_rows.localCheckpoint()
    # every query is represented in `grouped` (placeholders for the
    # candidate-less case), so the pending check is a cached scan, no
    # join — the common case returns immediately. This isEmpty is the
    # action that materializes the kernel output into the cache; the
    # one-shot caller's own action then reads the cache (the r1-floor
    # plan — the unconditional localCheckpoint cost the headline join
    # ~1.5x in round 2).
    not_done = grouped.where(~F.col("done")).select("q_id")
    if not_done.isEmpty():
        if checkpoint:
            grouped.unpersist()
            return done_rows
        return carry(done_rows, grouped)
    from ffcl_spark.operators.search import knn_join

    pend_q = queries.join(
        not_done.distinct().withColumnRenamed("q_id", "id"), "id", "left_semi"
    ).localCheckpoint()
    if checkpoint:
        grouped.unpersist()
    rest = knn_join(pend_q, refs, k, cfg, start_ring=2, checkpoint=checkpoint)
    out = done_rows.unionByName(rest)
    return out if checkpoint else carry(out, grouped, rest)
