"""Temporal joins over event tables: as-of join and band (interval)
join — the time-axis analogues of the engine's spatial radius/kNN
joins, and the canonical operators Spark's built-in join surface
lacks.

The reference has no temporal operators (its only non-equi join
semantics are distance ``<`` and component ``!=`` predicates —
SURVEY.md §2.3); these are training-data-pipeline extensions (task
brief: "as-of join, range join" as the archetypal custom operators).

Scale design
------------
``asof_join`` is the union + running-``last`` plan: tag both sides,
union, one shuffle on the key columns, and a single ordered window
scan per key that carries the most recent right-side payload forward.
No point-wise subquery, no per-key collect, no Python. Cost is one
shuffle + one sort of |L|+|R| rows — the standard distributed as-of
shape (Flink's event-time join and DuckDB's ASOF JOIN lower to the
same scan). A key whose row count exceeds a task is the same hot-key
exposure as any window; mitigate upstream by splitting the time range
per key (the band-join bucketing below) when a single key dominates.

``band_join`` is the grid plan of the spatial radius join transposed
to time: right rows are bucketed once at the band width, left rows
probe the (at most two) buckets their band can reach via an exploded
bucket-sequence equi-join, and the exact band predicate filters the
candidates. Candidate count is O(rows in band + rows in the probed
buckets), never all-pairs; AQE handles residual bucket skew.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "band_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tie_col: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the nearest right row with the same
    key and ``right_ts <= left_ts`` (``backward``) or
    ``right_ts >= left_ts`` (``forward``), inclusive of equality.

    ``right_cols`` — right payload columns to carry (default: all
    non-key, non-ts columns); emitted as ``<name><suffix>`` plus the
    matched timestamp as ``<right_ts><suffix>``.

    ``tie_col`` — deterministic tie-break among right rows sharing the
    match timestamp: backward picks the LARGEST tie value, forward the
    SMALLEST (both are "the scan-adjacent row", and both are exactly
    reproducible by a ``LIMIT 1`` oracle). Without it the pick among
    exact-duplicate timestamps is plan-dependent, the same caveat as
    the reference's traversal-order kNN ties (StaticBuffer.hpp:169).

    ``tolerance_s`` — optional maximum |left_ts - right_ts| in
    seconds; matches farther than this become NULL (the row is kept:
    left outer semantics throughout).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(key_cols)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_cols = list(right_cols)
    if tie_col is not None and tie_col not in right.columns:
        raise ValueError(f"tie_col {tie_col!r} not in right columns")

    payload = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c).alias(c) for c in right_cols]
    )
    left_struct = F.struct(*[F.col(c).alias(c) for c in left.columns])
    tie_r = F.col(tie_col) if tie_col is not None else F.lit(0)

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tie_r.alias("__tie"),
        payload.alias("__payload"),
        F.lit(None).cast(
            left.select(left_struct.alias("s")).schema["s"].dataType
        ).alias("__lrow"),
    )
    l = left.select(  # noqa: E741
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        left_struct.alias("__lrow"),
    )

    if direction == "backward":
        # scan order: time ascending; right rows precede left rows at
        # equal ts (inclusive match); among equal right ts the largest
        # tie is scanned last and wins last(ignorenulls)
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    else:
        # scan order: time descending, so "carry forward" = the
        # smallest right ts >= left ts; right still precedes left at
        # equal ts; smallest tie scanned last and wins
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tie").desc()]

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)

    out = (
        l.unionByName(r)
        .withColumn("__m", matched)
        .where(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        # exact int64 micros (admits TIMESTAMP_NTZ; UTC session)
        gap = F.abs(
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col("__m.__mts").cast("timestamp"))
        )
        tol_us = int(round(float(tolerance_s) * 1_000_000))
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tol_us), F.col("__m"))
        )
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("__m.__mts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 0.0,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with equal keys and
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` (inclusive
    band edges). Inner-join semantics; every right column rides along
    suffixed.

    Plan: right rows are hashed once into time buckets of width
    = band length; each left row probes the <= 2 buckets its band
    overlaps (exploded bucket sequence), candidates arrive through a
    plain (keys, bucket) equi-join, and the exact band predicate is a
    codegen filter. The time twin of ``search.radius_join``'s cell
    grid.
    """
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    keys = list(key_cols)
    width_us = max(int(round((upper_s - lower_s) * 1_000_000)), 1)
    lo_us = int(round(lower_s * 1_000_000))
    hi_us = int(round(upper_s * 1_000_000))

    # cast("timestamp") admits TIMESTAMP_NTZ inputs (epoch-consistent:
    # the engine pins the session timezone to UTC — session.py)
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    r = right.select(
        *keys,
        F.floor(r_us / F.lit(width_us)).alias("__bucket"),
        r_us.alias("__rus"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in keys
        ],
    )
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    l = left.withColumn(  # noqa: E741
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lo_us)) / F.lit(width_us)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(width_us)),
            )
        ),
    ).withColumn("__lus", l_us)

    out = l.join(r, keys + ["__bucket"]).where(
        (F.col("__rus") >= F.col("__lus") + F.lit(lo_us))
        & (F.col("__rus") <= F.col("__lus") + F.lit(hi_us))
    )
    return out.drop("__bucket", "__lus", "__rus")


def trajectory_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
    metric: str = "euclidean",
    quantize: float | None = None,
) -> DataFrame:
    """Per-entity trajectory summary over a (user, ts, x, y) point
    stream: visit count, total path length (sum of consecutive-hop
    distances in time order), longest single hop, tight bbox, and
    dwell duration in seconds.

    ``metric="euclidean"`` treats (x, y) as planar; ``"haversine"``
    treats them as (lat, lon) in degrees and reports path lengths in
    metres along great circles — either way the hop is one IEEE column
    expression inside the same plan. One shuffle (partition by user),
    one window scan for the lag hops, one partial aggregation —
    nothing N-dependent on the driver. Equal timestamps order by
    (x, y) so the result is deterministic at any parallelism.

    ``quantize`` switches path accounting to exact integers: each hop
    is floored to ``quantize``-sized units (metres for haversine) and
    ``path_len``/``max_hop`` come back as BIGINT counts of those
    units. Integer accumulation is order-independent, so the totals
    are bitwise reproducible at any parallelism — and across engines,
    provided no hop sits within float slop of a unit boundary (audit
    the margin for your data; the driver gate pins a 400× cushion at
    1 km units)."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(x_col), F.col(y_col))
    )
    if metric == "haversine":
        from ffcl_spark.operators.geo import haversine_m

        hop = haversine_m(
            F.lag(x_col).over(w), F.lag(y_col).over(w),
            F.col(x_col), F.col(y_col),
        )
    elif metric == "euclidean":
        dx = F.col(x_col) - F.lag(x_col).over(w)
        dy = F.col(y_col) - F.lag(y_col).over(w)
        hop = F.sqrt(dx * dx + dy * dy)
    else:
        raise ValueError(f"unknown metric: {metric!r}")
    zero: object = 0.0
    if quantize is not None:
        hop = F.floor(hop / F.lit(float(quantize))).cast("long")
        zero = 0
    hopped = df.select(
        user_col,
        ts_col,
        x_col,
        y_col,
        hop.alias("_hop"),
    )
    return hopped.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.coalesce(F.sum("_hop"), F.lit(zero)).alias("path_len"),
        F.coalesce(F.max("_hop"), F.lit(zero)).alias("max_hop"),
        F.min(x_col).alias("x_min"),
        F.max(x_col).alias("x_max"),
        F.min(y_col).alias("y_min"),
        F.max(y_col).alias("y_max"),
        (
            # cast("timestamp") admits TIMESTAMP_NTZ inputs, same as
            # the as-of/band joins (exact under the engine's pinned
            # UTC session timezone; a no-op for TIMESTAMP)
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )
