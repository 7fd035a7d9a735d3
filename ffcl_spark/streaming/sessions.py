"""Custom stateful streaming operator: event sessionization.

The task brief's streaming contract: custom stateful operators run via
``applyInPandasWithState`` (Arrow-batched state updates — never
per-row Python). Sessionization is the canonical one: events of a user
belong to one session while consecutive gaps stay ≤ ``gap``; a session
finalizes when the event-time watermark passes its end + gap.

Correctness model (late data): sessions are held in state — merged
with any late event inside the watermark horizon (including events
that BRIDGE two open sessions, which merge) — and emitted only when
the watermark proves no further event can extend them. The batch twin
(:func:`sessionize_batch`, a lag/cumsum window) is the oracle:
stream output == batch output on the same closed set (pytest).

State is O(open sessions per user) — bounded by the watermark horizon,
the same knob that bounds every streaming aggregation here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, sum_cents long"
)
# parallel arrays of open sessions (epoch microseconds)
STATE_SCHEMA = "starts array<long>, ends array<long>, ns array<int>, cents array<long>"

US = 1_000_000


def _merge_np(
    starts: np.ndarray,
    ends: np.ndarray,
    ns: np.ndarray,
    cents: np.ndarray,
    gap_us: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized interval merge under the gap rule — no per-event
    Python (a hot user's whole batch is NumPy sort + reduceat).
    Input in any order; output sorted by start."""
    order = np.lexsort((ends, starts))
    s, e, n, c = starts[order], ends[order], ns[order], cents[order]
    run_end = np.maximum.accumulate(e)
    brk = np.empty(len(s), dtype=bool)
    brk[0] = True
    brk[1:] = s[1:] - run_end[:-1] > gap_us
    heads = np.nonzero(brk)[0]
    return (
        s[heads],
        np.maximum.reduceat(e, heads),
        np.add.reduceat(n, heads),
        np.add.reduceat(c, heads),
    )


def _round_half_up_cents(values: np.ndarray) -> np.ndarray:
    """value·100 rounded half AWAY FROM ZERO — the rule of Spark's
    ``F.round`` and DuckDB's ``round``; numpy ``round()`` is half-to-
    even and diverges on exact half cents (ADVICE round-2 fix)."""
    v = values.astype(np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_cents) —
    finalized sessions only (append mode)."""
    gap_us = gap_minutes * 60 * US

    def fn(key, pdf_iter, state: GroupState):
        parts_s: list[np.ndarray] = []
        parts_e: list[np.ndarray] = []
        parts_n: list[np.ndarray] = []
        parts_c: list[np.ndarray] = []
        if state.exists:
            starts, ends, ns, cents = state.get
            parts_s.append(np.asarray(starts, dtype=np.int64))
            parts_e.append(np.asarray(ends, dtype=np.int64))
            parts_n.append(np.asarray(ns, dtype=np.int64))
            parts_c.append(np.asarray(cents, dtype=np.int64))
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            # pandas datetime64[ns] → int64 is NANOseconds
            ts_us = pdf["ts"].to_numpy().astype("int64") // 1000
            cent = _round_half_up_cents(pdf["value"].to_numpy())
            parts_s.append(ts_us)
            parts_e.append(ts_us)
            parts_n.append(np.ones(len(ts_us), dtype=np.int64))
            parts_c.append(cent)
        if not parts_s:
            return
        s, e, n, c = _merge_np(
            np.concatenate(parts_s),
            np.concatenate(parts_e),
            np.concatenate(parts_n),
            np.concatenate(parts_c),
            gap_us,
        )

        wm_us = state.getCurrentWatermarkMs() * 1000
        open_mask = e + gap_us >= wm_us

        if open_mask.any():
            state.update(
                (
                    s[open_mask].tolist(),
                    e[open_mask].tolist(),
                    [int(v) for v in n[open_mask]],
                    c[open_mask].tolist(),
                )
            )
            # wake up when the earliest open session could finalize
            next_ms = int(e[open_mask].min()) // 1000 + gap_us // 1000 + 1
            state.setTimeoutTimestamp(max(next_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()

        if (~open_mask).any():
            cl = ~open_mask
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "session_start": pd.to_datetime(s[cl], unit="us"),
                    "session_end": pd.to_datetime(e[cl], unit="us"),
                    "n_events": pd.array(n[cl], dtype="int32"),
                    "sum_cents": c[cl].tolist(),
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin (the oracle): lag/cumsum session ids — one window +
    one aggregation, standard Spark sessionization."""
    w = Window.partitionBy("user_id").orderBy("ts")
    cents = F.round(F.col("value") * 100).cast("long")
    # interval arithmetic — works for both TIMESTAMP and TIMESTAMP_NTZ
    # sources (an NTZ→BIGINT cast is illegal under ANSI)
    gap_interval = F.expr(f"INTERVAL {gap_minutes * 60} SECONDS")
    sid = F.sum(
        F.when(F.col("ts") - F.lag("ts").over(w) > gap_interval, 1).otherwise(0)
    ).over(w)
    return (
        events.select("user_id", "ts", cents.alias("cents"))
        .withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
        .drop("sid")
    )
