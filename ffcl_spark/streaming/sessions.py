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


def _merge(sessions: list[list[int]], gap_us: int) -> list[list[int]]:
    """Merge [start, end, n, cents] intervals under the gap rule.
    Input in any order; output sorted by start."""
    sessions.sort(key=lambda s: (s[0], s[1]))
    out: list[list[int]] = []
    for s in sessions:
        if out and s[0] - out[-1][1] <= gap_us:
            out[-1][1] = max(out[-1][1], s[1])
            out[-1][2] += s[2]
            out[-1][3] += s[3]
        else:
            out.append(list(s))
    return out


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_cents) —
    finalized sessions only (append mode)."""
    gap_us = gap_minutes * 60 * US

    def fn(key, pdf_iter, state: GroupState):
        sessions: list[list[int]] = []
        if state.exists:
            starts, ends, ns, cents = state.get
            sessions = [list(t) for t in zip(starts, ends, ns, cents)]
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            ts_us = (pdf["ts"].astype("int64")).tolist()  # ns → see below
            # pandas datetime64[ns] → int64 is NANOseconds
            ts_us = [t // 1000 for t in ts_us]
            cent = (
                (pdf["value"].astype("float64") * 100).round().astype("int64").tolist()
            )
            sessions.extend([t, t, 1, c] for t, c in zip(ts_us, cent))
        sessions = _merge(sessions, gap_us)

        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        open_ = [s for s in sessions if s[1] + gap_us >= wm_us]

        if open_:
            state.update(
                (
                    [s[0] for s in open_],
                    [s[1] for s in open_],
                    [s[2] for s in open_],
                    [s[3] for s in open_],
                )
            )
            # wake up when the earliest open session could finalize
            next_ms = min(s[1] for s in open_) // 1000 + gap_us // 1000 + 1
            state.setTimeoutTimestamp(max(next_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "session_start": pd.to_datetime([s[0] for s in closed], unit="us"),
                    "session_end": pd.to_datetime([s[1] for s in closed], unit="us"),
                    "n_events": pd.array([s[2] for s in closed], dtype="int32"),
                    "sum_cents": [s[3] for s in closed],
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
