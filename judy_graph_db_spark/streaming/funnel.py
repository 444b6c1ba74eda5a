"""Streaming multi-stage funnel — CEP-style ordered-sequence detection.

Parity-plus (SURVEY.md §2.7): the live counterpart of
``operators/temporal.funnel_steps``. Same semantics — each stage must fire
strictly after the previous one and within ``within_seconds`` of it,
earliest-first greedy (optimal: the earliest qualifying event can only
loosen later deadlines) — but evaluated incrementally per user with
``applyInPandasWithState``, so a funnel completion is emitted the moment
its last stage arrives instead of at batch close.

State per key is four scalars (stage index, start/last timestamps,
done flag) — O(users) total, independent of stream length; idle keys
are evicted by processing-time timeout. Eviction scopes the contract:
a user idle longer than ``timeout_seconds`` restarts the funnel on
their next event (per-activity-episode semantics — a fresh episode may
re-complete), so exact batch equivalence with ``funnel_steps`` holds
for runs without processing-time gaps beyond the timeout — which is
every availableNow replay (the batch-equivalence test pins completions
against ``funnel_steps`` on exactly that shape). Events are sorted
within each micro-batch delivery, so in-order streams reproduce the
batch answer.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from judy_graph_db_spark.streaming.windows import ensure_event_time

FUNNEL_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("started", TimestampType()),
    StructField("completed", TimestampType()),
])
FUNNEL_STATE_SCHEMA = StructType([
    StructField("stage", LongType()),
    StructField("t0", LongType()),
    StructField("t_prev", LongType()),
    StructField("done", LongType()),
])


def funnel_stream(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    watermark: str = "2 hours",
    timeout_seconds: int | None = None,
) -> DataFrame:
    """Emit ``(user_id, started, completed)`` the moment a user finishes
    the ordered ``steps`` sequence (stage i strictly after stage i−1 and
    within ``within_seconds`` of it). Completions only — users stuck
    mid-funnel emit nothing and their state is evicted after
    ``timeout_seconds`` of processing-time inactivity (default: one
    funnel deadline per remaining stage, the longest a live funnel can
    still complete)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")
    steps = list(steps)
    if timeout_seconds is None:
        timeout_seconds = within_seconds * len(steps)

    def fn(key: Tuple, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        (user,) = key
        rows = []
        if state.hasTimedOut:
            state.remove()
        else:
            evs = []
            for pdf in pdfs:
                ts = pd.to_datetime(pdf[ts_col])
                for t, ty in zip(ts, pdf[type_col]):
                    evs.append((int(t.value // 1_000_000_000), ty))
            evs.sort()
            if state.exists:
                stage, t0, t_prev, done = state.get
            else:
                stage, t0, t_prev, done = 0, 0, 0, 0
            for t, ty in evs:
                if done:
                    break
                if ty != steps[stage]:
                    continue
                if stage == 0:
                    stage, t0, t_prev = 1, t, t
                elif t > t_prev and t <= t_prev + within_seconds:
                    stage, t_prev = stage + 1, t
                    if stage == len(steps):
                        rows.append((user, t0, t))
                        done = 1
            state.update((stage, t0, t_prev, done))
            state.setTimeoutDuration(int(timeout_seconds) * 1000)
        out = pd.DataFrame(rows, columns=["user_id", "started", "completed"])
        if not out.empty:
            out["started"] = pd.to_datetime(out["started"], unit="s")
            out["completed"] = pd.to_datetime(out["completed"], unit="s")
        yield out

    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
