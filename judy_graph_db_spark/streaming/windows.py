"""Streaming analytics — watermarked windowed aggregation and custom
stateful sessionization (parity-plus: the reference has no streaming query
surface at all, SURVEY.md §2.7; its "streaming" is only file ingest).

Both operators take a streaming OR batch DataFrame with an event-time
column — the same plan runs under ``readStream`` with exactly-once state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as PT


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local timezone); parquet round trips
    can surface the column as TIMESTAMP_NTZ depending on the session's parquet
    mapping. Sessions here pin UTC, so the cast is a deterministic relabel."""
    if isinstance(df.schema[ts_col].dataType, PT.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding window counts + value sum per key. On a stream the
    watermark bounds state and admits late rows up to ``watermark``
    (late-data semantics the reference cannot express)."""
    df = ensure_event_time(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        df.groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "sum_value_cents",
        )
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization.

    Batch path: pure window functions (lag → gap flag → running session id) —
    no Python. Streaming path: ``applyInPandasWithState`` keyed by user, the
    Spark-native custom stateful operator (timeout closes idle sessions) —
    use ``sessionize_stream`` directly on a streaming frame."""
    if events.isStreaming:
        return sessionize_stream(events, ts_col, user_col, gap_seconds)
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    marked = (
        events.select(user_col, ts_col)
        .withColumn("_prev", F.lag(ts_col).over(w))
        .withColumn(
            "_new_session",
            (F.col("_prev").isNull())
            | (F.unix_timestamp(ts_col) - F.unix_timestamp("_prev") > gap_seconds),
        )
        .withColumn("_sid", F.sum(F.col("_new_session").cast("long")).over(w))
    )
    return (
        marked.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )


def sessionize_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState`` — emits a row
    per closed session (closed by a gap or by processing-time timeout)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key: Tuple, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        (user,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                rows.append((user, start, last, n))
                state.remove()
        else:
            ts_all = []
            for pdf in pdfs:
                ts_all.extend(int(t.value // 1_000_000_000) for t in pd.to_datetime(pdf[ts_col]))
            ts_all.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = None, None, 0
            for t in ts_all:
                if last is None:
                    start, last, n = t, t, 1
                elif t - last > gap_seconds:
                    rows.append((user, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if last is not None:
                state.update((start, last, n))
                state.setTimeoutDuration(gap_seconds * 1000)
        out = pd.DataFrame(rows, columns=["user_id", "session_start", "session_end", "n_events"])
        if not out.empty:
            out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        yield out

    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
