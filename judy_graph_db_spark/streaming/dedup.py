"""Streaming deduplication — the ingest-path twin of the batch dedup
operators (``operators/dedup.py``).

The reference's only streaming is constant-memory file ingest
(``insertCSVEdgeStream``, ``FastAccess.hs:323-334``); exactly-once semantics
are implicit in its single-threaded insert loop. In a distributed ingest
pipeline the same guarantee needs explicit state: Structured Streaming's
watermarked dedup keeps one state row per key inside the watermark horizon,
so memory is bounded by (arrival rate × delay), not by corpus size — the
property that matters when the corpus is 100 TB but the dedup window is
minutes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_keyed(df: DataFrame, text_col: str = "text",
                  key_col: str = "text_hash") -> DataFrame:
    """Add the content-hash dedup key (same key as batch
    ``dedup.exact_dedup``: md5 of the raw text)."""
    return df.withColumn(key_col, F.md5(F.col(text_col)))


def dedup_stream(stream: DataFrame, keys: Sequence[str] = ("text_hash",),
                 event_time_col: str = "ts",
                 delay: str = "10 minutes") -> DataFrame:
    """Drop duplicate records by ``keys`` within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the per-key state row is
    evicted once the watermark passes it — duplicates arriving within
    ``delay`` of each other collapse to the first arrival; a re-occurrence
    after the horizon is treated as new (bounded state, by design).
    """
    from judy_graph_db_spark.streaming.windows import ensure_event_time

    return (
        ensure_event_time(stream, event_time_col)
        .withWatermark(event_time_col, delay)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def dedup_batch_equivalent(df: DataFrame, keys: Sequence[str] = ("text_hash",),
                           event_time_col: str = "ts") -> DataFrame:
    """The batch semantics ``dedup_stream`` converges to when every
    duplicate falls inside the horizon: keep the earliest row per key
    (ties broken arbitrarily, as in streaming arrival order)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(event_time_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
