"""Stream-stream interval join — watermarked event correlation.

Parity-plus (SURVEY.md §2.7): the reference's streaming surface is a
single-threaded file-ingest loop (``FastAccess.hs:323-334``); correlating
two live event streams is outside its model entirely. Structured Streaming
executes this as a symmetric stateful join: each side buffers only rows
inside its watermark horizon, and the interval condition lets Spark derive
a state-eviction bound for BOTH sides — state is O(arrival rate × window),
not O(stream length). That bounded-state property is the whole point at
100 TB/day: the same declarative join runs unchanged in batch mode (where
Catalyst plans it as an ordinary range-predicate join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from judy_graph_db_spark.streaming.windows import ensure_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within_seconds: int = 1800,
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Pair every left row with the right rows of the same key whose
    timestamp lies in ``(left_ts, left_ts + within_seconds]`` — strictly
    after, inclusive upper bound (the conversion-attribution window).

    Works on two streaming frames (watermarks applied, bounded state) or
    two batch frames (plain join) — one definition, both modes. Columns
    come back prefixed to keep both sides addressable.
    """
    l = ensure_event_time(left, left_ts)
    r = ensure_event_time(right, right_ts)
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    lp = l.select([F.col(c).alias(f"{left_prefix}{c}") for c in l.columns])
    rp = r.select([F.col(c).alias(f"{right_prefix}{c}") for c in r.columns])
    lt, rt = f"{left_prefix}{left_ts}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(f"{left_prefix}{on}") == F.col(f"{right_prefix}{on}"))
        & (F.col(rt) > F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within_seconds} SECONDS"))
    )
    return lp.join(rp, cond)


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str = "user_id",
                  how: str = "left",
                  broadcast_dim: bool = True) -> DataFrame:
    """Stream-static dimension enrichment — the other join every
    streaming pipeline needs (events × user/account/catalog attributes):
    a stateless per-micro-batch join, so no watermark and NO state store
    at all (unlike the stream-stream interval join). The static side is
    re-read every micro-batch, which is exactly what you want for a
    slowly-changing dimension backed by a table.

    ``broadcast_dim=True`` (default) hints the dimension to broadcast —
    at cluster scale a hash-partitioned shuffle of a high-rate stream
    against a small dimension would dominate the micro-batch time; drop
    the hint only when the dimension is genuinely too large to ship, at
    which point pre-bucket BOTH sides on the key instead. ``how`` of
    ``left`` keeps stream rows with no dimension match (``inner`` is the
    other streaming-supported choice for a static right side).

    Works identically on a batch frame (one definition, both modes).
    """
    d = dim
    if broadcast_dim:
        d = F.broadcast(dim)
    return stream.join(d, on, how)
