"""Skew-aware join utilities — the manual tools for when AQE's runtime
skew-join split isn't available (non-shuffle stages, pre-AQE planners) or
when a key's skew is known up front.

Parity-plus (SURVEY.md §2.7): the reference is single-threaded, so key
skew cannot hurt it; on a 1000-executor shuffle one hot key serializes a
whole stage. ``salted_join`` is the classic remedy: replicate the SMALL
side S times, scatter the big side's hot keys across S salt buckets, and
join on (key, salt) — the hot key's rows now spread over S tasks at the
cost of S× the small side (still tiny). ``heavy_keys`` finds the keys
worth salting from the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_keys(df: DataFrame, on: str, min_count: int) -> DataFrame:
    """Keys whose row count reaches ``min_count`` — the shuffle hot spots.
    One map-side-combined aggregation; the result is by construction a
    small relation (a key must own ≥ min_count rows to appear), safe to
    broadcast into :func:`salted_join` or a two-path plan."""
    return (
        df.groupBy(on)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= int(min_count))
    )


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt``-way key
    scattering: the big side tags each row with ``md5-hash mod salt``
    (deterministic — no RNG, so retried tasks salt identically), the
    small side explodes into all ``salt`` copies, and the join runs on
    ``(on, salt)``. Row-for-row identical to the plain join (each big row
    still meets every matching small row exactly once) while a key with
    10⁹ rows occupies ``salt`` shuffle partitions instead of one.

    Use when the small side fits S× replication (dimensions, lookup
    relations). ``how`` supports the joins whose semantics survive
    salting unchanged: inner / left / left_semi / left_anti (right-side
    variants would multiply unmatched right rows — reverse the operands
    instead).

    The salt is a content hash over the row's OWN columns — genuinely
    deterministic (a retried or re-planned task salts identically, which
    ``monotonically_increasing_id`` would not guarantee). The trade:
    byte-identical duplicate rows share a salt, so a hot key composed of
    one repeated row still lands on one partition — for that shape,
    aggregate the duplicates first (a partial-agg count is cheaper than
    the join anyway).
    """
    from judy_graph_db_spark.operators.sketch import _h60

    if salt < 1:
        raise ValueError("salt must be positive")
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"unsupported how for salting: {how!r}")
    b = big.withColumn(
        "__salt",
        (_h60(F.concat_ws("|", *[F.col(c).cast("string")
                                 for c in big.columns]), "salt")
         % salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, [on, "__salt"], how).drop("__salt")
