"""Multi-dimensional data layout: Z-order (Morton) clustering.

Sorting a 100 TB table by ONE column makes that column's parquet
row-group/min-max stats selective and every other column's useless;
interleaving the bits of several rank-normalized columns into one Morton
value and range-partitioning + sorting on it gives EVERY interleaved
column partial locality — the technique behind Delta/Iceberg's
``OPTIMIZE ZORDER BY`` (public Databricks/Iceberg docs; the bit trick is
Morton 1966). This module implements it with plain DataFrame ops so any
parquet sink gets multi-column row-group pruning:

- per column, a rank → fixed-width integer quantile (``ntile``-style),
  computed with ONE window over the column's value-count aggregate
  (|distinct| rows, not |table|) so the global window never sees the
  corpus;
- bit interleave via codegen ``shiftleft``/``|`` expressions (no UDF);
- ``repartitionByRange + sortWithinPartitions`` on the z-value, which
  samples ranges distributedly (no global sort barrier beyond Spark's
  standard range-exchange sampling).

Everything is deterministic (dense_rank over (value) with the value itself
as tiebreak), so the z-values — and therefore the file layout — are
reproducible and SQL-twinnable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["zorder_value", "zorder_by"]


def zorder_value(df: DataFrame, cols: Sequence[str], bits: int = 8,
                 out: str = "zvalue") -> DataFrame:
    """Attach the Morton z-value of ``cols`` as ``out``.

    Each column maps to a ``bits``-wide integer quantile of its value
    distribution: ``floor((dense_rank-1) * 2^bits / n_distinct)`` — exact
    integer arithmetic over the per-column distinct-value relation (tiny),
    then broadcast back. Bits interleave column-major: output bit
    ``i*len(cols)+j`` is bit ``i`` of column ``j``'s quantile.
    """
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError("n_cols * bits must fit in a positive BIGINT")
    keyed = df
    for j, c in enumerate(cols):
        vals = df.select(F.col(c).alias("__v")).distinct()
        w = Window.orderBy(F.col("__v").asc())
        ranked = vals.select(
            "__v",
            (F.dense_rank().over(w) - 1).alias("__r"),
        )
        n_distinct = vals.count()
        # integer division keeps the quantile exact in every engine (a
        # float floor(a*b/c) can round differently at bucket boundaries)
        ranked = ranked.select(
            F.col("__v").alias(c),
            F.expr(f"(__r * {1 << bits}) div {int(n_distinct)}")
            .cast("long").alias(f"__q{j}"),
        )
        keyed = keyed.join(F.broadcast(ranked), c, "left")
    interleave = None
    for i in range(bits):
        for j in range(n):
            bit = F.expr(f"shiftright(__q{j}, {i}) % 2")
            placed = F.expr(
                f"shiftleft(CAST(shiftright(__q{j}, {i}) % 2 AS BIGINT), "
                f"{i * n + j})"
            )
            interleave = placed if interleave is None else interleave + placed
    return keyed.withColumn(out, interleave.cast("long")).drop(
        *[f"__q{j}" for j in range(n)]
    )


def zorder_by(df: DataFrame, cols: Sequence[str], n_partitions: int,
              bits: int = 8) -> DataFrame:
    """Cluster ``df`` for multi-column locality: compute the z-value,
    range-partition on it, sort within partitions, drop the helper column.
    Write the result to parquet and row-group min/max stats become
    selective for EVERY column in ``cols`` simultaneously."""
    z = zorder_value(df, cols, bits=bits)
    return (
        z.repartitionByRange(n_partitions, F.col("zvalue"))
        .sortWithinPartitions("zvalue")
        .drop("zvalue")
    )
