"""Structured Streaming ingest — the streaming upgrade of the reference's
Streamly file fold (``insertCSVEdgeStream``, ``FastAccess.hs:323-334``;
``Enum.hs:192-203``; ``JudyGraph.hs:248-268``).

The reference streams ONE file line-by-line in constant memory. Spark's file
stream source gives the same property distributed: files land in a directory,
each micro-batch parses new files executor-side, and ``foreach_batch_insert``
folds them into the persisted graph — the user "edge-adding function"
(``AddCSVLine``, ``FastAccess.hs:230-235``) becomes a DataFrame→DataFrame
``transform`` hook.

Scale notes: the per-batch edge_seq assignment shuffles only the batch (keyed
by (src,label,is_back)); reading the current per-key max from the sink is a
pre-aggregated parquet scan. For very hot keys at 100 TB, swap the sink for a
Delta table and let MERGE handle concurrency.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_CSV_SCHEMA = "src LONG, dst LONG, label STRING"


def read_edge_csv_stream(
    spark: SparkSession,
    path: str,
    schema: str = EDGE_CSV_SCHEMA,
    sep: str = ",",
    label: Optional[str] = None,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> DataFrame:
    """Streaming CSV edge source. Malformed lines are dropped
    (``insertCSVEdge`` skip-on-parse-error, ``FastAccess.hs:342-343``).
    ``transform`` is the ``addCsvLine`` analog applied to each batch's rows."""
    raw = (
        spark.readStream.schema(schema)
        .option("sep", sep)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    if transform is not None:
        raw = transform(raw)
    if label is not None and "label" not in raw.columns:
        raw = raw.withColumn("label", F.lit(label))
    elif "label" in raw.columns:
        raw = raw.withColumn("label", F.coalesce(F.col("label"), F.lit(label or "EDGE")))
    df = raw.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    if "labels" not in df.columns:
        df = df.withColumn("labels", F.array(F.col("label")))
    if "is_back" not in df.columns:
        df = df.withColumn("is_back", F.lit(False))
    return df


def foreach_batch_insert(stream: DataFrame, edges_sink: str,
                         checkpoint: Optional[str] = None,
                         available_now: bool = True):
    """Fold the edge stream into a parquet edges sink with the reference's
    counter semantics: each micro-batch continues every (src,label,is_back)
    enumeration past the sink's current max ``edge_seq`` (SURVEY.md §1.5) —
    the streaming analog of ``insertNodeEdgeAttr``'s read-counter/bump/write.

    Returns the started StreamingQuery; with ``available_now`` it drains all
    currently-visible files then stops (the batch-file use case the reference
    serves); without it it runs continuously."""
    from pyspark.sql import Window

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        key = ["src", "label", "is_back"]
        if os.path.exists(edges_sink) and any(
            f.endswith(".parquet") for f in os.listdir(edges_sink)
        ):
            base = (
                spark.read.parquet(edges_sink)
                .groupBy(*key)
                .agg(F.max("edge_seq").alias("_base"))
            )
        else:
            base = None
        w = Window.partitionBy(*key).orderBy(F.monotonically_increasing_id())
        b = batch.withColumn("_rn", F.row_number().over(w))
        if base is not None:
            b = b.join(base, key, "left").withColumn(
                "_base", F.coalesce(F.col("_base"), F.lit(0))
            )
        else:
            b = b.withColumn("_base", F.lit(0))
        out = b.withColumn("edge_seq", (F.col("_base") + F.col("_rn")).cast("long")).select(
            "src", "dst", "label", "labels", "is_back", "edge_seq"
        )
        out.write.mode("append").parquet(edges_sink)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
