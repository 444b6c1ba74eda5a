"""Streaming SCD2 dimension maintenance.

The batch operator ``temporal.scd2_merge`` folds one updates relation into
a full-history type-2 dimension; a CDC/snapshot stream is exactly a
sequence of such folds — each micro-batch collapses to its latest state
per key and merges into the versioned store. Store layout mirrors
``streaming/sketches.py``: one ``v=N`` directory per fold with
``_batch_meta.json`` written AFTER the parquet, so crash leftovers are
skipped and replayed micro-batches are detected, never double-applied
(re-merging an identical update is additionally a semantic no-op — the
merge is idempotent on unchanged values — so the guard and the semantics
back each other up).

At 100 TB: each fold's join touches only the OPEN slice + the batch; the
closed history is rewritten as-is per version (versioned-store
simplicity; swap the store for a format with upserts when history itself
is huge — the merge logic is unchanged).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from judy_graph_db_spark.operators.temporal import scd2_merge


def _latest_version(store: str) -> Optional[int]:
    """Latest COMPLETE version (dirs without meta = crash leftovers)."""
    if not os.path.isdir(store):
        return None
    vs = [int(d[2:]) for d in os.listdir(store)
          if d.startswith("v=") and d[2:].isdigit()
          and os.path.exists(os.path.join(store, d, "_batch_meta.json"))]
    return max(vs) if vs else None


def read_dimension(spark, store: str) -> Optional[DataFrame]:
    """Latest folded dimension table, or None before any fold."""
    latest = _latest_version(store)
    if latest is None:
        return None
    return spark.read.parquet(os.path.join(store, f"v={latest}", "dim"))


def foreach_batch_scd2(stream: DataFrame, store: str,
                       key_col: str = "key", value_cols=("value",),
                       ts_col: str = "ts",
                       checkpoint: Optional[str] = None,
                       available_now: bool = True,
                       replay_id: Optional[str] = None):
    """Fold a change stream ``(key, values…, ts)`` into a continuously
    maintained SCD2 history. Each micro-batch keeps its LATEST state per
    key (intra-batch intermediate states collapse — the standard
    snapshot-CDC concession; feed smaller batches when every transition
    matters) and merges via :func:`temporal.scd2_merge`. Returns the
    started StreamingQuery."""
    vals = list(value_cols)

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        latest = _latest_version(store)
        ck_id = replay_id if replay_id is not None else (checkpoint or "")
        prev = None
        if latest is not None:
            vdir = os.path.join(store, f"v={latest}")
            with open(os.path.join(vdir, "_batch_meta.json")) as fh:
                meta = json.load(fh)
            if (meta.get("checkpoint") == ck_id
                    and meta.get("batch_id") == batch_id):
                return  # replayed micro-batch — already folded
            prev = spark.read.parquet(os.path.join(vdir, "dim"))
        if prev is None:
            fields = ", ".join(
                [f"{key_col} long"]
                + [f"{c} string" for c in vals]
                + ["valid_from timestamp", "valid_to timestamp"])
            prev = spark.createDataFrame([], fields)
        updates = (
            batch.groupBy(key_col)
            .agg(F.max(F.struct(ts_col, *vals)).alias("__s"))
            .select(key_col,
                    *[F.col(f"__s.{c}").alias(c) for c in vals],
                    F.col(f"__s.{ts_col}").alias(ts_col))
        )
        merged = scd2_merge(prev, updates, key_col=key_col,
                            value_cols=vals, ts_col=ts_col)
        new_version = 0 if latest is None else latest + 1
        vdir = os.path.join(store, f"v={new_version}")
        merged.write.mode("overwrite").parquet(os.path.join(vdir, "dim"))
        with open(os.path.join(vdir, "_batch_meta.json"), "w") as fh:
            json.dump({"checkpoint": ck_id, "batch_id": batch_id}, fh)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
