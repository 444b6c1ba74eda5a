"""Streaming NEAR-duplicate detection — the ingest-path twin of the batch
MinHash-LSH operators (``operators/dedup.py``), completing the streaming
dedup story: ``streaming/dedup.py`` drops EXACT duplicates inside a
watermark horizon; this module flags near-duplicates against EVERYTHING
ingested so far, by maintaining the LSH band-bucket table as a versioned
store.

Semantics — first-arrival canonical: every (band_idx, band_hash) bucket
remembers the first document that produced it; a later document sharing
any bucket is flagged ``(doc_id, dup_of)`` with ``dup_of`` = the smallest
first-arrival id among its matched buckets (with monotone doc ids the
standard stream contract, "first ingested wins" — the same keeper rule as
batch ``exact_dedup``). The batch twin (:func:`neardup_batch_equivalent`,
and ``oracle.neardup_flags_sql`` for DuckDB) restates this as one
relational query, so the fold result over ANY ordered batch split must
equal the batch answer over the union — the batch-equivalence contract
every stream operator here is held to.

Store layout (the append-only lesson of ``streaming/dimensions.py``):
a bucket's keeper NEVER changes once written (later ids are larger), so
each fold appends exactly its NEW buckets as ``buckets/b=N`` and its new
flags as ``flags/b=N`` — per-fold write IO is O(|batch signatures|),
never O(|store|); nothing is ever rewritten. ``_batch_meta.json`` lands
after the parquet (crash leftovers are overwritten by the re-fold;
replayed micro-batches are detected by (checkpoint, batch_id) and
skipped). Read = union of complete slices.

At 100 TB: per-batch cost is the batch's signature computation (one
shingle explode + per-doc min agg, the batch plan) plus one equi-join of
batch bucket rows against the store on the bucket key — candidate cost ∝
matched buckets, the LSH contract; the stored relation is
O(corpus · n_bands) NARROW rows (three columns), the same relation any
batch LSH pass over the corpus would materialize once.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from judy_graph_db_spark.operators.dedup import (BAND_ROWS, NUM_HASHES,
                                                 band_hashes,
                                                 minhash_signatures)


def band_rows_of(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", num_hashes: int = NUM_HASHES,
                 band_rows: int = BAND_ROWS) -> DataFrame:
    """(id, band_idx, band_hash) LSH bucket rows — the relation both the
    fold and the batch twin are built from."""
    return (
        minhash_signatures(docs, text_col, id_col, num_hashes)
        .withColumn("bands", band_hashes("minhash", band_rows, num_hashes))
        .select(F.col(id_col).alias("doc_id"),
                F.posexplode("bands").alias("band_idx", "band_hash"))
    )


def _complete_slices(store: str, sub: str) -> list:
    root = os.path.join(store, sub)
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        if (d.startswith("b=") and d[2:].isdigit()
                and os.path.exists(os.path.join(root, d,
                                                "_batch_meta.json"))):
            out.append(os.path.join(root, d))
    return sorted(out, key=lambda p: int(os.path.basename(p)[2:]))


def _latest_meta(store: str) -> tuple[Optional[int], Optional[dict]]:
    slices = _complete_slices(store, "buckets")
    if not slices:
        return None, None
    last = slices[-1]
    with open(os.path.join(last, "_batch_meta.json")) as fh:
        return int(os.path.basename(last)[2:]), json.load(fh)


def read_buckets(spark, store: str) -> Optional[DataFrame]:
    """The folded bucket table (band_idx, band_hash, keep_id), or None
    before any fold."""
    slices = _complete_slices(store, "buckets")
    if not slices:
        return None
    return spark.read.parquet(*slices)


def read_flags(spark, store: str) -> Optional[DataFrame]:
    """Every near-dup flag emitted so far: (doc_id, dup_of)."""
    slices = _complete_slices(store, "flags")
    if not slices:
        return None
    return spark.read.parquet(*slices)


def foreach_batch_neardup(stream: DataFrame, store: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          checkpoint: Optional[str] = None,
                          num_hashes: int = NUM_HASHES,
                          band_rows: int = BAND_ROWS,
                          available_now: bool = True,
                          replay_id: Optional[str] = None):
    """Fold a document stream into the near-dup store. Returns the
    started StreamingQuery."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        ck_id = replay_id if replay_id is not None else (checkpoint or "")
        latest, meta = _latest_meta(store)
        if (meta is not None and meta.get("checkpoint") == ck_id
                and meta.get("batch_id") == batch_id):
            return  # replayed micro-batch — already folded
        prev = read_buckets(spark, store)

        rows = band_rows_of(batch, id_col, text_col, num_hashes, band_rows) \
            .localCheckpoint(eager=True)
        batch_min = rows.groupBy("band_idx", "band_hash") \
            .agg(F.min("doc_id").alias("batch_keep"))
        if prev is not None:
            merged = batch_min.join(prev, ["band_idx", "band_hash"], "left")
        else:
            merged = batch_min.withColumn("keep_id",
                                          F.lit(None).cast("long"))
        # effective keeper per touched bucket: stored first-arrival if the
        # bucket exists, else this batch's min (ids are monotone, so a
        # stored keeper is always smaller)
        eff = merged.select(
            "band_idx", "band_hash", "batch_keep",
            F.coalesce("keep_id", "batch_keep").alias("eff_keep"),
            F.col("keep_id").isNull().alias("is_new"))
        flags = (
            rows.join(eff, ["band_idx", "band_hash"])
            .filter(F.col("eff_keep") < F.col("doc_id"))
            .groupBy("doc_id")
            .agg(F.min("eff_keep").alias("dup_of"))
        )
        new_buckets = eff.filter("is_new").select(
            "band_idx", "band_hash", F.col("batch_keep").alias("keep_id"))

        new_version = 0 if latest is None else latest + 1
        fdir = os.path.join(store, "flags", f"b={new_version}")
        bdir = os.path.join(store, "buckets", f"b={new_version}")
        flags.write.mode("overwrite").parquet(fdir)
        new_buckets.write.mode("overwrite").parquet(bdir)
        # meta lands last, flags before buckets: the version is complete
        # only when the BUCKETS meta exists (the reader keys on it), so a
        # crash anywhere earlier leaves a slice the re-fold overwrites
        for d in (fdir, bdir):
            with open(os.path.join(d, "_batch_meta.json"), "w") as fh:
                json.dump({"checkpoint": ck_id, "batch_id": batch_id}, fh)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def neardup_batch_equivalent(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             num_hashes: int = NUM_HASHES,
                             band_rows: int = BAND_ROWS) -> DataFrame:
    """The batch semantics the fold converges to under ordered arrival:
    per doc, ``dup_of`` = min over its buckets of the bucket's
    first-arrival (= min) doc id, kept only when smaller than the doc's
    own id. One bucket-keyed agg + one equi-join — no pair join."""
    rows = band_rows_of(docs, id_col, text_col, num_hashes, band_rows)
    keep = rows.groupBy("band_idx", "band_hash") \
        .agg(F.min("doc_id").alias("keep_id"))
    return (
        rows.join(keep, ["band_idx", "band_hash"])
        .filter(F.col("keep_id") < F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.min("keep_id").alias("dup_of"))
    )
