"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; the
decode/feature steps run as Arrow-batched ``mapInPandas`` operators so a
100 TB corpus streams through executors batch-by-batch without driver
involvement. The actual codec calls are STUBBED (the image/audio libraries
are not in this container): ``decode_stub=True`` produces deterministic fake
features from the raw bytes; ``decode_stub=False`` raises NotImplementedError
at the point a real decoder (PIL/torchaudio/ffmpeg) would be invoked. The
Spark-side contract — schema, batch iteration, partitioning — is real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "doc_id long, media_type string, byte_len long, content_hash string"
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, byte_len long, content_hash string, width int, height int, n_frames int"
)


def as_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                   media_type: str = "image") -> DataFrame:
    """Build a media-shaped table from the documents fixture: the utf-8 bytes
    of ``text`` stand in for an encoded media payload. Real pipelines read
    ``spark.read.format('binaryFile')`` or parquet with a binary column."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit(media_type).alias("media_type"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Cheap metadata pass — byte length + content hash, pure JVM columns
    (no decode needed): this is the step that runs over ALL bytes, so it must
    stay codegen'd."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("content").alias("byte_len"),
        F.md5("content").alias("content_hash"),
    )


def decode_features(media: DataFrame, decode_stub: bool = True,
                    batch_hint: int = 64) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    With ``decode_stub`` the "decoder" derives deterministic fake dimensions
    from the payload bytes (first bytes mod ranges) — exercising the real
    batch path end-to-end. Without it, raises where PIL/ffmpeg would run.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/torchaudio/ffmpeg — "
                    "not available in this container; use decode_stub=True"
                )
            contents = pdf["content"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": contents.map(len).astype("int64"),
                    "content_hash": contents.map(lambda b: hashlib.md5(b).hexdigest()),
                    # deterministic fake decode: dimensions from leading bytes
                    "width": contents.map(lambda b: 16 + (b[0] % 64) if len(b) else 0).astype("int32"),
                    "height": contents.map(lambda b: 16 + (b[1] % 64) if len(b) > 1 else 0).astype("int32"),
                    "n_frames": contents.map(lambda b: 1 + (len(b) % 8)).astype("int32"),
                }
            )
            yield out

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling stub: emits one row per sampled "frame" (1 + len%8
    fake frames per payload, stride ``every_n``) — the row-explosion shape a
    video pipeline produces, via the same Arrow batch path. The frame
    fingerprint is md5 of payload ++ the decimal frame index (as bytes), so
    the DuckDB twin is plain ``md5(text || CAST(i AS VARCHAR))``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decode not available here")
            rows = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                n = 1 + (len(content) % 8)
                for i in range(0, n, every_n):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(
                        hashlib.md5(content + str(i).encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema="doc_id long, frame_idx int, frame_hash string")
