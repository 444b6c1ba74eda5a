"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs; the
decode/feature steps run as Arrow-batched ``mapInPandas`` operators so a
100 TB corpus streams through executors batch-by-batch without driver
involvement. ``decode_stub=True`` produces deterministic fake features from
the raw bytes (exercising the full batch path with no codec dependency);
``decode_stub=False`` decodes for real: through PIL when it is importable
on the executors, else through the built-in pure-stdlib decoders — a
header parser for dimensions (PNG/GIF/BMP/JPEG/PPM) plus a full PNG PIXEL
decoder (stdlib ``zlib`` inflate + per-scanline unfilter, non-interlaced
8-bit gray/RGB/RGBA) for the operators that need real pixels
(:func:`image_ahash`) — raising ValueError on unrecognized payloads. The
Spark-side contract — schema, batch iteration, partitioning — is
identical on all paths.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pil_image():
    """The optional full codec: PIL's Image module, or None. Resolved inside
    the Arrow batch fn so the import happens executor-side."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _builtin_dims(b: bytes) -> tuple[int, int, int]:
    """Dependency-free image *header* decode → (width, height, n_frames).

    Real format parsing (not a stub): PNG IHDR, GIF logical screen
    descriptor, BMP info header, JPEG SOFn segment walk, binary PPM/PGM
    header — the formats' published layouts, no pixel decompression. Frame
    count is 1 (animated-frame walks are full-codec territory — PIL path).
    Raises ValueError on payloads that are none of these.
    """
    import re  # noqa: PLC0415
    import struct  # noqa: PLC0415

    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])  # IHDR is always first
        return w, h, 1
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, 1
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return w, abs(h), 1  # negative height = top-down rows
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to the first SOFn
        i = 2
        while i + 9 <= len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # bare markers
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return w, h, 1
            i += 2 + seg_len
        raise ValueError("JPEG payload without a SOF marker")
    m = re.match(rb"P[56]\s+(?:#[^\n]*\s+)*(\d+)\s+(\d+)\s", b[:128])
    if m:
        return int(m.group(1)), int(m.group(2)), 1
    raise ValueError(f"unrecognized image payload (magic {bytes(b[:8])!r})")


def _png_pixels(b: bytes) -> tuple[int, int, int, bytearray]:
    """Dependency-free PNG PIXEL decode — stdlib ``zlib`` inflate + the
    five published per-scanline filters (None/Sub/Up/Average/Paeth, PNG
    spec §9 "Filtering") — for the non-interlaced 8-bit grayscale (color
    type 0), RGB (2) and RGBA (6) cases. No PIL, no C extension: chunk
    walk → IHDR → concatenated IDAT → inflate → unfilter. Returns
    ``(width, height, channels, pixels)`` with ``pixels`` row-major
    scanline bytes, ``channels ∈ {1, 3, 4}``; raises ValueError on
    non-PNG payloads and on the PNG shapes outside this subset (palette,
    16-bit, interlaced — full-codec/PIL territory).
    """
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    i, w, idat = 8, None, bytearray()
    h = depth = ctype = interlace = None
    while i + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[i:i + 4])
        tag = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None:
        raise ValueError("PNG payload without an IHDR chunk")
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape (bit_depth={depth}, "
            f"color_type={ctype}, interlace={interlace}): the built-in "
            "decoder covers non-interlaced 8-bit gray/RGB/RGBA; use PIL "
            "for palette/16-bit/interlaced")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o:o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                out[o + x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                u = out[o - stride + x] if y else 0
                out[o + x] = (line[x] + u) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                u = out[o - stride + x] if y else 0
                out[o + x] = (line[x] + ((a + u) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                u = out[o - stride + x] if y else 0
                c = out[o - stride + x - ch] if (y and x >= ch) else 0
                p = a + u - c
                pa, pb, pc = abs(p - a), abs(p - u), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (u if pb <= pc else c)
                out[o + x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"invalid PNG scanline filter {f}")
    return w, h, ch, out


def _png_gray_thumb(b: bytes, grid: int) -> list:
    """``grid``×``grid`` grayscale thumbnail of a PNG via
    :func:`_png_pixels`: integer BT.601 luma (``(299R+587G+114B) div
    1000``; alpha ignored, matching a white-free straight conversion)
    then box-average pooling — each output cell is the integer mean of
    its ⌊⌋/⌈⌉ pixel rectangle (cells clamp to ≥1 source pixel, so images
    smaller than the grid repeat pixels). Deterministic integer
    arithmetic end-to-end, same contract as the stub path.
    """
    w, h, ch, px = _png_pixels(b)

    if ch == 1:
        def luma(o):
            return px[o]
    else:
        def luma(o):
            return (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000

    out = []
    for gy in range(grid):
        y0 = gy * h // grid
        y1 = max(y0 + 1, (gy + 1) * h // grid)
        for gx in range(grid):
            x0 = gx * w // grid
            x1 = max(x0 + 1, (gx + 1) * w // grid)
            s = 0
            for y in range(y0, y1):
                base = y * w * ch
                for x in range(x0, x1):
                    s += luma(base + x * ch)
            out.append(s // ((y1 - y0) * (x1 - x0)))
    return out


def png_encode_gray(width: int, height: int, pixels,
                    filters=None) -> bytes:
    """Minimal 8-bit grayscale PNG ENCODER (stdlib only): forward-filters
    each scanline with ``filters[y]`` (default all-None; any of the five
    spec filter types), deflates, and frames signature/IHDR/IDAT/IEND.
    The fixture-builder dual of :func:`_png_pixels` — lets gates and
    tests manufacture REAL decodable payloads with known pixel values
    (and exercise every unfilter branch) without any imaging library.
    ``pixels`` is the row-major byte list, length ``width·height``.
    """
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    if len(pixels) != width * height:
        raise ValueError("pixels length must be width*height")
    fs = filters if filters is not None else [0] * height
    raw = bytearray()
    for y in range(height):
        f = fs[y]
        raw.append(f)
        for x in range(width):
            cur = pixels[y * width + x]
            a = pixels[y * width + x - 1] if x else 0
            u = pixels[(y - 1) * width + x] if y else 0
            c = pixels[(y - 1) * width + x - 1] if (y and x) else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = u
            elif f == 3:
                pred = (a + u) >> 1
            elif f == 4:
                p = a + u - c
                pa, pb, pc = abs(p - a), abs(p - u), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (u if pb <= pc else c)
            else:
                raise ValueError(f"invalid PNG scanline filter {f}")
            raw.append((cur - pred) & 0xFF)

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + \
            struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _real_dims_fn():
    """The real-decode dimension function: PIL when importable (full codec,
    true frame counts), else the built-in header parser."""
    image_mod = _pil_image()
    if image_mod is None:
        return lambda b: _builtin_dims(bytes(b))

    import io  # noqa: PLC0415

    def dims(b: bytes) -> tuple[int, int, int]:
        with image_mod.open(io.BytesIO(b)) as img:
            return img.width, img.height, int(getattr(img, "n_frames", 1))

    return dims

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


def read_media_dir(spark, path: str, glob: str | None = None,
                   media_type: str = "image",
                   extension_types: dict[str, str] | None = None) -> DataFrame:
    """Ingest a directory of raw media files via Spark's built-in
    ``binaryFile`` source into the engine's media-table shape
    ``(doc_id, content, media_type, path, byte_len, modified)``:
    ``doc_id`` is the 60-bit content hash of the file PATH (stable across
    re-listing and cluster sizes), and ``media_type`` comes from the file
    extension when ``extension_types`` maps it (e.g. ``{'wav': 'audio',
    'mp4': 'video'}``), else the given default.

    binaryFile is the right 100 TB ingestion shape: the driver lists
    files, executors each read their own split of WHOLE files (media
    payloads are indivisible), and pushdown on ``pathGlobFilter`` prunes
    at listing time — no Python touches bytes until a downstream
    ``mapInPandas`` decode stage asks for them.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mt = F.lit(media_type)
    for e, t in sorted((extension_types or {}).items()):
        mt = F.when(ext == e.lower(), F.lit(t)).otherwise(mt)
    doc_id = F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)         .cast("long")
    return raw.select(
        doc_id.alias("doc_id"),
        F.col("content"),
        mt.alias("media_type"),
        F.col("path"),
        F.col("length").alias("byte_len"),
        F.col("modificationTime").alias("modified"),
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
    batch path end-to-end on non-image fixtures. Without it, payloads are
    decoded for real: PIL when importable, else the built-in pure-stdlib
    header parser (``_builtin_dims``); unrecognized payloads raise
    ValueError in the executor batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real_dims = None if decode_stub else _real_dims_fn()

        for pdf in batches:
            contents = pdf["content"]
            if decode_stub:
                dims = pd.DataFrame(
                    {
                        # deterministic fake decode: dimensions from leading bytes
                        "width": contents.map(lambda b: 16 + (b[0] % 64) if len(b) else 0),
                        "height": contents.map(lambda b: 16 + (b[1] % 64) if len(b) > 1 else 0),
                        "n_frames": contents.map(lambda b: 1 + (len(b) % 8)),
                    }
                )
            else:
                dims = pd.DataFrame(
                    contents.map(real_dims).tolist(),
                    columns=["width", "height", "n_frames"],
                    index=contents.index,
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": contents.map(len).astype("int64"),
                    "content_hash": contents.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": dims["width"].astype("int32"),
                    "height": dims["height"].astype("int32"),
                    "n_frames": dims["n_frames"].astype("int32"),
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
        real_dims = None if decode_stub else _real_dims_fn()

        def n_frames_of(content: bytes) -> int:
            if decode_stub:
                return 1 + (len(content) % 8)
            return real_dims(content)[2]

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                for i in range(0, n_frames_of(content), every_n):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(
                        hashlib.md5(content + str(i).encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema="doc_id long, frame_idx int, frame_hash string")


# ------------------------------------------------------------------- audio

AUDIO_FEATURES_SCHEMA = (
    "doc_id long, byte_len long, content_hash string, sample_rate int, "
    "n_channels int, bits_per_sample int, n_samples long, duration_ms long"
)


def _wav_meta(b: bytes) -> tuple[int, int, int, int]:
    """Dependency-free WAV *header* decode → (sample_rate, n_channels,
    bits_per_sample, n_samples). Real RIFF chunk walking (the format's
    published layout), no sample decompression; raises ValueError on
    non-WAV payloads. The full-codec analogue (MP3/FLAC/OGG) is
    deliberately out of scope in this container — same split as the image
    path's PIL-vs-header-parser."""
    import struct  # noqa: PLC0415

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"unrecognized audio payload (magic {bytes(b[:4])!r})")
    rate = channels = bits = None
    data_len = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            _, channels, rate = struct.unpack("<HHI", b[i + 8:i + 16])
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif cid == b"data":
            data_len = size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data_len is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    frame_bytes = max(1, channels * (bits // 8))
    return rate, channels, bits, data_len // frame_bytes


def audio_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Audio metadata/feature extraction via the same Arrow ``mapInPandas``
    path as :func:`decode_features`. Stub mode derives deterministic fake
    parameters from the payload bytes (SQL-twinnable byte arithmetic);
    real mode parses WAV headers (``_wav_meta``). ``duration_ms`` =
    ``floor(n_samples · 1000 / sample_rate)``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            if decode_stub:
                meta = pd.DataFrame(
                    {
                        "sample_rate": contents.map(
                            lambda b: 8000 * (1 + b[0] % 3) if len(b) else 8000
                        ),
                        "n_channels": contents.map(
                            lambda b: 1 + (b[1] % 2) if len(b) > 1 else 1
                        ),
                        "bits_per_sample": contents.map(lambda b: 16),
                        "n_samples": contents.map(lambda b: len(b) * 100),
                    }
                )
            else:
                meta = pd.DataFrame(
                    contents.map(lambda b: _wav_meta(bytes(b))).tolist(),
                    columns=[
                        "sample_rate", "n_channels", "bits_per_sample",
                        "n_samples",
                    ],
                    index=contents.index,
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": contents.map(len).astype("int64"),
                    "content_hash": contents.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "sample_rate": meta["sample_rate"].astype("int32"),
                    "n_channels": meta["n_channels"].astype("int32"),
                    "bits_per_sample": meta["bits_per_sample"].astype("int32"),
                    "n_samples": meta["n_samples"].astype("int64"),
                    "duration_ms": (
                        meta["n_samples"] * 1000 // meta["sample_rate"]
                    ).astype("int64"),
                }
            )
            yield out

    return media.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def audio_window_sample(media: DataFrame, window_ms: int = 1000,
                        decode_stub: bool = True) -> DataFrame:
    """One row per ``window_ms`` slice of each clip — the row-explosion
    shape a speech pipeline produces (feature windows / ASR chunks),
    mirroring :func:`frame_sample` for video. Window fingerprint = md5 of
    payload ++ decimal window index, so the DuckDB twin is plain string
    concatenation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "window_idx": [], "window_hash": []}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                content = bytes(content)
                if decode_stub:
                    rate = 8000 * (1 + content[0] % 3) if content else 8000
                    n_samples = len(content) * 100
                else:
                    rate, _, _, n_samples = _wav_meta(content)
                duration_ms = n_samples * 1000 // rate
                n_windows = max(1, -(-duration_ms // window_ms))  # ceil
                for i in range(n_windows):
                    rows["doc_id"].append(did)
                    rows["window_idx"].append(i)
                    rows["window_hash"].append(
                        hashlib.md5(content + str(i).encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        run, schema="doc_id long, window_idx int, window_hash string"
    )


VIDEO_FEATURES_SCHEMA = (
    "doc_id long, byte_len long, content_hash string, width int, "
    "height int, timescale long, n_frames long, duration_ms long"
)


def _mp4_meta(b: bytes) -> tuple[int, int, int, int, int]:
    """Dependency-free ISO-BMFF (MP4/MOV) *container* decode →
    (width, height, timescale, n_frames, duration_ms). Real top-level box
    walking per the published ISO/IEC 14496-12 layout: ``moov/mvhd`` gives
    timescale+duration, the first visual ``trak/tkhd`` gives the 16.16
    fixed-point width/height, and the VIDEO track's ``stts`` entry counts
    sum to the frame count (track selected by ``mdia/hdlr`` = 'vide', or
    nonzero tkhd dims when hdlr is absent — audio/hint sample counts are
    excluded). No sample decoding — the same header-only split as the image
    (PNG/JPEG dims) and audio (RIFF/WAV) parsers; a full codec (H.264
    etc.) is deliberately out of scope in this container. Raises
    ValueError on non-MP4 payloads."""
    import struct  # noqa: PLC0415

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError(f"unrecognized video payload (magic {bytes(b[4:8])!r})")

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", b[i:i + 4])[0]
            typ = b[i + 4:i + 8]
            if size == 1:  # 64-bit largesize
                size = struct.unpack(">Q", b[i + 8:i + 16])[0]
            if size < 8 or i + size > hi:
                break
            yield typ, i + 8, i + size
            i += size

    width = height = None
    timescale = duration = None
    n_frames = 0
    for typ, lo, hi in boxes(0, len(b)):
        if typ != b"moov":
            continue
        for t2, lo2, hi2 in boxes(lo, hi):
            if t2 == b"mvhd":
                ver = b[lo2]
                if ver == 1:
                    timescale = struct.unpack(">I", b[lo2 + 20:lo2 + 24])[0]
                    duration = struct.unpack(">Q", b[lo2 + 24:lo2 + 32])[0]
                else:
                    timescale = struct.unpack(">I", b[lo2 + 12:lo2 + 16])[0]
                    duration = struct.unpack(">I", b[lo2 + 16:lo2 + 20])[0]
            elif t2 == b"trak":
                # accumulate per-track, commit only for the video track:
                # summing stts across audio/hint tracks would inflate
                # n_frames by their sample counts.
                trak_frames = 0
                handler = None
                trak_w = trak_h = 0
                for t3, lo3, hi3 in boxes(lo2, hi2):
                    if t3 == b"tkhd":
                        ver = b[lo3]
                        off = hi3 - 8  # width/height are the LAST 8 bytes
                        w = struct.unpack(">I", b[off:off + 4])[0] >> 16
                        h = struct.unpack(">I", b[off + 4:off + 8])[0] >> 16
                        trak_w, trak_h = w, h
                    elif t3 == b"mdia":
                        for t4, lo4, hi4 in boxes(lo3, hi3):
                            if t4 == b"hdlr":
                                # version+flags(4) + pre_defined(4), then
                                # the 4-byte handler type
                                handler = b[lo4 + 8:lo4 + 12]
                            if t4 != b"minf":
                                continue
                            for t5, lo5, hi5 in boxes(lo4, hi4):
                                if t5 != b"stbl":
                                    continue
                                for t6, lo6, hi6 in boxes(lo5, hi5):
                                    if t6 == b"stts":
                                        n = struct.unpack(
                                            ">I", b[lo6 + 4:lo6 + 8])[0]
                                        for e in range(n):
                                            cnt = struct.unpack(
                                                ">I",
                                                b[lo6 + 8 + e * 8:
                                                  lo6 + 12 + e * 8])[0]
                                            trak_frames += cnt
                # a trak is the video track if hdlr says so, or — for
                # headerless fixtures without hdlr — if tkhd carries
                # nonzero visual dimensions (audio tkhd dims are 0).
                # BOTH dims and frames commit under this test: subtitle/
                # chapter tracks also carry nonzero tkhd dims, so "first
                # nonzero dims" alone would report a caption box's size.
                if handler == b"vide" or (handler is None
                                          and trak_w and trak_h):
                    n_frames += trak_frames
                    if trak_w and trak_h and width is None:
                        width, height = trak_w, trak_h
    if timescale is None:
        raise ValueError("MP4 payload missing moov/mvhd")
    duration_ms = duration * 1000 // max(timescale, 1)
    return (width or 0, height or 0, timescale, n_frames, duration_ms)


def video_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Video container metadata via the same Arrow ``mapInPandas`` path as
    :func:`decode_features`/:func:`audio_features` — completes the
    image/audio/video triad. Stub mode derives deterministic parameters
    from the payload bytes (SQL-twinnable byte arithmetic); real mode
    parses MP4 boxes (``_mp4_meta``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            if decode_stub:
                meta = pd.DataFrame(
                    {
                        "width": contents.map(
                            lambda b: 160 * (1 + b[0] % 4) if len(b) else 160
                        ),
                        "height": contents.map(
                            lambda b: 120 * (1 + b[1] % 4) if len(b) > 1 else 120
                        ),
                        "timescale": contents.map(lambda b: 1000),
                        "n_frames": contents.map(lambda b: len(b) * 2),
                    }
                )
                fps = contents.map(
                    lambda b: 24 + (b[2] % 8) if len(b) > 2 else 24
                )
                duration_ms = meta["n_frames"] * 1000 // fps
            else:
                meta = pd.DataFrame(
                    contents.map(lambda b: _mp4_meta(bytes(b))).tolist(),
                    columns=["width", "height", "timescale", "n_frames",
                             "duration_ms"],
                    index=contents.index,
                )
                duration_ms = meta["duration_ms"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": contents.map(len).astype("int64"),
                    "content_hash": contents.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": meta["width"].astype("int32"),
                    "height": meta["height"].astype("int32"),
                    "timescale": meta["timescale"].astype("int64"),
                    "n_frames": meta["n_frames"].astype("int64"),
                    "duration_ms": duration_ms.astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=VIDEO_FEATURES_SCHEMA)


AHASH_SCHEMA = "doc_id long, ahash string, mean_milli long"


def image_ahash(media: DataFrame, decode_stub: bool = True,
                grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) per image — the cheap image-dedup
    fingerprint: decode, downscale to a ``grid``×``grid`` grayscale
    thumbnail, threshold each cell against the mean, pack the bits into a
    hex string. Near-duplicate images (recompressed, resized, slightly
    cropped) agree on most bits, so Hamming distance over these hashes is
    the image analogue of SimHash near-dup text pairs — compose with
    ``dedup.simhash_neardup_pairs``-style banding for the pair search.

    Runs on the same Arrow ``mapInPandas`` path as ``decode_features``.
    With ``decode_stub`` the "thumbnail" derives deterministic fake
    pixels from the payload's md5 (``pixel_i = first byte of
    md5(md5(payload):i)``) — exercising threshold/packing/batch plumbing
    end-to-end on non-image fixtures with an exact SQL twin; without it,
    the pixels are REAL: PIL decode+resize when PIL is importable (full
    codec), else the built-in pure-stdlib PNG pixel decoder
    (:func:`_png_pixels` zlib inflate + unfilter, then
    :func:`_png_gray_thumb` luma + box-average pooling) — non-PNG
    payloads without PIL fail loudly naming the remedy.
    Thresholding is integer-exact (``pixel·n > sum``, no float mean).

    Returns ``(doc_id, ahash, mean_milli)`` — ``ahash`` is
    ``grid²/4`` hex chars, ``mean_milli = 1000·sum div n``.
    """
    n_px = grid * grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = None if decode_stub else _pil_image()

        def one(b: bytes) -> tuple[str, int]:
            if decode_stub:
                h = hashlib.md5(b).hexdigest()
                px = [
                    int(hashlib.md5(f"{h}:{i}".encode()).hexdigest()[:2], 16)
                    for i in range(n_px)
                ]
            elif pil is not None:
                import io

                img = pil.open(io.BytesIO(b)).convert("L") \
                    .resize((grid, grid))
                px = list(img.getdata())
            else:
                try:
                    px = _png_gray_thumb(bytes(b), grid)
                except ValueError as exc:
                    raise ValueError(
                        f"image_ahash: real decode without PIL supports "
                        f"PNG only ({exc}); install PIL for other "
                        "formats") from exc
            s = sum(px)
            bits = 0
            for p in px:
                bits = (bits << 1) | (1 if p * n_px > s else 0)
            return format(bits, f"0{n_px // 4}x"), 1000 * s // n_px

        for pdf in batches:
            pairs = pdf["content"].map(one)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "ahash": pairs.map(lambda t: t[0]),
                "mean_milli": pd.Series(
                    pairs.map(lambda t: t[1]), dtype="int64"),
            })

    return media.mapInPandas(run, schema=AHASH_SCHEMA)
