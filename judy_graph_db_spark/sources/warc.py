"""WARC / WET web-archive ingest (ISO 28500 — the Common Crawl container
format, the standard entry point of a web-scale training-data pipeline).

Parity note: the reference ingests line-oriented CSV streams
(``FastAccess.hs:323-334``); web corpora arrive as WARC instead, so this
is the web-archive sibling of :mod:`judy_graph_db_spark.sources.edge_list`
— same contract (distributed file split, constant driver memory, malformed
records dropped to a flag column, never an exception).

Spark-first design — the whole parse is scan-stage JVM expressions:

* **Record splitting at the scan**: the text source's multi-character
  ``lineSep`` option splits files on the inter-record boundary
  ``\\r\\n\\r\\nWARC/1.0\\r\\n`` (every record's payload is terminated by
  CRLF CRLF before the next version line, WARC §4). No UDF, no
  per-record Python — executors see one row per record straight off the
  scan, and a .gz input decompresses transparently (one stream per file;
  Common Crawl ships ~64k files per segment, so file-level parallelism is
  the scale axis, exactly as in the real pipelines).
* **Header extraction**: anchored multiline ``regexp_extract`` per named
  header (never ``str_to_map`` — header VALUES may contain the pair
  delimiter).
* **Payload framing**: ``split(record, CRLF CRLF, limit=2)`` — a payload
  containing blank lines stays intact. ``Content-Length`` (bytes) is
  carried through and checked against the parsed payload's byte length;
  a mismatch (delimiter collision inside a payload, truncated tail)
  raises the ``malformed`` flag instead of silently corrupting — the
  DROPMALFORMED contract, but auditable.

Caveat (documented, inherent to delimiter splitting): a payload that
embeds the exact byte sequence ``\\r\\n\\r\\nWARC/1.0\\r\\n`` splits one
record in two; both halves then fail the Content-Length check and are
flagged ``malformed``. Content-Length pre-framing (the warcio approach)
cannot be expressed as a splittable scan; the flag preserves exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SEP = "\r\n\r\nWARC/1.0\r\n"

#: headers surfaced as columns: (column name, WARC header)
_HEADERS = (
    ("warc_type", "WARC-Type"),
    ("record_id", "WARC-Record-ID"),
    ("target_uri", "WARC-Target-URI"),
    ("warc_date", "WARC-Date"),
    ("content_type", "Content-Type"),
)


def _header(headers, name: str):
    """Anchored multiline extract of one WARC header value (NULL when the
    header is absent — regexp_extract returns '' on no-match, mapped)."""
    v = F.regexp_extract(headers, r"(?m)^" + name + r":[ \t]*(.*?)\r?$", 1)
    return F.when(v == "", None).otherwise(v)


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """Parse WARC/WET/WAT files into one row per record:
    ``(warc_type, record_id, target_uri, warc_date, content_type,
    content_length, payload, malformed)``.

    ``payload`` is the raw record block (HTTP headers + body for
    ``response`` records, extracted text for WET ``conversion`` records).
    ``malformed`` marks records whose payload byte length disagrees with
    the declared ``Content-Length`` — filter it like DROPMALFORMED, or
    audit it.
    """
    return parse_warc_records(
        spark.read.option("lineSep", RECORD_SEP).text(path))


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Structured-Streaming sibling of :func:`read_warc_records`: the
    file-stream text source takes the same multi-char ``lineSep``, so a
    landing directory of ``.wet``/``.warc`` files parses incrementally
    with the identical scan-stage expressions — new crawl shards become
    micro-batches with no per-record Python and no state (the parse is
    stateless row-wise; watermarks/dedup compose downstream)."""
    return parse_warc_records(
        spark.readStream.option("lineSep", RECORD_SEP).text(path))


def parse_warc_records(raw: DataFrame) -> DataFrame:
    """The shared scan-stage parse: ``raw`` is any (possibly streaming)
    DataFrame with one WARC record per ``value`` row, as produced by a
    text source with ``lineSep =`` :data:`RECORD_SEP`."""
    # the first record of each file keeps its leading version line; later
    # records had it consumed by the separator
    rec = F.regexp_replace("value", r"\AWARC/1\.0\r\n", "")
    parts = F.split(rec, r"\r\n\r\n", 2)
    # get() not []: a separator collision inside a payload can leave a
    # fragment with NO header/payload blank line — one element after the
    # split, where [1] throws under ANSI and get() yields NULL (which
    # the malformed flag below absorbs). Found by the hypothesis
    # round-trip property.
    headers, body0 = parts[0], F.get(parts, 1)
    cl = _header(headers, "Content-Length").cast("long")
    # Terminator framing by DECLARED length (found by the round-trip
    # property test): a non-final record lost its CRLF CRLF terminator
    # to the separator (byte length == Content-Length, keep as-is); the
    # FINAL record of a file kept it (byte length == Content-Length + 4,
    # strip exactly the tail) — a blind "strip one trailing CRLF CRLF"
    # would corrupt non-final payloads that genuinely end in a blank
    # line. Anything else is malformed; fall back to the blind strip so
    # the byte-length check below flags it.
    blen = F.octet_length(body0)
    payload = (
        F.when(blen == cl, body0)
        .when((blen == cl + 4) & body0.endswith("\r\n\r\n"),
              F.substr(body0, F.lit(1), F.length(body0) - 4))
        .otherwise(F.regexp_replace(body0, r"\r\n\r\n\Z", ""))
    )
    out = raw.select(
        *[_header(headers, h).alias(c) for c, h in _HEADERS],
        cl.alias("content_length"),
        payload.alias("payload"),
    )
    return out.withColumn(
        "malformed",
        F.col("payload").isNull() | F.col("content_length").isNull()
        | (F.octet_length("payload") != F.col("content_length")),
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET extracted-text records as a documents-shaped relation:
    ``(record_id, url, warc_date, text)`` — ``conversion`` records only,
    malformed records dropped (the CSV reader's DROPMALFORMED contract).
    """
    rec = read_warc_records(spark, path)
    return (
        rec.filter((F.col("warc_type") == "conversion") & ~F.col("malformed"))
        .select(
            "record_id",
            F.col("target_uri").alias("url"),
            "warc_date",
            F.col("payload").alias("text"),
        )
    )


def warc_http_responses(records: DataFrame,
                        extract_text: bool = False) -> DataFrame:
    """Split ``response`` records' payload into HTTP status / headers /
    body: ``(record_id, url, warc_date, http_status, http_content_type,
    body[, text])``. With ``extract_text=True`` the body additionally
    passes through :func:`~judy_graph_db_spark.functions.text.strip_html`
    — the WET-conversion step, reproduced from the raw crawl.

    Pure column expressions on the already-parsed relation — composes
    with any upstream filter (e.g. a URI predicate pushed into the scan).
    """
    from judy_graph_db_spark.functions.text import strip_html

    http = F.split(F.col("payload"), r"\r\n\r\n", 2)
    head, body = http[0], http[1]
    status = F.regexp_extract(head, r"\AHTTP/[0-9.]+ (\d{3})", 1)
    out = (
        records.filter((F.col("warc_type") == "response")
                       & ~F.col("malformed"))
        .select(
            "record_id",
            F.col("target_uri").alias("url"),
            "warc_date",
            F.when(status == "", None).otherwise(status)
            .cast("int").alias("http_status"),
            _header(head, "Content-Type").alias("http_content_type"),
            F.coalesce(body, F.lit("")).alias("body"),
        )
    )
    if extract_text:
        out = out.withColumn("text", strip_html(F.col("body")))
    return out


def warc_record_bytes(warc_type: str, headers: dict, payload: str) -> bytes:
    """Serialize one WARC record (the writer side — fixtures, round-trip
    tests, and re-sharding a parsed corpus back to WARC). Content-Length
    is computed from the payload's UTF-8 byte length per WARC §4."""
    body = payload.encode("utf-8")
    lines = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode("utf-8")]
    for k, v in headers.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(body)).encode("ascii"))
    return b"\r\n".join(lines) + b"\r\n\r\n" + body + b"\r\n\r\n"


def write_wet(docs: DataFrame, path: str, url_col: str = "url",
              text_col: str = "text", id_col: str = "doc_id",
              date: str = "2026-01-01T00:00:00Z") -> None:
    """Distributed WET export — the sink side of :func:`read_wet`
    (re-sharding a curated corpus back into the archive format). Each
    row serializes to one conversion record as a pure column expression;
    the text sink's multi-character ``lineSep`` emits the WARC record
    terminator CRLF CRLF after EVERY row, which makes inter-record
    boundaries exactly :data:`RECORD_SEP` — a byte-exact round trip
    through :func:`read_wet` (tested). One output file per partition;
    Content-Length is the payload's UTF-8 byte length (``octet_length``,
    WARC §4)."""
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: "
              "<urn:id:"),
        F.col(id_col).cast("string"),
        F.lit(">\r\nWARC-Target-URI: "), F.col(url_col),
        F.lit("\r\nWARC-Date: " + date + "\r\nContent-Length: "),
        F.octet_length(F.col(text_col)).cast("string"),
        F.lit("\r\n\r\n"), F.col(text_col),
    )
    docs.select(rec.alias("value")).write \
        .option("lineSep", "\r\n\r\n").mode("overwrite").text(path)
