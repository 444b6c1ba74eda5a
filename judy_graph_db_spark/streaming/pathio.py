"""Filesystem shim for the versioned stores (near-dup LSH, SCD2
dimensions, crawl corpus).

The stores' slice discovery and crash-marker protocol were originally
plain ``os.listdir``/``os.path.exists``/``open`` — POSIX-only, which
silently restricts the entire streaming surface to a single machine. On
any real cluster the store root is ``hdfs://``/``s3a://``/``gs://`` and
the driver must go through the Hadoop ``FileSystem`` API instead. This
module is that one seam: every store routes its listing, marker reads /
writes, renames and deletes through these helpers, which resolve the
active ``SparkSession``'s JVM and dispatch to the scheme's registered
``FileSystem`` (``LocalFileSystem`` for bare and ``file:`` paths, so
local tests exercise the same code path a cluster uses). When no session
is active (e.g. pure-python unit code), the helpers fall back to ``os``
semantics for bare/``file:`` paths and refuse remote schemes loudly.

All files touched here are tiny control-plane artifacts (JSON markers of
a few hundred bytes); the data plane stays ``spark.read/write.parquet``,
which already speaks every Hadoop filesystem.
"""

from __future__ import annotations

import os
import posixpath
import shutil


def pjoin(base: str, *parts: str) -> str:
    """URI-safe path join: plain POSIX segment joining, correct for both
    bare paths and scheme-qualified URIs (``s3a://bucket/store`` +
    ``flags`` → ``s3a://bucket/store/flags``)."""
    return posixpath.join(base, *parts)


def _strip_file_scheme(path: str) -> str | None:
    """Local-OS form of a path, or None when it needs a real Hadoop FS.
    ``file:/x``, ``file:///x`` and bare ``/x`` all map to ``/x``."""
    if "://" not in path and not path.startswith("file:"):
        return path
    if path.startswith("file://"):
        rest = path[len("file://"):]
        return rest if rest.startswith("/") else "/" + rest
    if path.startswith("file:"):
        return path[len("file:"):]
    return None


def _jfs(path: str):
    """(FileSystem, Path, jvm) via the active session, or (None,)*3."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return None, None, None
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jp, jvm


def _local_or_raise(path: str) -> str:
    local = _strip_file_scheme(path)
    if local is None:
        raise RuntimeError(
            f"no active SparkSession to resolve remote path {path!r}")
    return local


def fs_listdir(path: str) -> list:
    """Child basenames of ``path`` ([] when it does not exist)."""
    fs, jp, _ = _jfs(path)
    if fs is None:
        local = _local_or_raise(path)
        return os.listdir(local) if os.path.isdir(local) else []
    if not fs.exists(jp):
        return []
    return [st.getPath().getName() for st in fs.listStatus(jp)]


def fs_exists(path: str) -> bool:
    fs, jp, _ = _jfs(path)
    if fs is None:
        return os.path.exists(_local_or_raise(path))
    return bool(fs.exists(jp))


def fs_isdir(path: str) -> bool:
    fs, jp, _ = _jfs(path)
    if fs is None:
        return os.path.isdir(_local_or_raise(path))
    return bool(fs.exists(jp)) and bool(fs.getFileStatus(jp).isDirectory())


def fs_read_text(path: str) -> str:
    fs, jp, jvm = _jfs(path)
    if fs is None:
        with open(_local_or_raise(path)) as fh:
            return fh.read()
    stream = fs.open(jp)
    bos = jvm.java.io.ByteArrayOutputStream()
    # copyBytes closes both ends when closeStreams=True
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 4096, True)
    return bos.toString("UTF-8")


def fs_write_text(path: str, text: str) -> None:
    """Create-or-overwrite a small text file (marker protocol: callers
    write data first, marker last — this is the marker write)."""
    fs, jp, _ = _jfs(path)
    if fs is None:
        with open(_local_or_raise(path), "w") as fh:
            fh.write(text)
        return
    out = fs.create(jp, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()


def fs_delete(path: str) -> None:
    """Recursive delete, silent when missing (rmtree ignore_errors)."""
    fs, jp, _ = _jfs(path)
    if fs is None:
        local = _local_or_raise(path)
        if os.path.isdir(local):
            shutil.rmtree(local, ignore_errors=True)
        elif os.path.exists(local):
            os.remove(local)
        return
    fs.delete(jp, True)


def fs_rename(src: str, dst: str) -> None:
    """Directory move; the destination must not exist (callers delete a
    crashed leftover first — HDFS/S3A rename does not clobber)."""
    fs, jp_src, _ = _jfs(src)
    if fs is None:
        os.rename(_local_or_raise(src), _local_or_raise(dst))
        return
    fs2, jp_dst, _ = _jfs(dst)
    if not fs.rename(jp_src, jp_dst):
        raise IOError(f"rename failed: {src} -> {dst}")
