"""Scheme-agnostic filesystem helpers for driver-side state IO.

The iterative solvers and streaming sinks keep small driver-side state
beside their Spark-written parquet: checkpoint discovery (list the
``superstep_*`` / ``scc_outer_*`` / ``batch_id=N`` directories), meta
JSON validity markers (written LAST so their presence marks the parquet
tables complete), and the HyperBall per-superstep totals file.

Doing that with ``os.path`` / ``open()`` silently breaks the moment the
checkpoint/state dir lives on HDFS or S3 — the normal multi-executor
deployment (the data half of the checkpoint goes through Spark writers
and lands remotely; the discovery half looks at the driver's LOCAL disk,
finds nothing, and every run cold-starts — or the meta ``open()`` raises
after the parquet writes already succeeded). These helpers route the
same operations through the JVM Hadoop FileSystem API obtained from the
active ``SparkSession``, so one code path serves ``/local/dir``,
``file:///...``, ``hdfs://...`` and ``s3a://...`` alike. Local-path
behavior is unchanged (Hadoop's ``LocalFileSystem`` backs bare paths).

Semantics notes for object stores:

* ``write_text`` uses ``create(overwrite=True)`` — single-writer
  contexts only (our meta markers are written once per checkpoint by
  the one driver; microbatches are sequential per streaming query).
* ``replace_text`` emulates ``os.replace`` with write-tmp + rename,
  falling back to a plain overwrite where rename-onto is refused
  (rename-based atomicity is not available on S3 anyway; the totals
  file tolerates a re-write because the reader validates contents).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = [
    "fs_and_path",
    "exists",
    "list_dir",
    "read_text",
    "write_text",
    "replace_text",
    "delete",
]


def fs_and_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Hadoop Path) for ``path`` under the session's
    Hadoop configuration — the FS is resolved per path scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = fs_and_path(spark, path)
    return bool(fs.exists(p))


def list_dir(spark: SparkSession, path: str) -> list[str]:
    """Sorted child basenames of ``path``; [] if it doesn't exist or is
    not a directory (mirrors the old isdir+listdir discovery contract)."""
    fs, p = fs_and_path(spark, path)
    if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(p)
    )


def read_text(spark: SparkSession, path: str) -> str:
    """Full contents of a (small) file as str. Raises if missing."""
    fs, p = fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # IOUtils.toByteArray drains the stream JVM-side in one call
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Create/overwrite a small file with ``text`` (parents created)."""
    fs, p = fs_and_path(spark, path)
    stream = fs.create(p, True)  # overwrite=True
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()


def replace_text(spark: SparkSession, path: str, text: str) -> None:
    """Write ``text`` to ``path`` via tmp-file + rename (atomic on
    HDFS/local; best-effort on object stores, where a plain overwrite is
    the fallback — acceptable for state whose reader validates it)."""
    fs, p = fs_and_path(spark, path)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(str(p) + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(text.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        # rename refused (some object stores): fall back to direct write
        write_text(spark, path, text)
        fs.delete(tmp, False)


def delete(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    fs, p = fs_and_path(spark, path)
    if not fs.exists(p):
        return False
    return bool(fs.delete(p, recursive))
