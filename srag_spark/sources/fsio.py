"""Object-store-safe filesystem primitives via the Hadoop FileSystem API.

Every path the engine touches for metadata (manifests, checkpoints,
markers) goes through ``org.apache.hadoop.fs.FileSystem`` — the same
abstraction Spark's own committers use — so the sink layer runs unchanged
wherever a 100 TB table actually lives (HDFS, S3A, GCS, ABFS, local).
No ``os`` / ``shutil`` / ``open()`` calls anywhere in the sink path.

Small-file reads go through ``spark.read`` (wholetext), writes through
``FileSystem.create``; the single rename used for manifest commits is
atomic on HDFS and local filesystems.  On S3 proper, swap
:func:`rename_atomic` for a conditional PUT (If-None-Match) — one
function, documented at the call site in :mod:`srag_spark.sources.tables`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    """FileSystem instance for the scheme of ``path`` (local, s3a, ...)."""
    return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def exists(spark: SparkSession, path: str) -> bool:
    return _fs(spark, path).exists(_jpath(spark, path))


def mkdirs(spark: SparkSession, path: str) -> None:
    _fs(spark, path).mkdirs(_jpath(spark, path))


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs = _fs(spark, path)
    p = _jpath(spark, path)
    if not fs.exists(p):
        return False
    return fs.delete(p, recursive)


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child file/dir names (not full paths) of a directory; [] if absent."""
    fs = _fs(spark, path)
    p = _jpath(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def write_text(spark: SparkSession, path: str, data: str) -> None:
    """Create/overwrite a small text file through the FS API."""
    fs = _fs(spark, path)
    out = fs.create(_jpath(spark, path), True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small text file (one object — e.g. a manifest)."""
    row = spark.read.option("wholetext", "true").text(path).head()
    return row[0] if row is not None else ""


def rename_atomic(spark: SparkSession, src: str, dst: str) -> bool:
    """Atomic single-object rename (HDFS/local: atomic; S3: replace with a
    conditional PUT).  Returns False if ``dst`` already exists — the
    optimistic-concurrency signal for manifest commits."""
    fs = _fs(spark, src)
    if fs.exists(_jpath(spark, dst)):
        return False
    return bool(fs.rename(_jpath(spark, src), _jpath(spark, dst)))
