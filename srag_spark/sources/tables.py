"""Table storage helpers: the engine's sink layer.

The reference persists to Postgres with upserts
(PostgresTranscriptRepository.scala:39-58 ``INSERT ... ON CONFLICT(id) DO
UPDATE``), deletes lexical segments by transcript before re-indexing
(OpenSearchAdapter.scala:147-181), and tolerates replays (J7).  On a lake
the same semantics are Iceberg ``MERGE INTO`` / row-level deletes; this
container has no Iceberg runtime, so these helpers implement the
equivalent contract over plain parquet **bucketed by key hash**:

* tables are laid out as parquet partitioned by
  ``_kb = pmod(xxhash64(bucket_col), n_buckets)`` — the unit of rewrite.
  The bucket column is the FIRST key column (the entity id, e.g.
  ``doc_id``), so both full-key upserts and entity-level deletes
  (delete-all-segments-of-transcript, the reference's S10 shape) prune
  to the same buckets;
* ``upsert_by_key`` / ``delete_by_key`` rewrite ONLY the buckets that
  contain incoming keys, via dynamic partition overwrite (the Iceberg
  ``overwritePartitions`` analogue).  Partition pruning keeps the read
  side to the touched buckets too — a 1-row upsert into a 10k-bucket
  100 TB table reads and rewrites ~1/10k of it, not all of it;
* both are idempotent: replaying the same batch converges (J7);
* no POSIX renames: everything goes through Spark's committed
  partition-overwrite protocol, which works on object stores.
  Durability caveat (documented, not hidden): without a manifest layer,
  plain-parquet dynamic overwrite is not atomic ACROSS buckets — a crash
  mid-commit can leave some buckets updated and others not.  Each bucket
  itself is replaced atomically by the commit protocol, and replaying
  the batch converges.  Iceberg MERGE adds cross-bucket atomicity; the
  call sites don't change, only this module.

``n_buckets`` and the bucket column are fixed at table creation and
recorded in a ``_kb_meta`` sidecar (files starting with ``_`` are
invisible to the parquet reader).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_kb"
DEFAULT_KEY_BUCKETS = 64
_META_FILE = "_kb_meta"


def _key_bucket(bucket_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(bucket_col), F.lit(n_buckets)).cast("int")


def _read_meta(path: str) -> tuple[int, str] | None:
    meta = os.path.join(path, _META_FILE)
    if os.path.exists(meta):
        with open(meta) as fh:
            n, col = fh.read().strip().split(":", 1)
            return int(n), col
    return None


def _write_meta(path: str, n_buckets: int, bucket_col: str) -> None:
    with open(os.path.join(path, _META_FILE), "w") as fh:
        fh.write(f"{n_buckets}:{bucket_col}")


def table_exists(path: str) -> bool:
    return os.path.exists(path)


def read_table(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a bucketed table, hiding the internal bucket column."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(path)
    return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df


def _layout(path: str, key_cols: list[str], n_buckets: int) -> tuple[int, str]:
    meta = _read_meta(path)
    if meta is not None:
        n, col = meta
        if col not in key_cols:
            raise ValueError(
                f"table at {path} is bucketed by {col!r}; keys {key_cols} "
                "must include it for partition-scoped rewrites"
            )
        return n, col
    return n_buckets, key_cols[0]


def upsert_by_key(
    spark: SparkSession,
    path: str,
    incoming: DataFrame,
    key_cols: list[str],
    n_buckets: int = DEFAULT_KEY_BUCKETS,
) -> None:
    """MERGE-INTO-equivalent: replace rows matching incoming keys, insert
    the rest (right-biased upsert, S4 semantics).  Rewrites ONLY the
    key-hash buckets touched by ``incoming`` (dynamic partition
    overwrite); untouched buckets' files are left in place."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    n_buckets, bcol = _layout(path, key_cols, n_buckets)
    inc = incoming.withColumn(BUCKET_COL, _key_bucket(bcol, n_buckets))
    if not table_exists(path):
        inc.write.partitionBy(BUCKET_COL).parquet(path)
        _write_meta(path, n_buckets, bcol)
        return
    touched = [r[0] for r in inc.select(BUCKET_COL).distinct().collect()]
    # partition pruning: only the touched buckets are scanned
    existing = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    kept = existing.join(
        incoming.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    out = kept.unionByName(inc)
    # break lineage off the output path before overwriting it (Spark
    # refuses to overwrite a path it is reading from); the materialized
    # set is bounded by the touched buckets, which is the point
    out = out.localCheckpoint(eager=True)
    out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)


def delete_by_key(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_cols: list[str],
) -> None:
    """Row-level delete: drop rows whose key appears in ``keys`` (S10 —
    the reference deletes all lexical segments of a transcript before
    re-indexing).  ``key_cols`` may be a key prefix as long as it
    includes the table's bucket column; only buckets that can contain
    the keys are scanned and rewritten."""
    if not table_exists(path):
        return
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    n_buckets, bcol = _layout(path, key_cols, DEFAULT_KEY_BUCKETS)
    keyed = keys.select(*key_cols).distinct().withColumn(
        BUCKET_COL, _key_bucket(bcol, n_buckets)
    )
    touched = [r[0] for r in keyed.select(BUCKET_COL).distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    remaining = existing.join(
        keyed.drop(BUCKET_COL), key_cols, "left_anti"
    ).localCheckpoint(eager=True)
    # dynamic overwrite only replaces partitions PRESENT in the output —
    # a bucket whose rows all died must be dropped explicitly (Iceberg
    # row-level DELETE subsumes this)
    nonempty = {
        r[0] for r in remaining.select(BUCKET_COL).distinct().collect()
    }
    remaining.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    for b in touched:
        if b not in nonempty:
            shutil.rmtree(
                os.path.join(path, f"{BUCKET_COL}={b}"), ignore_errors=True
            )
