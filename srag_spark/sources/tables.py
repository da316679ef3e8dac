"""Table storage helpers: the engine's sink layer.

The reference persists to Postgres with upserts
(PostgresTranscriptRepository.scala:39-58 ``INSERT ... ON CONFLICT(id) DO
UPDATE``), deletes lexical segments by transcript before re-indexing
(OpenSearchAdapter.scala:147-181), and tolerates replays (J7).  On a lake
the same semantics are Iceberg ``MERGE INTO`` / row-level deletes; this
container has no Iceberg runtime, so these helpers implement the
equivalent contract over plain parquet:

* ``upsert_by_key`` — read-modify-overwrite: existing rows whose key
  collides with incoming rows are replaced (right-biased, like ON
  CONFLICT DO UPDATE); all writes land via a temp-dir swap so a crash
  mid-write never corrupts the table;
* ``delete_by_key`` — anti-join overwrite (S10);
* both are idempotent: replaying the same batch converges (J7).

At 100 TB these become Iceberg MERGE/DELETE on a partitioned table — the
call sites don't change, only this module.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _swap_write(df: DataFrame, path: str) -> None:
    """Write to a temp dir then atomically swap into place (rename)."""
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, path)


def read_table(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


def upsert_by_key(
    spark: SparkSession, path: str, incoming: DataFrame, key_cols: list[str]
) -> None:
    """MERGE-INTO-equivalent: replace rows matching incoming keys, insert
    the rest (right-biased upsert, S4 semantics)."""
    if not os.path.exists(path):
        _swap_write(incoming, path)
        return
    existing = spark.read.parquet(path)
    kept = existing.join(
        incoming.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    _swap_write(kept.unionByName(incoming), path)


def delete_by_key(
    spark: SparkSession, path: str, keys: DataFrame, key_cols: list[str]
) -> None:
    """Row-level delete: drop rows whose key appears in ``keys`` (S10)."""
    if not os.path.exists(path):
        return
    existing = spark.read.parquet(path)
    _swap_write(
        existing.join(keys.select(*key_cols).distinct(), key_cols, "left_anti"),
        path,
    )
