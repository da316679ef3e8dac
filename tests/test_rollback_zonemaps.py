"""Snapshot rollback + manifest zone maps (stats-pruned range scans).

Rollback re-publishes an old manifest as the new latest (Iceberg
``rollback_to_snapshot`` — instant at any table size, nothing on the
data path moves).  Zone maps record per-bucket [min, max] for the
compaction sort columns in the manifest; ``scan_range`` then eliminates
whole buckets before any Spark task launches, and incremental commits
invalidate only the buckets they rewrite (missing stats = cannot prune,
never a wrong result).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from srag_spark.sources.tables import (
    _prune_for_range,
    delete_by_key,
    read_manifest,
    read_table,
    rewrite_table,
    rollback,
    scan_range,
    upsert_by_key,
    vacuum,
)

SCHEMA = "doc_id string, segment_index int, text string"
EVT_SCHEMA = "event_id string, ts timestamp, value double, label string"


def _rows(spark, path, version=None):
    return {
        (r["doc_id"], r["segment_index"]): r["text"]
        for r in read_table(spark, path, version=version).collect()
    }


# ---------------------------------------------------------------------------
# rollback
# ---------------------------------------------------------------------------
def test_rollback_restores_old_snapshot_as_new_version(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(3):  # v1..v3
        upsert_by_key(
            spark, path,
            spark.createDataFrame([(f"d{i}", 0, f"v{i}")], SCHEMA),
            ["doc_id", "segment_index"], n_buckets=2,
        )
    v1_rows = _rows(spark, path, version=1)
    assert rollback(spark, path, 1) == 4
    # the new latest equals v1, the rolled-over history stays readable
    assert _rows(spark, path) == v1_rows
    assert _rows(spark, path, version=3) != v1_rows
    # writes continue on top of the rollback
    upsert_by_key(
        spark, path,
        spark.createDataFrame([("dx", 0, "after")], SCHEMA),
        ["doc_id", "segment_index"],
    )
    assert _rows(spark, path) == {**v1_rows, ("dx", 0): "after"}


def test_rollback_then_vacuum_keeps_referenced_data(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(3):
        upsert_by_key(
            spark, path,
            spark.createDataFrame([(f"d{i}", 0, f"v{i}")], SCHEMA),
            ["doc_id", "segment_index"], n_buckets=2,
        )
    v1_rows = _rows(spark, path, version=1)
    rollback(spark, path, 1)  # v4 references v1's data dirs
    vacuum(spark, path, keep_manifests=1, min_age_seconds=0)
    assert _rows(spark, path) == v1_rows  # data survived the vacuum
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, version=2)  # superseded history aged out


def test_rollback_to_vacuumed_version_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(3):
        upsert_by_key(
            spark, path,
            spark.createDataFrame([(f"d{i}", 0, f"v{i}")], SCHEMA),
            ["doc_id", "segment_index"], n_buckets=2,
        )
    vacuum(spark, path, keep_manifests=1, min_age_seconds=0)
    with pytest.raises(FileNotFoundError):
        rollback(spark, path, 1)


def test_engine_rollback_restores_quadruple(spark, tmp_path):
    from srag_spark.api import SragEngine
    from srag_spark.synth import synth_documents_df

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    docs = synth_documents_df(spark, 8, seed=11)
    eng.ingest(docs.limit(3))
    s1 = eng.snapshot_versions()[-1]
    eng.ingest(docs)
    assert eng.transcripts().count() == 8

    s_new = eng.rollback(s1)
    assert s_new == eng.snapshot_versions()[-1]
    # all readers are back on the old state — transcripts AND chunks
    assert eng.transcripts().count() == 3
    doc_ids = {r["doc_id"] for r in eng.transcripts().select("doc_id").collect()}
    chunk_docs = {
        r["doc_id"] for r in eng.chunks().select("doc_id").distinct().collect()
    }
    assert chunk_docs == doc_ids
    # vacuum retains what the (rolled-back) latest snapshot pins
    eng.vacuum(keep_manifests=1, min_age_seconds=0)
    assert eng.transcripts().count() == 3
    # and ingesting again moves forward from the rolled-back state
    eng.ingest(docs.limit(5))
    assert eng.transcripts().count() == 5


# ---------------------------------------------------------------------------
# zone maps
# ---------------------------------------------------------------------------
def _evt_rows(n=200):
    base = dt.datetime(2024, 1, 1)
    return [
        (
            f"e{i:04d}",
            base + dt.timedelta(minutes=i),
            float(i),
            f"l{i % 7}",
        )
        for i in range(n)
    ]


def _seed_sorted(spark, path, n=200, n_buckets=8):
    upsert_by_key(
        spark, path,
        spark.createDataFrame(_evt_rows(n), EVT_SCHEMA),
        ["event_id"], n_buckets=n_buckets,
    )
    # compaction records zone maps for the sort columns
    rewrite_table(spark, path, sort_by=["ts"], stats_for=["ts", "value"])


def test_zone_maps_recorded_and_scan_range_exact(spark, tmp_path):
    path = str(tmp_path / "evt")
    _seed_sorted(spark, path)
    m = read_manifest(spark, path)
    assert m["stats"], "compaction must record zone maps"
    assert set(next(iter(m["stats"].values()))) == {"ts", "value"}

    lo = dt.datetime(2024, 1, 1, 1, 0)
    hi = dt.datetime(2024, 1, 1, 2, 0)
    got = scan_range(spark, path, "ts", lo, hi)
    want = read_table(spark, path).filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    )
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )
    # numeric column too, half-open range
    got_v = scan_range(spark, path, "value", lo=150.0)
    assert sorted(r["event_id"] for r in got_v.collect()) == [
        f"e{i:04d}" for i in range(150, 200)
    ]


def test_zone_maps_actually_prune(spark, tmp_path):
    path = str(tmp_path / "evt")
    _seed_sorted(spark, path)
    m = read_manifest(spark, path)
    # a narrow value range cannot intersect every hash bucket's [min,max]?
    # value is uniform across buckets (hash bucketing), so prune on a
    # range OUTSIDE the data instead — every bucket must be eliminated
    keep, pruned = _prune_for_range(m, "value", 10_000.0, 20_000.0)
    assert keep == [] and pruned == len(m["buckets"])
    # and a full-range scan prunes nothing
    keep_all, pruned_none = _prune_for_range(m, "value", 0.0, 1_000.0)
    assert pruned_none == 0 and len(keep_all) == len(m["buckets"])
    # the empty-selection scan still returns a well-typed empty frame
    assert scan_range(spark, path, "value", 10_000.0, 20_000.0).count() == 0


def test_upsert_invalidates_touched_buckets_stats_only(spark, tmp_path):
    path = str(tmp_path / "evt")
    _seed_sorted(spark, path)
    n_stats_before = len(read_manifest(spark, path)["stats"])

    # move one existing key far outside its recorded range
    upsert_by_key(
        spark, path,
        spark.createDataFrame(
            [("e0005", dt.datetime(2030, 1, 1), 1e6, "moved")], EVT_SCHEMA
        ),
        ["event_id"],
    )
    m = read_manifest(spark, path)
    assert 0 < len(m["stats"]) < n_stats_before  # only touched buckets dropped
    # correctness survives the stale-stats hazard: the moved row is found
    got = scan_range(spark, path, "ts", dt.datetime(2029, 1, 1), None)
    assert [r["event_id"] for r in got.collect()] == ["e0005"]

    # delete path invalidates the same way
    delete_by_key(
        spark, path,
        spark.createDataFrame([("e0005",)], "event_id string"),
        ["event_id"],
    )
    m2 = read_manifest(spark, path)
    assert len(m2["stats"]) <= len(m["stats"])
    assert scan_range(spark, path, "ts", dt.datetime(2029, 1, 1), None).count() == 0

    # recompaction re-records every bucket's stats
    rewrite_table(spark, path)
    assert len(read_manifest(spark, path)["stats"]) == len(
        read_manifest(spark, path)["buckets"]
    )


def test_zone_maps_all_null_bucket_pruned_exactly(spark, tmp_path):
    path = str(tmp_path / "evt")
    rows = [("a", None, None, "x"), ("b", dt.datetime(2024, 6, 1), 5.0, "y")]
    upsert_by_key(
        spark, path,
        spark.createDataFrame(rows, EVT_SCHEMA),
        ["event_id"], n_buckets=4,
    )
    rewrite_table(spark, path, sort_by=["ts"])
    # a range predicate never matches null: result identical to filter
    got = scan_range(spark, path, "ts", dt.datetime(2024, 1, 1), None)
    assert [r["event_id"] for r in got.collect()] == ["b"]


def test_scan_range_without_stats_is_plain_filter(spark, tmp_path):
    path = str(tmp_path / "evt")
    upsert_by_key(
        spark, path,
        spark.createDataFrame(_evt_rows(50), EVT_SCHEMA),
        ["event_id"], n_buckets=4,
    )  # no rewrite → no stats
    got = scan_range(spark, path, "value", 10.0, 20.0)
    assert got.count() == 11
