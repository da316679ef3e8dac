"""Bloom membership sidecar (operators/bloom.py): no false negatives,
near-zero false positives at the documented sizing, missing-bucket
probes, sketch-style merge ≡ unioned build, position-set oracle
equivalence (the DuckDB-reproducible formulation), and the
incremental-dedup exact-path prefilter contract."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from srag_spark.operators.bloom import (
    bloom_from_index,
    bloom_probe,
    build_bloom,
    md5_bucket_col,
    merge_blooms,
)
from srag_spark.operators.dedup import build_dedup_index, incremental_dedup

SF_DIR = "/root/testdata/sf0.001"


def _keys(spark, prefix: str, n: int):
    return spark.createDataFrame(
        [(f"{prefix}-{i}",) for i in range(n)], "k string"
    ).withColumn("bucket", md5_bucket_col(F.col("k"), 8))


def test_no_false_negatives(spark):
    base = _keys(spark, "base", 200)
    blooms = build_bloom(base, "k", "bucket", n_hash=3, hex_digits=4)
    probed = bloom_probe(base, blooms, "k", "bucket", n_hash=3, hex_digits=4)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_foreign_keys_miss(spark):
    """~25 keys per bucket against a 65,536-bit space: FP probability per
    probe ≈ 1.5e-9 — all 200 deterministic foreign keys must miss."""
    base = _keys(spark, "base", 200)
    other = _keys(spark, "other", 200)
    blooms = build_bloom(base, "k", "bucket", n_hash=3, hex_digits=4)
    probed = bloom_probe(other, blooms, "k", "bucket", n_hash=3, hex_digits=4)
    assert probed.filter(F.col("bloom_hit")).count() == 0


def test_missing_bucket_probes_false(spark):
    base = _keys(spark, "base", 100)
    blooms = build_bloom(base, "k", "bucket", n_hash=3, hex_digits=4).filter(
        F.col("bucket") != 0
    )
    probed = bloom_probe(base, blooms, "k", "bucket", n_hash=3, hex_digits=4)
    rows = probed.select("bucket", "bloom_hit").collect()
    assert all(not r["bloom_hit"] for r in rows if r["bucket"] == 0)
    assert all(r["bloom_hit"] for r in rows if r["bucket"] != 0)


def test_bitmap_shape_and_counts(spark):
    base = _keys(spark, "base", 50)
    blooms = build_bloom(base, "k", "bucket", n_hash=3, hex_digits=4).collect()
    assert all(len(r["bitmap"]) == 16**4 // 64 for r in blooms)
    assert sum(r["n_keys"] for r in blooms) == 50


def test_merge_equals_union_build(spark):
    a = _keys(spark, "alpha", 80)
    b = _keys(spark, "beta", 70)
    ba = build_bloom(a, "k", "bucket", n_hash=3, hex_digits=4)
    bb = build_bloom(b, "k", "bucket", n_hash=3, hex_digits=4)
    merged = {r["bucket"]: r for r in merge_blooms(ba, bb).collect()}
    union = {
        r["bucket"]: r
        for r in build_bloom(
            a.unionByName(b), "k", "bucket", n_hash=3, hex_digits=4
        ).collect()
    }
    assert set(merged) == set(union)
    for bk in union:
        assert merged[bk]["bitmap"] == union[bk]["bitmap"], bk
        # double-count-free here (disjoint key sets): bound is exact
        assert merged[bk]["n_keys"] == union[bk]["n_keys"]


def test_probe_matches_position_set_oracle(spark):
    """The bitmap path must yield the verdict the docstring promises a
    bitmap-free engine can reproduce: all n_hash hex-prefix positions
    present in the base bucket's distinct position set."""
    base = _keys(spark, "base", 60)
    mixed = _keys(spark, "base", 90)  # first 60 present, last 30 new
    blooms = build_bloom(base, "k", "bucket", n_hash=3, hex_digits=4)
    got = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe(
            mixed, blooms, "k", "bucket", n_hash=3, hex_digits=4
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base AS SELECT 'base-' || i::VARCHAR AS k "
        "FROM range(0, 60) t(i)"
    )
    con.execute(
        "CREATE TABLE mixed AS SELECT 'base-' || i::VARCHAR AS k "
        "FROM range(0, 90) t(i)"
    )
    want = dict(
        con.execute(
            """
            WITH bpos AS (
              SELECT DISTINCT substr(md5(k), 1, 12) AS hx,
                     substr(md5(i::VARCHAR || ':' || k), 1, 4) AS p
              FROM base, range(0, 3) t(i)
            ),
            probe AS (
              SELECT k, substr(md5(k), 1, 12) AS hx,
                     substr(md5(i::VARCHAR || ':' || k), 1, 4) AS p
              FROM mixed, range(0, 3) t(i)
            )
            SELECT probe.k, bool_and(b.p IS NOT NULL) AS hit
            FROM probe LEFT JOIN bpos b
              ON b.hx = probe.hx AND b.p = probe.p
            GROUP BY probe.k
            """
        ).fetchall()
    )
    # the oracle twins the bucket via the same md5 12-hex prefix the
    # Spark side reduces mod n_buckets; bucketing only partitions the
    # position space, so matching on the full prefix is strictly finer
    # and equality still must hold for every key that shares a bucket.
    # Verify verdict equality on the bitmap path directly:
    for k, hit in want.items():
        assert got[k] == hit, k
    assert all(got[f"base-{i}"] for i in range(60))
    assert not any(got[f"base-{i}"] for i in range(60, 90))


def test_exact_prefilter_never_drops_a_real_dup(spark):
    """Prefilter contract for incremental dedup: a batch doc whose
    text_hash is in the base index ALWAYS probes true (no false
    negatives), so bloom-miss docs can skip the base exact join."""
    base = spark.createDataFrame(
        [(i, f"base document number {i} with some shared words") for i in range(40)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, "base document number 7 with some shared words")]  # exact dup
        + [(101 + i, f"fresh unseen text {i} about novel topics") for i in range(20)],
        "doc_id long, text string",
    )
    idx = build_dedup_index(base)
    blooms = bloom_from_index(idx, n_buckets=8, n_hash=3, hex_digits=4)

    new_idx = build_dedup_index(new).withColumn(
        "bucket", md5_bucket_col(F.col("text_hash"), 8)
    )
    probed = bloom_probe(
        new_idx, blooms, "text_hash", "bucket", n_hash=3, hex_digits=4
    )
    verdicts = {
        r["doc_id"]: r["dup_exact"]
        for r in incremental_dedup(new, idx).collect()
    }
    hits = {r["doc_id"]: r["bloom_hit"] for r in probed.collect()}
    for doc_id, dup in verdicts.items():
        if dup:
            assert hits[doc_id], doc_id
    assert hits[100]
    # and the prefilter actually prunes: fresh docs mostly miss
    assert sum(1 for d, h in hits.items() if not h) >= 19


def test_driver_entry_matches_oracle(spark):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["bloom_probe"](spark, SF_DIR)
    srows = {r["doc_id"]: r["bloom_hit"] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    orows = dict(con.execute(entrymod.oracle_sql()["bloom_probe"]).fetchall())
    assert srows == orows
    assert any(srows.values()) and not all(srows.values())
