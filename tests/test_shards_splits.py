"""Deterministic split assignment and global shuffle/sharding
(corpus.assign_splits / corpus.assign_shards).
"""

from __future__ import annotations

import duckdb
import pytest

from srag_spark.operators.corpus import assign_shards, assign_splits

SF_DIR = "/root/testdata/sf0.001"
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _ids(spark, n, start=0):
    return spark.range(start, start + n).withColumnRenamed("id", "doc_id")


def test_split_fractions_and_coverage(spark):
    out = assign_splits(_ids(spark, 2000), SPLITS, seed=7)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg({"*": "count"})
                 .withColumnRenamed("count(1)", "n").collect()}
    assert sum(counts.values()) == 2000  # total partition, nothing dropped
    assert counts["train"] == pytest.approx(1600, rel=0.08)
    assert counts["val"] == pytest.approx(200, rel=0.35)
    assert counts["test"] == pytest.approx(200, rel=0.35)


def test_split_stable_under_corpus_growth(spark):
    """A doc never migrates between splits when the corpus grows — the
    property that keeps eval sets uncontaminated across refreshes."""
    small = {r["doc_id"]: r["split"]
             for r in assign_splits(_ids(spark, 500), SPLITS).collect()}
    big = {r["doc_id"]: r["split"]
           for r in assign_splits(_ids(spark, 5000), SPLITS).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_split_validation(spark):
    with pytest.raises(ValueError):
        assign_splits(_ids(spark, 10), {"train": 0.5, "val": 0.2})
    with pytest.raises(ValueError):
        assign_splits(_ids(spark, 10), {})


def test_shards_partition_count_independent(spark):
    """The (shard_id, shard_pos) assignment is a pure function of
    (doc_id, seed): identical at any input partitioning."""
    a = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
         for r in assign_shards(_ids(spark, 1000), 16).collect()}
    b = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
         for r in assign_shards(_ids(spark, 1000).repartition(17), 16).collect()}
    assert a == b


def test_shard_positions_are_contiguous(spark):
    out = assign_shards(_ids(spark, 500), 8).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(8))
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), s


def test_shard_sizes_balanced(spark):
    out = assign_shards(_ids(spark, 4000), 8).groupBy("shard_id").count()
    sizes = [r["count"] for r in out.collect()]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes)  # uniform hash, no skew


def test_seed_changes_order(spark):
    a = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
         for r in assign_shards(_ids(spark, 300), 4, seed=1).collect()}
    b = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
         for r in assign_shards(_ids(spark, 300), 4, seed=2).collect()}
    assert a != b


def test_entries_match_duckdb_oracle(spark):
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    for name in ("corpus_splits", "corpus_shards"):
        sdf = entrymod.queries()[name](spark, SF_DIR)
        srows = {tuple(r) for r in sdf.collect()}
        orows = {tuple(r) for r in
                 con.execute(entrymod.oracle_sql()[name]).fetchall()}
        assert srows == orows, name


def test_write_shards_layout_and_determinism(spark, tmp_path):
    """write_shards materializes one parquet dir per shard with rows in
    shard_pos order, a counts manifest, and byte-stable membership
    across re-writes; read_shards(shard_id=K) returns exactly shard K."""


    from srag_spark.operators.corpus import (
        read_shards,
        read_shards_manifest,
        write_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(97)], "doc_id long, text string"
    )
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_shards(docs, p1, n_shards=8, seed=3)
    m2 = write_shards(docs, p2, n_shards=8, seed=3)
    assert m1 == m2
    assert m1["n_docs"] == 97 and m1["n_shards"] == 8
    assert sum(m1["counts"].values()) == 97
    assert read_shards_manifest(spark, p1) == m1

    all_rows = read_shards(spark, p1).collect()
    assert len(all_rows) == 97
    assert {r["doc_id"] for r in all_rows} == set(range(97))

    got, seen = {}, set()
    for k in range(8):
        rows = read_shards(spark, p1, shard_id=k).collect()
        assert len(rows) == m1["counts"][str(k)]
        poss = sorted(r["shard_pos"] for r in rows)
        assert poss == list(range(1, len(rows) + 1))  # dense positions
        seen |= {r["doc_id"] for r in rows}
        got[k] = {r["doc_id"] for r in rows}
    assert seen == set(range(97))

    # membership identical across the two writes
    for k in range(8):
        other = {r["doc_id"] for r in read_shards(spark, p2, shard_id=k).collect()}
        assert got[k] == other
