"""Streaming dedup ingest (streaming/dedup_ingest): cross-batch dedup
through the committed index, per-epoch stats, replay convergence, and
the corpus-first commit-order crash protocol."""

from __future__ import annotations

from srag_spark.operators.dedup import build_dedup_index, incremental_dedup
from srag_spark.sources.tables import read_table, upsert_by_key
from srag_spark.streaming.dedup_ingest import (
    dedup_batch_sink,
    start_dedup_stream,
)

D1 = "the quick brown fox jumps over the lazy dog near the river bank today"
D2 = "completely different text about cooking pasta with fresh tomato sauce"
D1_NEAR = "the quick brown fox jumps over the lazy dog near the river bank"
D6 = "a totally novel piece of writing about deep sea exploration vessels"
SCHEMA = "doc_id long, text string"


def _drop(spark, in_dir, rows, mode):
    spark.createDataFrame(rows, SCHEMA).write.mode(mode).parquet(in_dir)


def _run_once(spark, in_dir, paths, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = start_dedup_stream(
        stream, paths["idx"], paths["corpus"], ckpt,
        stats_path=paths["stats"], n_buckets=4, trigger_once=True,
    )
    q.awaitTermination(180)


def _ids(spark, path):
    return {r["doc_id"] for r in read_table(spark, path).collect()}


def test_stream_dedups_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    paths = {k: str(tmp_path / k) for k in ("idx", "corpus", "stats")}

    # round 1: two uniques + an in-batch exact copy
    _drop(spark, in_dir, [(1, D1), (2, D2), (3, D1)], "overwrite")
    _run_once(spark, in_dir, paths, ckpt)
    assert _ids(spark, paths["corpus"]) == {1, 2}
    assert _ids(spark, paths["idx"]) == {1, 2}

    # round 2: exact copy of 2 (cross-batch, via the index), near copy
    # of 1, and a fresh doc — only the fresh doc lands
    _drop(spark, in_dir, [(4, D2), (5, D1_NEAR), (6, D6)], "append")
    _run_once(spark, in_dir, paths, ckpt)
    assert _ids(spark, paths["corpus"]) == {1, 2, 6}
    assert _ids(spark, paths["idx"]) == {1, 2, 6}

    # round 3: nothing but duplicates — state unchanged (empty-kept path)
    _drop(spark, in_dir, [(7, D1), (8, D6)], "append")
    _run_once(spark, in_dir, paths, ckpt)
    assert _ids(spark, paths["corpus"]) == {1, 2, 6}

    stats = sorted(
        read_table(spark, paths["stats"]).collect(),
        key=lambda r: r["epoch_id"],
    )
    assert [(r["n_docs"], r["n_kept"]) for r in stats] == [(3, 2), (3, 1), (2, 0)]
    assert [r["n_dup_in_batch"] for r in stats] == [1, 0, 0]
    assert [r["n_dup_exact"] for r in stats] == [0, 1, 2]
    # near flags are not exclusive: the exact copy of doc 2 also matches
    # at est_jaccard = 1.0, alongside the near copy of doc 1
    assert stats[1]["n_dup_near"] == 2


def test_stream_replay_converges(spark, tmp_path):
    """A fresh checkpoint over the same input (full at-least-once
    re-delivery) leaves corpus and index byte-identical."""
    in_dir = str(tmp_path / "in")
    paths = {k: str(tmp_path / k) for k in ("idx", "corpus", "stats")}
    _drop(spark, in_dir, [(1, D1), (2, D2), (3, D1)], "overwrite")
    _run_once(spark, in_dir, paths, str(tmp_path / "ckpt1"))
    before = _ids(spark, paths["corpus"]), _ids(spark, paths["idx"])
    _run_once(spark, in_dir, paths, str(tmp_path / "ckpt2"))
    after = _ids(spark, paths["corpus"]), _ids(spark, paths["idx"])
    assert before == after == ({1, 2}, {1, 2})


def test_crash_between_commits_converges(spark, tmp_path):
    """Simulate a crash AFTER the corpus upsert but BEFORE the index
    append, then replay the full sink: the final state equals the
    one-shot run (the corpus-first ordering makes the verdicts of the
    replay identical to the crashed attempt's)."""
    paths = {k: str(tmp_path / k) for k in ("idx", "corpus", "stats")}
    batch = spark.createDataFrame([(1, D1), (2, D2), (3, D1)], SCHEMA)

    # crashed attempt: corpus committed, index NOT
    ann = incremental_dedup(batch, build_dedup_index(batch.limit(0)))
    kept = batch.join(ann.filter("keep").select("doc_id"), "doc_id")
    upsert_by_key(spark, paths["corpus"], kept, ["doc_id"], n_buckets=4)
    assert _ids(spark, paths["corpus"]) == {1, 2}

    # replay of the same micro-batch through the real sink
    dedup_batch_sink(
        spark, batch, paths["idx"], paths["corpus"],
        stats_path=paths["stats"], epoch_id=0, n_buckets=4,
    )
    assert _ids(spark, paths["corpus"]) == {1, 2}
    assert _ids(spark, paths["idx"]) == {1, 2}

    # and a second full replay (post-both-commits crash) is a no-op
    dedup_batch_sink(
        spark, batch, paths["idx"], paths["corpus"],
        stats_path=paths["stats"], epoch_id=0, n_buckets=4,
    )
    assert _ids(spark, paths["corpus"]) == {1, 2}
    assert _ids(spark, paths["idx"]) == {1, 2}
