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


def test_bloom_sink_matches_plain_sink(spark, tmp_path):
    """The bloom-sidecar sink (corpus → bloom → index) must keep and
    drop exactly what the plain sink does — the prefilter is a pure
    I/O optimization — while every committed key probes HIT."""
    from pyspark.sql import functions as F

    from srag_spark.operators.bloom import bloom_probe, table_bucket_col
    from srag_spark.operators.dedup import norm_text_col

    rounds = [
        [(1, D1), (2, D2), (3, D1)],
        [(4, D2), (5, D1_NEAR), (6, D6)],
        [(7, D1), (8, D6)],
    ]
    plain = {k: str(tmp_path / f"p_{k}") for k in ("idx", "corpus", "stats")}
    bloomy = {k: str(tmp_path / f"b_{k}") for k in ("idx", "corpus", "stats")}
    bloom_path = str(tmp_path / "b_bloom")
    for i, rows in enumerate(rounds):
        batch = spark.createDataFrame(rows, SCHEMA)
        dedup_batch_sink(
            spark, batch, plain["idx"], plain["corpus"],
            stats_path=plain["stats"], epoch_id=i, n_buckets=4,
        )
        dedup_batch_sink(
            spark, batch, bloomy["idx"], bloomy["corpus"],
            stats_path=bloomy["stats"], epoch_id=i, n_buckets=4,
            bloom_path=bloom_path, bloom_hex_digits=4,
        )
    assert _ids(spark, bloomy["corpus"]) == _ids(spark, plain["corpus"])
    assert _ids(spark, bloomy["idx"]) == _ids(spark, plain["idx"])
    ps = {r["epoch_id"]: (r["n_kept"], r["n_dup_exact"], r["n_dup_near"])
          for r in read_table(spark, plain["stats"]).collect()}
    bs = {r["epoch_id"]: (r["n_kept"], r["n_dup_exact"], r["n_dup_near"])
          for r in read_table(spark, bloomy["stats"]).collect()}
    assert ps == bs
    # the bloomed index is content-keyed for probe-bucket pruning
    from srag_spark.sources.tables import read_manifest

    assert read_manifest(spark, bloomy["idx"])["bucket_col"] == "text_hash"
    # sidecar completeness: every committed index key probes hit
    idx = read_table(spark, bloomy["idx"])
    keys = idx.select("text_hash").withColumn(
        "bucket", table_bucket_col(F.col("text_hash"), 4)
    )
    blooms = read_table(spark, bloom_path)
    probed = bloom_probe(keys, blooms, "text_hash", "bucket",
                         n_hash=3, hex_digits=4)
    assert probed.filter(~F.col("bloom_hit")).count() == 0
    # and a definitely-foreign key misses (the pruning actually prunes)
    foreign = spark.createDataFrame(
        [("zz-unseen-key-not-any-md5",)], "text_hash string"
    ).withColumn("bucket", table_bucket_col(F.col("text_hash"), 4))
    assert not bloom_probe(
        foreign, blooms, "text_hash", "bucket", n_hash=3, hex_digits=4
    ).first()["bloom_hit"]


def test_bloom_sink_crash_orderings_converge(spark, tmp_path):
    """Replay after every partial-commit crash point converges.  The
    dangerous one is 'bloom committed, index not' — the replayed batch
    probes HIT against an index that lacks the keys, must still keep
    the docs, and must not double-drop."""
    paths = {k: str(tmp_path / k) for k in ("idx", "corpus", "stats")}
    bloom_path = str(tmp_path / "bloom")
    b1 = spark.createDataFrame([(1, D1), (2, D2)], SCHEMA)
    dedup_batch_sink(
        spark, b1, paths["idx"], paths["corpus"], stats_path=paths["stats"],
        epoch_id=0, n_buckets=4, bloom_path=bloom_path, bloom_hex_digits=4,
    )

    # simulate "crash after bloom, before index": merge batch-2 keys
    # into the sidecar WITHOUT committing the index, then replay the
    # full sink for batch 2
    from pyspark.sql import functions as F

    from srag_spark.operators.bloom import table_bucket_col
    from srag_spark.operators.dedup import build_dedup_index
    from srag_spark.streaming.dedup_ingest import _merge_bloom_sidecar

    b2 = spark.createDataFrame([(3, D6), (4, D1)], SCHEMA)  # 4 is a dup
    b2_keys = (
        build_dedup_index(b2)
        .select("text_hash")
        .withColumn("bucket", table_bucket_col(F.col("text_hash"), 4))
    )
    _merge_bloom_sidecar(spark, bloom_path, b2_keys, 3, 4)

    dedup_batch_sink(
        spark, b2, paths["idx"], paths["corpus"], stats_path=paths["stats"],
        epoch_id=1, n_buckets=4, bloom_path=bloom_path, bloom_hex_digits=4,
    )
    assert _ids(spark, paths["corpus"]) == {1, 2, 3}
    assert _ids(spark, paths["idx"]) == {1, 2, 3}

    # full replay of batch 2 (crash after all commits): state unchanged
    dedup_batch_sink(
        spark, b2, paths["idx"], paths["corpus"], stats_path=paths["stats"],
        epoch_id=1, n_buckets=4, bloom_path=bloom_path, bloom_hex_digits=4,
    )
    assert _ids(spark, paths["corpus"]) == {1, 2, 3}
    assert _ids(spark, paths["idx"]) == {1, 2, 3}


def test_bloom_sink_onboarding_and_guards(spark, tmp_path):
    """Enabling bloom over an existing text_hash-keyed index builds the
    sidecar from committed keys (onboarding); a doc_id-keyed index or a
    parameter change is refused rather than allowed to mis-prune."""
    import pytest

    from srag_spark.sources.tables import upsert_by_key as _up
    from srag_spark.operators.dedup import build_dedup_index

    paths = {k: str(tmp_path / k) for k in ("idx", "corpus", "stats")}
    bloom_path = str(tmp_path / "bloom")

    # seed a text_hash-keyed index WITHOUT a sidecar
    seed = spark.createDataFrame([(1, D1), (2, D2)], SCHEMA)
    _up(spark, paths["idx"], build_dedup_index(seed), ["text_hash"],
        n_buckets=4)

    # onboarding batch: dup of 1 must be caught via the fresh sidecar
    b = spark.createDataFrame([(3, D1), (4, D6)], SCHEMA)
    dedup_batch_sink(
        spark, b, paths["idx"], paths["corpus"], epoch_id=0, n_buckets=4,
        bloom_path=bloom_path, bloom_hex_digits=4,
    )
    assert _ids(spark, paths["corpus"]) == {4}
    assert {r["doc_id"] for r in read_table(spark, paths["idx"]).collect()} \
        == {1, 2, 4}

    # parameter-change guard (would be a false-negative machine)
    with pytest.raises(ValueError, match="n_hash"):
        dedup_batch_sink(
            spark, b, paths["idx"], paths["corpus"], epoch_id=1, n_buckets=4,
            bloom_path=bloom_path, bloom_n_hash=5, bloom_hex_digits=4,
        )

    # doc_id-keyed index guard
    other_idx = str(tmp_path / "idx_docid")
    _up(spark, other_idx, build_dedup_index(seed), ["doc_id"], n_buckets=4)
    with pytest.raises(ValueError, match="text_hash-keyed"):
        dedup_batch_sink(
            spark, b, other_idx, paths["corpus"], epoch_id=2, n_buckets=4,
            bloom_path=str(tmp_path / "bloom2"), bloom_hex_digits=4,
        )


def test_bloom_stream_end_to_end(spark, tmp_path):
    """The streaming wiring: two file-drop rounds through
    start_dedup_stream with bloom_path — cross-batch dups dropped, the
    sidecar current after each epoch."""
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    paths = {k: str(tmp_path / k) for k in ("idx", "corpus", "stats")}
    bloom_path = str(tmp_path / "bloom")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = start_dedup_stream(
            stream, paths["idx"], paths["corpus"], ckpt,
            stats_path=paths["stats"], n_buckets=4, trigger_once=True,
            bloom_path=bloom_path, bloom_hex_digits=4,
        )
        q.awaitTermination(180)

    _drop(spark, in_dir, [(1, D1), (2, D2)], "overwrite")
    run_once()
    _drop(spark, in_dir, [(3, D1), (4, D6)], "append")
    run_once()
    assert _ids(spark, paths["corpus"]) == {1, 2, 4}
    assert _ids(spark, paths["idx"]) == {1, 2, 4}


def test_rebuild_bloom_sidecar(spark, tmp_path):
    """Rebuilding at a larger hex_digits regrows selectivity, preserves
    the no-false-negative contract, drops vanished buckets, and lets
    the sink continue at the new parameters (the guard accepts them)."""
    from pyspark.sql import functions as F

    from srag_spark.operators.bloom import bloom_probe, table_bucket_col
    from srag_spark.streaming.dedup_ingest import rebuild_bloom_sidecar

    paths = {k: str(tmp_path / k) for k in ("idx", "corpus")}
    bloom_path = str(tmp_path / "bloom")
    b1 = spark.createDataFrame([(1, D1), (2, D2)], SCHEMA)
    dedup_batch_sink(
        spark, b1, paths["idx"], paths["corpus"], epoch_id=0, n_buckets=4,
        bloom_path=bloom_path, bloom_hex_digits=4,
    )
    # old params refused, rebuild at hex_digits=5, then accepted
    counts = rebuild_bloom_sidecar(
        spark, paths["idx"], bloom_path, n_hash=3, hex_digits=5
    )
    assert sum(counts.values()) == 2
    blooms = read_table(spark, bloom_path)
    assert blooms.first()["hex_digits"] == 5
    assert all(len(r["bitmap"]) == 16**5 // 64 for r in blooms.collect())
    keys = read_table(spark, paths["idx"]).select("text_hash").withColumn(
        "bucket", table_bucket_col(F.col("text_hash"), 4)
    )
    probed = bloom_probe(keys, blooms, "text_hash", "bucket",
                         n_hash=3, hex_digits=5)
    assert probed.filter(~F.col("bloom_hit")).count() == 0
    # sink continues at the new params; a dup is still caught
    b2 = spark.createDataFrame([(3, D1), (4, D6)], SCHEMA)
    dedup_batch_sink(
        spark, b2, paths["idx"], paths["corpus"], epoch_id=1, n_buckets=4,
        bloom_path=bloom_path, bloom_hex_digits=5,
    )
    assert _ids(spark, paths["corpus"]) == {1, 2, 4}
