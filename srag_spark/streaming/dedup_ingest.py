"""Streaming corpus ingest with continuous dedup.

Composes Structured Streaming with the incremental-dedup operator
(``operators/dedup.build_dedup_index`` / ``incremental_dedup``) and the
manifest-committed table layer: each micro-batch of raw documents is
deduped against the COMMITTED index plus itself, kept docs upsert into
the corpus table, and their ``(doc_id, text_hash, sig)`` rows append to
the index — so the very next micro-batch sees them.  This is the
always-on form of the daily-crawl top-up path: a crawler drops files,
the stream keeps the corpus exact- and near-duplicate-free forever.

Effectively-once: Spark's streaming checkpoint re-delivers the SAME
micro-batch after a crash, and the sink's two commits are ordered
corpus-first so every crash point converges on replay:

* crash before the corpus upsert — nothing committed, replay is a
  fresh run;
* crash between corpus upsert and index append — replay sees the
  PRE-batch index, computes identical keep verdicts (the verdict
  depends only on the index and the batch), and re-issues both
  idempotent keyed upserts;
* crash after both commits (checkpoint not yet advanced) — replay now
  finds the batch's own hashes in the index and keeps nothing, but the
  corpus rows were already committed; final state identical.

The REVERSE order (index first) would lose data: a crash between the
commits would leave the batch's hashes in the index, so the replay
drops every doc as a self-duplicate with the corpus rows never written.

Scale shape: per micro-batch, the index table is scanned (never
shuffled — the batch side broadcasts, see ``incremental_dedup``) and
only the key-hash buckets of the kept docs are rewritten, so sink cost
tracks batch size while the index grows to corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from srag_spark.operators.dedup import (
    build_dedup_index,
    incremental_dedup,
    release,
)
from srag_spark.sources.tables import read_table, upsert_by_key


def dedup_batch_sink(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    corpus_path: str,
    stats_path: str | None = None,
    epoch_id: int = 0,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_tau: float = 0.5,
    n_buckets: int = 64,
    max_band_df: int | None = None,
) -> None:
    """One micro-batch of ``(doc_id, text, ...)`` rows through the
    dedup-ingest commit protocol (corpus upsert, then index append,
    then the per-epoch stats row).  Exposed separately so a BATCH
    backfill can reuse the exact streaming semantics."""
    if batch_df.isEmpty():
        return
    try:
        index = read_table(spark, index_path).select(
            "doc_id", "text_hash", "sig"
        )
    except FileNotFoundError:  # first batch: nothing committed yet
        index = build_dedup_index(batch_df.limit(0))

    ledger: list = []
    try:
        ann = incremental_dedup(
            batch_df,
            index,
            n_hashes=n_hashes,
            bands=bands,
            shingle_n=shingle_n,
            jaccard_tau=jaccard_tau,
            persisted=ledger,
            max_band_df=max_band_df,
        )
        ann = ann.persist()
        ledger.append(ann)
        kept = ann.filter("keep")
        kept_docs = batch_df.join(kept.select("doc_id"), "doc_id")
        upsert_by_key(
            spark, corpus_path, kept_docs, ["doc_id"], n_buckets=n_buckets
        )
        upsert_by_key(
            spark,
            index_path,
            kept.select("doc_id", "text_hash", "sig"),
            ["doc_id"],
            n_buckets=n_buckets,
        )
        if stats_path is not None:
            stats = ann.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.sum(F.col("dup_exact").cast("long")).alias("n_dup_exact"),
                F.sum(F.col("dup_near").cast("long")).alias("n_dup_near"),
                F.sum(F.col("dup_in_batch").cast("long")).alias(
                    "n_dup_in_batch"
                ),
            ).withColumn("epoch_id", F.lit(int(epoch_id)).cast("long"))
            upsert_by_key(
                spark, stats_path, stats, ["epoch_id"], n_buckets=4
            )
    finally:
        release(ledger)


def start_dedup_stream(
    stream: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    stats_path: str | None = None,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_tau: float = 0.5,
    n_buckets: int = 64,
    max_band_df: int | None = None,
    trigger_once: bool = False,
):
    """Attach the dedup-ingest sink to any streaming DataFrame with
    ``doc_id`` and ``text`` columns (file drop, Kafka-shaped source,
    rate source in tests).  Returns the started ``StreamingQuery``.

    ``stats_path`` (optional) keeps one row per epoch — docs seen /
    kept / dup-by-class — keyed on ``epoch_id`` so replays overwrite
    rather than double-count (the exact at-least-once fix the batch
    pipeline's accumulator metrics document)."""
    spark = stream.sparkSession

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_batch_sink(
            spark,
            batch_df,
            index_path,
            corpus_path,
            stats_path=stats_path,
            epoch_id=epoch_id,
            n_hashes=n_hashes,
            bands=bands,
            shingle_n=shingle_n,
            jaccard_tau=jaccard_tau,
            n_buckets=n_buckets,
            max_band_df=max_band_df,
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
