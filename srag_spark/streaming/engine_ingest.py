"""Continuous engine ingest — a document stream feeding the FULL
four-table engine, optionally behind audit gates.

`start_engine_ingest_stream` wires a file-source stream of interleaved
docs into :meth:`SragEngine.ingest` per micro-batch: each batch lands
extraction → transcripts → chunks → embeddings → metrics and publishes
ONE engine snapshot, so concurrent readers always see whole batches
(never a torn four-table state).  With ``audits=[...]`` every batch
goes through write–audit–publish instead: gates that fail quarantine
the batch's raw docs (with the failed gate names) to a per-epoch
directory and leave the engine untouched — the continuous version of
:func:`srag_spark.plans.audits.audited_ingest`.

Effectively-once: Spark's streaming checkpoint re-delivers the same
micro-batch after a crash, and every path converges on replay —
`ingest` is an idempotent keyed upsert; the audited path detects an
already-absorbed batch by its EMPTY staged changelog (re-staging
identical rows diffs to nothing) and resolves it as success instead of
re-auditing counts that no longer describe new rows.  Quarantine writes
overwrite their epoch directory, so a replayed failing batch leaves one
copy, not two.

The reference's worker loop (IngestionWorker.scala:70-95) pulls one job
at a time off Redis; this is the same contract at micro-batch
granularity with lake-native atomicity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.streaming.ingest import read_document_stream


def _engine_batch_sink(engine, audits=None, quarantine_dir: str | None = None):
    """The foreachBatch body, exposed for direct testing (call it twice
    with the same batch to exercise the replay path)."""

    def sink(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not audits:
            engine.ingest(batch_df)
            return
        from srag_spark.plans.audits import audited_ingest

        rep = audited_ingest(
            engine, batch_df, audits, keep_failed_stage=True
        )
        if rep["published"]:
            return
        sid = rep["staging_id"]
        already_absorbed = (
            engine.staged_changelog(sid, "transcripts").limit(1).count() == 0
        )
        engine.abandon_ingest(sid)
        if already_absorbed:
            # replay of a batch a previous (crashed) run fully applied:
            # nothing new to audit, nothing to quarantine
            return
        failed = [r.name for r in rep["audits"] if not r.ok]
        if quarantine_dir is not None:
            (
                batch_df.withColumn(
                    "quarantine_reason", F.lit("; ".join(failed))
                )
                .write.mode("overwrite")
                .parquet(f"{quarantine_dir}/epoch={epoch_id}")
            )
        else:
            raise RuntimeError(
                f"micro-batch {epoch_id} failed audits {failed} and no "
                "quarantine_dir is configured — stopping the stream "
                "rather than dropping data"
            )

    return sink


def start_engine_ingest_stream(
    engine,
    input_dir: str,
    checkpoint_dir: str,
    audits=None,
    quarantine_dir: str | None = None,
    max_files_per_trigger: int = 16,
    trigger_once: bool = False,
):
    """Source → full engine ingest (→ audit gates) per micro-batch.

    ``trigger_once`` (availableNow) drains the backlog and stops — the
    catch-up/backfill shape; otherwise the stream runs until stopped.
    With ``audits`` set, pass ``quarantine_dir`` too unless a failing
    batch should hard-stop the stream (the default raise keeps an
    unattended pipeline from silently discarding data).

    Engine mutations are single-writer: do not run this stream
    concurrently with batch ingests/maintenance on the same engine root.
    """
    stream = read_document_stream(
        engine.spark, input_dir, max_files_per_trigger=max_files_per_trigger
    )
    writer = (
        stream.writeStream.foreachBatch(
            _engine_batch_sink(engine, audits, quarantine_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
