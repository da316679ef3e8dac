"""Continuous CDC refresh — follow an upstream docs table's snapshots.

The streaming twin of :func:`srag_spark.plans.incremental.
incremental_refresh` (a continuously-maintained materialized view over
the interleaved-docs table): a processing-time clock triggers a refresh
tick; each tick reads the source's LATEST manifest version, diffs it
against the engine's durable per-source watermark, and applies only the
changelog — O(changed docs) per tick, a cheap one-manifest-read no-op
when nothing moved.

Durability lives in the refresh itself, not the stream: the watermark
is written after each atomic publish, so the streaming checkpoint is
only a clock (a crashed stream restarts and the first tick converges —
the same idempotence test_incremental_refresh proves for batch reruns).

With ``audits=[...]`` every tick is write–audit–publish.  Unlike the
file-ingest stream (which quarantines a failing batch and moves on —
its input would otherwise be lost), a failing REFRESH tick simply
unwinds and leaves the watermark: the data still sits safely in the
upstream table, so the right production posture is to retry the same
changelog every tick until upstream is fixed — readers stay on the last
clean snapshot throughout, and no snapshot is ever skipped.
``on_result`` receives every tick's result dict (alerting hook: a
result with ``published=False`` is the page).

Engine mutations are single-writer: the stream must be the engine's
only writer while running (same contract as every engine mutation).
"""

from __future__ import annotations


def _refresh_tick(
    engine,
    source_path: str,
    audits=None,
    metadata: dict[str, str] | None = None,
    on_result=None,
):
    """The foreachBatch body, exposed for direct testing (the batch
    contents are ignored — the rate source is only a clock)."""
    from srag_spark.plans.incremental import incremental_refresh

    def tick(batch_df, epoch_id: int) -> None:
        res = incremental_refresh(
            engine, source_path, metadata=metadata, audits=audits
        )
        if on_result is not None:
            on_result(epoch_id, res)

    return tick


def start_refresh_stream(
    engine,
    source_path: str,
    checkpoint_dir: str,
    interval: str = "5 seconds",
    audits=None,
    metadata: dict[str, str] | None = None,
    on_result=None,
):
    """Poll the source table every ``interval`` and keep the engine
    refreshed with its changelog.  Returns the StreamingQuery (stop()
    to end; a tick that raises stops the stream — Spark's restart
    model — and the next start converges from the watermark)."""
    clock = (
        engine.spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
    )
    return (
        clock.writeStream.foreachBatch(
            _refresh_tick(
                engine,
                source_path,
                audits=audits,
                metadata=metadata,
                on_result=on_result,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=interval)
        .start()
    )
