"""Streaming dimension enrichment against a manifest table.

The processing-time temporal table join (Flink's ``FOR SYSTEM_TIME AS
OF proctime``, Kafka Streams' KTable join): each micro-batch of a
stream joins against the CURRENT snapshot of a slowly-changing
manifest table (sources/tables), so dimension updates become visible
at micro-batch granularity without restarting the stream.  Spark's
built-in stream-static join binds the static side's snapshot at query
START; resolving the manifest INSIDE ``foreachBatch`` is the standard
pattern for a dimension that updates while the stream runs.

Semantics (frozen):

* LEFT join — stream rows without a dimension match survive with null
  dimension columns (late-arriving dimensions are a fact of life; a
  downstream pass can re-enrich);
* the dimension side is the manifest table's LATEST committed snapshot
  at each epoch — atomic per epoch (one manifest read), monotone
  across epochs;
* replays (at-least-once epochs after a crash) re-join against the
  then-current dimension and OVERWRITE the epoch's output directory —
  no duplicate rows, and a replayed epoch may carry newer dimension
  values than the lost original (the documented and industry-standard
  behavior of processing-time temporal joins; an event-time-versioned
  join would need dimension history, which ``snapshot_diff`` can
  reconstruct offline).

Scale shape: one manifest read + one broadcast of the (bounded)
dimension projection per epoch; the stream side never shuffles.  For
dimensions too large to broadcast, pass ``broadcast_dim=False`` and
the join plans as a regular keyed join under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from srag_spark.sources.tables import read_table


def enrich_batch(
    spark,
    batch_df: DataFrame,
    dim_path: str,
    on: str,
    dim_cols: list[str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join one (micro-)batch against the dimension table's latest
    snapshot.  ``dim_cols`` prunes the dimension projection (always
    include the join key); duplicate dimension keys are collapsed to
    one deterministic row (greatest payload struct) so the enrichment
    never fans out stream rows."""
    dim = read_table(spark, dim_path)
    if dim_cols is not None:
        dim = dim.select(on, *[c for c in dim_cols if c != on])
    payload = [c for c in dim.columns if c != on]
    dim1 = (
        dim.groupBy(on)
        .agg(F.max(F.struct(*payload)).alias("_d"))
        .select(on, *[F.col(f"_d.{c}").alias(c) for c in payload])
    )
    if broadcast_dim:
        dim1 = F.broadcast(dim1)
    return batch_df.join(dim1, on, "left")


def start_enrichment_stream(
    stream: DataFrame,
    dim_path: str,
    output_dir: str,
    checkpoint_dir: str,
    on: str = "doc_id",
    dim_cols: list[str] | None = None,
    broadcast_dim: bool = True,
    trigger_once: bool = False,
):
    """Attach the enrichment sink to a streaming DataFrame.  Each epoch
    writes its enriched rows to ``output_dir/epoch=<id>`` with
    overwrite — replayed epochs converge instead of duplicating (the
    same epoch-keyed idempotence the dedup-ingest stats use)."""
    spark = stream.sparkSession

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = enrich_batch(
            spark,
            batch_df,
            dim_path,
            on,
            dim_cols=dim_cols,
            broadcast_dim=broadcast_dim,
        )
        out.write.mode("overwrite").parquet(f"{output_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
