"""Event-time windowed streaming aggregations with watermarks.

The reference has no data streams (SURVEY.md §2.6), but a training-data
pipeline ingesting live events needs late-data-tolerant windowed aggs;
this is the canonical Structured Streaming shape: watermark → tumbling
window → agg, with append-mode output once windows close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Works identically on a batch DataFrame (window() is just an
    expression) and a stream (where the watermark bounds state and late
    arrivals beyond it are dropped).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def start_windowed_counts_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_once: bool = False,
):
    """File-source stream → watermarked window agg → parquet (append:
    only closed windows are emitted, the exactly-once streaming shape)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hopping_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Hopping (sliding) event-time window counts per event_type: each
    event contributes to every window of length ``window`` starting at
    a ``slide`` boundary that covers it (window/slide overlapping
    assignments — the moving-average / trailing-rate shape tumbling
    windows cannot express).  Windows are epoch-aligned, matching
    Spark's ``F.window(ts, window, slide)`` convention, so the DuckDB
    oracle reproduces the assignment arithmetic exactly.

    Works identically on batch and streams (watermark bounds state on
    the stream side).  Scale shape: ``F.window`` explodes each event
    to window/slide rows — a bounded constant factor chosen by the
    caller — followed by one map-side-combinable groupBy; sums are
    decimal-exact then rounded, like the tumbling entry.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value_r"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_r",
        )
    )
