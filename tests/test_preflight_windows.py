"""Preflight (J8/J9) + watermarked window agg tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from srag_spark import synth
from srag_spark.plans.preflight import preflight
from srag_spark.schema import DOCUMENTS_SCHEMA
from srag_spark.streaming.windows import windowed_event_counts


def test_preflight_ok_and_failures(spark, tmp_path):
    good = str(tmp_path / "docs")
    spark.createDataFrame(
        synth.generate_rows(5, seed=1, mega_every=0), schema=DOCUMENTS_SCHEMA
    ).write.parquet(good)
    out = str(tmp_path / "out")
    results = preflight(spark, good, out)
    assert all(r.ok for r in results)

    with pytest.raises(RuntimeError, match="input_table"):
        preflight(spark, str(tmp_path / "missing"), out)

    # wrong schema → named failure
    bad = str(tmp_path / "bad")
    spark.range(3).write.parquet(bad)
    with pytest.raises(RuntimeError, match="missing columns"):
        preflight(spark, bad, out)


def test_windowed_event_counts_batch_golden(spark):
    rows = [
        ("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 00:50:00", "click", 2.0),
        ("2024-01-01 01:10:00", "click", 4.0),
        ("2024-01-01 00:20:00", "view", 8.0),
    ]
    ev = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(ev, window="1 hour").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "click"): (2, 3.0),
        ("2024-01-01 01:00:00", "click"): (1, 4.0),
        ("2024-01-01 00:00:00", "view"): (1, 8.0),
    }


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    from srag_spark.streaming.windows import start_windowed_counts_stream

    rows = [
        ("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 00:30:00", "click", 2.0),
        ("2024-01-01 05:00:00", "click", 9.0),  # advances watermark far past hr 0
    ]
    ev = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    in_dir = str(tmp_path / "in")
    ev.write.parquet(in_dir)
    q = start_windowed_counts_stream(
        spark,
        in_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        schema=ev.schema,
        window="1 hour",
        watermark="1 hour",
        trigger_once=True,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    closed = {(str(r["window_start"]), r["event_type"]): r["n_events"] for r in out}
    # hour-0 window closed (watermark advanced by the 05:00 event);
    # hour-5's own window is still open → not emitted in append mode
    assert closed == {("2024-01-01 00:00:00", "click"): 2}


def test_engine_health_facade(spark, tmp_path):
    """VERDICT r3 #7: SragEngine.health() — healthy on a cold root,
    healthy after ingest, failing with an aggregated report when a
    snapshot references missing data."""
    import pytest

    from srag_spark.api import SragEngine
    from srag_spark.schema import DOCUMENTS_SCHEMA
    from srag_spark.sources import fsio
    from srag_spark.sources.tables import read_manifest

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    # cold root: tables absent → vacuously healthy, root writable
    results = eng.health()
    assert all(r.ok for r in results)

    docs = spark.createDataFrame(
        [("a", [{"kind": "text", "text": "hello world doc", "media_ref": None,
                 "offset": 0}])],
        schema=DOCUMENTS_SCHEMA,
    )
    eng.ingest(docs)
    results = eng.health()
    assert all(r.ok for r in results) and len(results) == 5

    # break the transcripts snapshot: delete a referenced bucket dir
    m = read_manifest(spark, eng.transcripts_path)
    victim = next(iter(m["buckets"].values()))
    fsio.delete(spark, f"{eng.transcripts_path}/{victim}")
    with pytest.raises(RuntimeError, match="table:transcripts"):
        eng.health()


def test_hopping_event_counts_batch_golden(spark):
    from srag_spark.streaming.windows import hopping_event_counts

    rows = [
        ("2024-01-01 00:10:00", "click", 1.0),   # windows 23:30 & 00:00
        ("2024-01-01 00:40:00", "click", 2.0),   # windows 00:00 & 00:30
        ("2024-01-01 00:30:00", "view", 8.0),    # boundary: 00:00 & 00:30
    ]
    ev = spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    out = hopping_event_counts(ev, window="1 hour", slide="30 minutes")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value_r"])
        for r in out.collect()
    }
    assert got == {
        ("2023-12-31 23:30:00", "click"): (1, 1.0),
        ("2024-01-01 00:00:00", "click"): (2, 3.0),
        ("2024-01-01 00:30:00", "click"): (1, 2.0),
        ("2024-01-01 00:00:00", "view"): (1, 8.0),
        ("2024-01-01 00:30:00", "view"): (1, 8.0),
    }
    # every event lands in exactly window/slide = 2 windows
    assert sum(n for n, _ in got.values()) == 2 * len(rows)
