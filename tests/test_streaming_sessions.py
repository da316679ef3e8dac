"""Stateful streaming sessionization: per-key state must survive
micro-batches (close-by-successor) and emit via event-time timeout
(close-by-watermark) — the applyInPandasWithState custom-operator shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.streaming.sessions import start_sessionize_stream


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id string, ts string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")


def test_stateful_sessionize_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(rows):
        df = _events_df(spark, rows)
        df.write.mode("append").parquet(in_dir)
        q = start_sessionize_stream(
            spark, in_dir, out_dir, ckpt, schema=df.schema, watermark="30 minutes"
        )
        q.awaitTermination(180)

    def sessions():
        try:
            out = spark.read.parquet(out_dir).collect()
        except Exception:  # noqa: BLE001 — no output yet
            return set()
        return {
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in out
        }

    # batch 1: u1 has an open 2-event session then a gap that closes it
    run(
        [
            ("u1", "2024-01-01 00:00:00", 1.0),
            ("u1", "2024-01-01 00:10:00", 1.0),
            ("u1", "2024-01-01 01:00:00", 1.0),  # >30 min gap → closes s1
            ("u2", "2024-01-01 00:05:00", 1.0),
        ]
    )
    assert sessions() == {
        ("u1", "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
    }

    # batch 2: successors close the sessions left open by batch 1 —
    # state carried across micro-batches
    run(
        [
            ("u2", "2024-01-01 03:00:00", 1.0),
            ("u1", "2024-01-01 03:05:00", 1.0),
        ]
    )
    assert sessions() == {
        ("u1", "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        ("u1", "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
        ("u2", "2024-01-01 00:05:00", "2024-01-01 00:05:00", 1),
    }

    # batches 3+4: u3 advances the watermark far past u1/u2's open
    # sessions; their states TIME OUT and emit without any successor
    run([("u3", "2024-01-01 06:00:00", 1.0)])
    run([("u3", "2024-01-01 06:01:00", 1.0)])
    assert sessions() == {
        ("u1", "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        ("u1", "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
        ("u2", "2024-01-01 00:05:00", "2024-01-01 00:05:00", 1),
        ("u1", "2024-01-01 03:05:00", "2024-01-01 03:05:00", 1),
        ("u2", "2024-01-01 03:00:00", "2024-01-01 03:00:00", 1),
    }
