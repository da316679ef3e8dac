"""Continuous CDC refresh stream (streaming/refresh.py).

The tick body is the unit under test (the rate source is only a clock):
initial load, incremental convergence, no-op ticks, the audited
retry-until-fixed posture, and one live-stream smoke run.
"""

from __future__ import annotations

import time

from srag_spark.api import SragEngine
from srag_spark.plans.audits import min_docs
from srag_spark.plans.incremental import refresh_checkpoint
from srag_spark.sources.tables import (
    delete_by_key,
    latest_manifest_version,
    upsert_by_key,
)
from srag_spark.streaming.refresh import _refresh_tick, start_refresh_stream
from srag_spark.synth import synth_documents_df


def _source(spark, path, n=6, seed=5):
    upsert_by_key(
        spark, path, synth_documents_df(spark, n, seed=seed, mega_every=0),
        ["doc_id"], n_buckets=4,
    )


def test_tick_applies_initial_then_incremental_then_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=5)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    results = []
    tick = _refresh_tick(eng, src, on_result=lambda e, r: results.append(r))

    tick(None, 0)  # initial load
    assert results[-1]["inserted"] == 5
    assert eng.transcripts().count() == 5

    _source(spark, src, n=2, seed=77)  # 2 updates
    delete_by_key(
        spark, src,
        spark.createDataFrame([("doc-00000004",)], "doc_id string"),
        ["doc_id"],
    )
    tick(None, 1)
    assert results[-1]["updated"] == 2 and results[-1]["deleted"] == 1
    assert eng.transcripts().count() == 4

    tick(None, 2)  # nothing moved: cheap no-op
    assert results[-1] == {
        "from_version": results[-1]["from_version"],
        "to_version": results[-1]["to_version"],
        "inserted": 0, "updated": 0, "deleted": 0,
    }
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)


def test_audited_tick_retries_same_changelog_until_gates_pass(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=6)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.refresh_from(src)
    wm = refresh_checkpoint(eng, src)

    _source(spark, src, n=1, seed=88)  # a 1-doc batch, gated on min_docs(5)
    results = []
    tick = _refresh_tick(
        eng, src, audits=[min_docs(5)], on_result=lambda e, r: results.append(r)
    )
    tick(None, 0)
    tick(None, 1)  # the retry posture: same changelog, same verdict
    assert [r["published"] for r in results] == [False, False]
    assert results[0]["to_version"] == results[1]["to_version"]
    assert refresh_checkpoint(eng, src) == wm  # watermark never moved
    assert eng.staged_ingests() == {}

    # upstream fixed (4 more docs): the next tick publishes everything
    _source(spark, src, n=5, seed=89)
    tick(None, 2)
    assert results[-1]["published"] is True
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)


def test_live_stream_converges_and_stops(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=4)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    results = []
    q = start_refresh_stream(
        eng, src, str(tmp_path / "ckpt"), interval="1 seconds",
        on_result=lambda e, r: results.append(r),
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and not any(
            r.get("inserted") == 4 for r in results
        ):
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(60)
    assert any(r.get("inserted") == 4 for r in results)
    assert eng.transcripts().count() == 4
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)
