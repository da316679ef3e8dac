"""Continuous full-engine ingest stream (optionally audit-gated).

Covers: backlog drain into all four tables + snapshot-atomic visibility,
incremental second drop, audit-gated quarantine of a failing batch
(engine untouched, quarantine carries the failed gate names), the
hard-stop default when no quarantine dir is configured, and replay
convergence of the audited path (empty staged changelog → resolved as
success, nothing quarantined twice).
"""

from __future__ import annotations

import pytest

from srag_spark.api import SragEngine
from srag_spark.plans.audits import max_contamination, min_docs
from srag_spark.schema import DOCUMENTS_SCHEMA
from srag_spark.streaming.engine_ingest import (
    _engine_batch_sink,
    start_engine_ingest_stream,
)

SENTENCE = (
    "the quick brown fox jumps over the lazy dog while catalyst plans "
    "every stage of the distributed query evaluation pipeline carefully."
)


def _doc(doc_id, text):
    return (doc_id, [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])


def _drain(eng, in_dir, ckpt, **kw):
    q = start_engine_ingest_stream(eng, in_dir, ckpt, trigger_once=True, **kw)
    q.awaitTermination(180)


def test_stream_drains_backlog_into_engine(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    spark.createDataFrame(
        [_doc("d0", "alpha beta gamma. " + SENTENCE), _doc("d1", SENTENCE)],
        schema=DOCUMENTS_SCHEMA,
    ).write.parquet(in_dir)
    _drain(eng, in_dir, ckpt)
    assert eng.transcripts().count() == 2
    assert eng.chunks().count() > 0 and eng.embeddings().count() > 0
    assert eng.metrics().filter("doc_id = 'd0'").count() == 1

    # second drop only adds d2; d0/d1 untouched
    spark.createDataFrame(
        [_doc("d2", "fresh arrival. " + SENTENCE)], schema=DOCUMENTS_SCHEMA
    ).write.mode("append").parquet(in_dir)
    _drain(eng, in_dir, ckpt)
    assert eng.transcripts().count() == 3


def test_audited_stream_quarantines_failing_batch(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    qdir = str(tmp_path / "quarantine")
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    evals = spark.createDataFrame([(SENTENCE,)], "text string")

    spark.createDataFrame(
        [_doc("leak0", "prefix then " + SENTENCE)], schema=DOCUMENTS_SCHEMA
    ).write.parquet(in_dir)
    _drain(
        eng, in_dir, ckpt,
        audits=[max_contamination(evals, 0.0)], quarantine_dir=qdir,
    )
    assert eng.transcripts().count() == 0  # engine untouched
    assert eng.staged_ingests() == {}      # nothing left pending
    quarantined = spark.read.parquet(f"{qdir}/epoch=0")
    rows = quarantined.select("doc_id", "quarantine_reason").collect()
    assert [r["doc_id"] for r in rows] == ["leak0"]
    assert "max_contamination" in rows[0]["quarantine_reason"]


def test_audited_stream_without_quarantine_hard_stops(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    batch = spark.createDataFrame(
        [_doc("d0", SENTENCE)], schema=DOCUMENTS_SCHEMA
    )
    batch.write.parquet(in_dir)
    sink = _engine_batch_sink(eng, audits=[min_docs(5)], quarantine_dir=None)
    with pytest.raises(RuntimeError, match="failed audits.*min_docs"):
        sink(spark.read.parquet(in_dir), 0)
    assert eng.transcripts().count() == 0


def test_audited_replay_of_absorbed_batch_resolves_clean(spark, tmp_path):
    """After a publish whose checkpoint write 'crashed', the replayed
    batch re-stages to an EMPTY changelog; the sink must treat that as
    success — engine unchanged, nothing quarantined."""
    in_dir = str(tmp_path / "in")
    qdir = str(tmp_path / "quarantine")
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    spark.createDataFrame(
        [_doc("d0", "clean body. " + SENTENCE)], schema=DOCUMENTS_SCHEMA
    ).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    sink = _engine_batch_sink(eng, audits=[min_docs(1)], quarantine_dir=qdir)
    sink(batch, 0)
    assert eng.transcripts().count() == 1
    v = eng.snapshot_versions()[-1]

    sink(batch, 0)  # replay
    assert eng.transcripts().count() == 1
    # min_docs(1) fails on the empty changelog, yet nothing is quarantined
    import os

    assert not os.path.exists(f"{qdir}/epoch=0")
    # and the engine still reads consistently at latest
    assert eng.snapshot_versions()[-1] >= v
