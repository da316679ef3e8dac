"""Checkpoint/resume semantics (J1–J7): resumed runs skip Success
buckets, failed waves retry then dead-letter, and the final output equals
the golden extraction regardless of interruption pattern."""

from __future__ import annotations

import datetime as _dt

import pytest

from srag_spark import golden, synth
from srag_spark.plans.pipeline import ExtractionPipeline
from srag_spark.schema import (
    DOCUMENTS_SCHEMA,
    STATUS_DEAD_LETTER,
    STATUS_FAILED,
    STATUS_SUCCESS,
)


@pytest.fixture()
def docs_rows():
    return synth.generate_rows(40, seed=21, mega_every=0)


@pytest.fixture()
def docs_df(spark, docs_rows):
    return spark.createDataFrame(docs_rows, schema=DOCUMENTS_SCHEMA)


def golden_flat(rows):
    exp = {}
    for doc_id, spans in rows:
        out, *_ = golden.extract_document(spans)
        for seq, (k, t, m) in enumerate(out):
            exp[(doc_id, seq)] = (k, t, m)
    return exp


def read_flat(pipe):
    return {
        (r["doc_id"], r["seq"]): (r["kind"], r["text"], r["media_ref"])
        for r in pipe.spans().collect()
    }


def test_full_run_then_noop_resume(spark, docs_df, docs_rows, tmp_path):
    pipe = ExtractionPipeline(spark, str(tmp_path / "out"), n_buckets=8, wave_size=8)
    s1 = pipe.run(docs_df, input_snapshot="test-v1")
    assert sorted(s1["succeeded"]) == list(range(8))
    assert read_flat(pipe) == golden_flat(docs_rows)

    # second run: everything checkpointed → nothing recomputed
    s2 = pipe.run(docs_df)
    assert s2["skipped"] == 8 and s2["succeeded"] == []
    assert read_flat(pipe) == golden_flat(docs_rows)


def test_interrupted_run_resumes_only_pending(spark, docs_df, docs_rows, tmp_path):
    pipe = ExtractionPipeline(spark, str(tmp_path / "out"), n_buckets=8, wave_size=2)
    s1 = pipe.run(docs_df, max_waves=2)  # "crash" after 2 of 4 waves
    assert len(s1["succeeded"]) == 4
    done = set(s1["succeeded"])

    s2 = pipe.run(docs_df)
    assert set(s2["succeeded"]) == set(range(8)) - done
    assert s2["skipped"] == 4
    assert read_flat(pipe) == golden_flat(docs_rows)


def test_failed_wave_retries_then_dead_letters(spark, docs_df, tmp_path):
    pipe = ExtractionPipeline(
        spark, str(tmp_path / "out"), n_buckets=4, wave_size=4, max_attempts=3
    )

    boom = RuntimeError("injected wave failure")

    def always_fail(wave):
        raise boom

    future = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None) + _dt.timedelta(
        seconds=300
    )
    for expected_attempt in (1, 2):
        # now= jumps past the retry backoff (tested separately)
        s = pipe.run(docs_df, fail_injector=always_fail, now=future)
        assert s["failed"] == [0, 1, 2, 3]
        states = {
            r["partition_id"]: (r["status"], r["attempt"], r["error_message"])
            for r in pipe.latest_checkpoints().collect()
        }
        for b in range(4):
            status, attempt, err = states[b]
            assert status == STATUS_FAILED and attempt == expected_attempt
            assert "injected wave failure" in err

    # third attempt exhausts max_attempts → DeadLetter, then skipped forever
    s3 = pipe.run(docs_df, fail_injector=always_fail, now=future)
    assert s3["dead_lettered"] == [0, 1, 2, 3]
    s4 = pipe.run(docs_df)
    assert s4["succeeded"] == [] and s4["skipped"] == 4
    states = {r["partition_id"]: r["status"] for r in pipe.latest_checkpoints().collect()}
    assert all(v == STATUS_DEAD_LETTER for v in states.values())


def test_failure_then_recovery_converges(spark, docs_df, docs_rows, tmp_path):
    pipe = ExtractionPipeline(spark, str(tmp_path / "out"), n_buckets=4, wave_size=2)

    calls = {"n": 0}

    def fail_first_wave_once(wave):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")

    s1 = pipe.run(docs_df, fail_injector=fail_first_wave_once)
    assert len(s1["failed"]) == 2 and len(s1["succeeded"]) == 2

    future = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None) + _dt.timedelta(
        seconds=300
    )
    s2 = pipe.run(docs_df, now=future)  # retry of failed wave (past backoff)
    assert len(s2["succeeded"]) == 2 and s2["skipped"] == 2
    assert read_flat(pipe) == golden_flat(docs_rows)
    # lineage/metrics recorded
    ck = pipe.latest_checkpoints().collect()
    assert all(r["status"] == STATUS_SUCCESS for r in ck)
    assert sum(r["docs_processed"] for r in ck) == len(docs_rows)


def test_retry_backoff_delays_failed_buckets(spark, docs_df, tmp_path):
    """J5: a Failed bucket is not retried before its exponential backoff
    (2s·2^(attempt−1), cap 60s) elapses, and IS retried after."""
    from srag_spark.plans.pipeline import retry_delay_s

    assert [retry_delay_s(a) for a in (1, 2, 3, 4, 5, 6, 7)] == [
        2.0, 4.0, 8.0, 16.0, 32.0, 60.0, 60.0,
    ]

    pipe = ExtractionPipeline(
        spark, str(tmp_path / "out"), n_buckets=4, wave_size=4, max_attempts=5
    )

    def always_fail(wave):
        raise RuntimeError("transient outage")

    s1 = pipe.run(docs_df, fail_injector=always_fail)
    assert s1["failed"] == [0, 1, 2, 3]
    failed_at = {
        r["partition_id"]: (r["updated_at"], r["next_attempt_at"])
        for r in pipe.latest_checkpoints().collect()
    }
    for updated_at, next_at in failed_at.values():
        assert next_at is not None
        delta = (next_at - updated_at).total_seconds()
        assert 1.9 <= delta <= 2.5  # attempt 1 → 2 s backoff

    # immediately after the failure: backoff not elapsed → nothing runs
    just_after = min(v[0] for v in failed_at.values())
    assert pipe.pending_buckets(now=just_after) == []
    s2 = pipe.run(docs_df, now=just_after)
    assert s2["succeeded"] == [] and s2["failed"] == []

    # past the backoff: buckets are visible again and retry (successfully)
    later = just_after + _dt.timedelta(seconds=30)
    assert pipe.pending_buckets(now=later) == [0, 1, 2, 3]
    s3 = pipe.run(docs_df, now=later)
    assert s3["succeeded"] == [0, 1, 2, 3]


def test_ingestion_pipeline_resumes_full_engine_ingest(spark, tmp_path):
    """IngestionPipeline: corpus-scale onboarding into all four engine
    tables with wave checkpoints — a killed run resumes by skipping
    Success buckets, the finished state matches a one-shot ingest, and
    per-doc metadata survives the waves."""
    from pyspark.sql import functions as F

    from srag_spark.api import SragEngine
    from srag_spark.plans.pipeline import IngestionPipeline

    docs = spark.createDataFrame(
        [
            (f"d{i}",
             [{"kind": "text", "text": f"doc {i} body words here", "media_ref": None,
               "offset": 0}],
             {"tenant": "t" + str(i % 2)})
            for i in range(40)
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, metadata map<string,string>",
    )

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=8)
    pipe = IngestionPipeline(eng, wave_size=2, batch_metadata={"job": "load1"})

    # crash after 2 waves (4 of 8 buckets)
    s1 = pipe.run(docs, max_waves=2)
    assert len(s1["succeeded"]) == 4
    assert eng.transcripts().count() < 40

    # resume: fresh pipeline instance over the same root skips Success
    pipe2 = IngestionPipeline(eng, wave_size=2, batch_metadata={"job": "load1"})
    s2 = pipe2.run(docs)
    assert s2["skipped"] == 4 and len(s2["succeeded"]) == 4

    assert eng.transcripts().count() == 40
    assert eng.chunks().count() == 40 and eng.embeddings().count() == 40
    assert eng.metrics().count() == 40
    # metadata flowed through the waves; filters work
    assert eng.list_transcripts(flt={"tenant": "t1", "job": "load1"}).count() == 20
    # checkpoint lineage recorded real doc counts summing to the corpus
    done = pipe2.latest_checkpoints().collect()
    assert sum(r["docs_processed"] for r in done) == 40
    assert all(r["status"] == "Success" for r in done)

    # re-running the whole pipeline is a no-op (all buckets Success)
    s3 = IngestionPipeline(eng, wave_size=2).run(docs)
    assert s3["skipped"] == 8 and not s3["succeeded"]


def test_ingestion_pipeline_topup_metrics_count_wave_docs_only(spark, tmp_path):
    """Incremental top-up into a POPULATED engine: per-wave checkpoint
    metrics count the wave's OWN documents, not everything previously
    ingested into the same metrics buckets (VERDICT r4 #2 — bucket
    contents are cumulative across batches, so the wave's metrics read
    is semi-joined on the wave's doc ids)."""
    from srag_spark.api import SragEngine
    from srag_spark.plans.pipeline import IngestionPipeline

    def batch(lo, hi):
        return spark.createDataFrame(
            [
                (f"d{i}",
                 [{"kind": "text", "text": f"doc {i} body words",
                   "media_ref": None, "offset": 0}])
                for i in range(lo, hi)
            ],
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>",
        )

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.ingest(batch(0, 30))  # pre-populate via the facade

    pipe = IngestionPipeline(eng, wave_size=2)
    s = pipe.run(batch(100, 120))  # disjoint 20-doc top-up
    assert len(s["succeeded"]) == 4 and not s["failed"]

    done = pipe.latest_checkpoints().collect()
    # every checkpoint row counts only its wave's docs: totals are the
    # top-up batch, NOT the 50 docs now living in those buckets
    assert sum(r["docs_processed"] for r in done) == 20
    assert all(r["status"] == STATUS_SUCCESS for r in done)
    assert eng.transcripts().count() == 50


def test_optimize_between_kill_and_resume_is_transparent(spark, tmp_path):
    """Maintenance mid-load: a table rewrite (compaction + re-bucketing
    via SragEngine.optimize) between a killed ingest and its resume must
    not disturb wave checkpoints, dedup the resume, or change the final
    state vs a one-shot run."""
    from srag_spark.api import SragEngine
    from srag_spark.plans.pipeline import IngestionPipeline

    docs = spark.createDataFrame(
        [
            (f"d{i}",
             [{"kind": "text", "text": f"doc {i} content words", "media_ref": None,
               "offset": 0}],
             {"job": "load"})
            for i in range(24)
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, metadata map<string,string>",
    )

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=8)
    IngestionPipeline(eng, wave_size=2).run(docs, max_waves=2)  # killed

    stats = eng.optimize(n_buckets=16)  # maintenance while half-loaded
    assert all(s["n_buckets"] == 16 for s in stats.values())

    pipe2 = IngestionPipeline(eng, wave_size=2)
    s2 = pipe2.run(docs)
    assert s2["skipped"] == 4 and len(s2["succeeded"]) == 4
    assert eng.transcripts().count() == 24
    assert eng.chunks().count() == 24 and eng.embeddings().count() == 24
    assert eng.metrics().count() == 24
    assert all(c.ok for c in eng.health())
    # lineage metrics survive the re-bucketing: post-optimize waves read
    # the metrics table WITHOUT the stale wave-id bucket pruning (the
    # table's modulus is 16, the wave's is 8), so every checkpoint row
    # counts its wave's docs and the total equals the corpus
    done = pipe2.latest_checkpoints().collect()
    assert sum(r["docs_processed"] for r in done) == 24
    assert all(r["docs_processed"] > 0 for r in done)
