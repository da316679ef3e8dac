"""Checkpoint/resume semantics (J1–J7): resumed runs skip Success
buckets, failed waves retry then dead-letter, and the final output equals
the golden extraction regardless of interruption pattern."""

from __future__ import annotations

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

    for expected_attempt in (1, 2):
        s = pipe.run(docs_df, fail_injector=always_fail)
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
    s3 = pipe.run(docs_df, fail_injector=always_fail)
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

    s2 = pipe.run(docs_df)  # retry of failed wave
    assert len(s2["succeeded"]) == 2 and s2["skipped"] == 2
    assert read_flat(pipe) == golden_flat(docs_rows)
    # lineage/metrics recorded
    ck = pipe.latest_checkpoints().collect()
    assert all(r["status"] == STATUS_SUCCESS for r in ck)
    assert sum(r["docs_processed"] for r in ck) == len(docs_rows)
