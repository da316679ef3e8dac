"""Incremental extraction refresh (CDC-driven re-extraction).

The invariant that matters: after any sequence of source mutations +
refreshes, the incrementally-maintained engine is row-for-row EQUAL to a
from-scratch engine built over the source's current snapshot — across
transcripts, chunks and embeddings.  Plus: watermark advance, no-op
reruns, delete retraction, pinned-version refresh, and crash-rerun
convergence (idempotence).
"""

from __future__ import annotations

import pytest

from srag_spark.api import SragEngine
from srag_spark.plans.incremental import (
    incremental_refresh,
    refresh_checkpoint,
    refresh_plan,
)
from srag_spark.sources.tables import (
    delete_by_key,
    latest_manifest_version,
    read_table,
    upsert_by_key,
)
from srag_spark.synth import synth_documents_df


def _source(spark, path: str, n: int = 8, seed: int = 5) -> None:
    docs = synth_documents_df(spark, n, seed=seed, mega_every=0)
    upsert_by_key(spark, path, docs, ["doc_id"], n_buckets=4)


def _table_rows(df, drop=("metadata", "created_at")):
    cols = sorted(c for c in df.columns if c not in drop)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.select(cols).collect())


def _assert_engines_equal(inc: SragEngine, scratch: SragEngine) -> None:
    for name in ("transcripts", "chunks", "embeddings"):
        got = _table_rows(getattr(inc, name)())
        want = _table_rows(getattr(scratch, name)())
        assert got == want, f"{name} diverged after incremental refresh"


def _scratch_engine(spark, tmp_path, source_path: str, tag: str) -> SragEngine:
    eng = SragEngine(spark, str(tmp_path / f"scratch-{tag}"), n_buckets=4)
    eng.ingest(read_table(spark, source_path))
    return eng


def test_initial_refresh_is_full_ingest(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=6)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    res = eng.refresh_from(src)
    assert res["inserted"] == 6 and res["updated"] == 0 and res["deleted"] == 0
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "init"))


def test_incremental_equals_from_scratch_after_mutations(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=8, seed=5)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.refresh_from(src)

    # mutate the source: update 2 docs (same ids, different content),
    # insert 2 new ones, delete 1
    updates = synth_documents_df(spark, 2, seed=99, mega_every=0)
    fresh = (
        synth_documents_df(spark, 10, seed=5, mega_every=0)
        .filter("doc_id >= 'doc-00000008'")
    )
    upsert_by_key(spark, src, updates.unionByName(fresh), ["doc_id"], n_buckets=4)
    delete_by_key(
        spark, src,
        spark.createDataFrame([("doc-00000005",)], "doc_id string"),
        ["doc_id"],
    )

    plan = refresh_plan(eng, src)
    kinds = {r["doc_id"]: r["change_type"] for r in plan.select("doc_id", "change_type").collect()}
    assert kinds["doc-00000005"] == "delete"
    assert kinds["doc-00000008"] == "insert" and kinds["doc-00000009"] == "insert"
    assert kinds["doc-00000000"] == "update" and kinds["doc-00000001"] == "update"

    res = eng.refresh_from(src)
    assert (res["inserted"], res["updated"], res["deleted"]) == (2, 2, 1)
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "mut"))
    # the deleted doc is gone from every derived table
    for name in ("transcripts", "chunks", "embeddings", "metrics"):
        tbl = getattr(eng, name)()
        assert tbl.filter("doc_id = 'doc-00000005'").count() == 0


def test_noop_rerun_and_monotone_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=4)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.refresh_from(src)
    v = refresh_checkpoint(eng, src)
    before = _table_rows(eng.chunks())
    res = eng.refresh_from(src)
    assert (res["inserted"], res["updated"], res["deleted"]) == (0, 0, 0)
    assert refresh_checkpoint(eng, src) == v
    assert _table_rows(eng.chunks()) == before
    with pytest.raises(ValueError, match="precedes the processed watermark"):
        incremental_refresh(eng, src, to_version=v - 1)


def test_refresh_to_pinned_version_replays_history(spark, tmp_path):
    src = str(tmp_path / "src")
    _source(spark, src, n=4, seed=5)
    v1 = latest_manifest_version(spark, src)
    upsert_by_key(
        spark, src, synth_documents_df(spark, 2, seed=77, mega_every=0),
        ["doc_id"], n_buckets=4,
    )
    v2 = latest_manifest_version(spark, src)

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    r1 = eng.refresh_from(src, to_version=v1)
    assert r1["inserted"] == 4 and refresh_checkpoint(eng, src) == v1
    r2 = eng.refresh_from(src, to_version=v2)
    assert r2["updated"] == 2 and refresh_checkpoint(eng, src) == v2
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "pin"))


def test_audited_refresh_publishes_when_gates_pass(spark, tmp_path):
    from srag_spark.plans.audits import max_parse_failure_rate, min_docs

    src = str(tmp_path / "src")
    _source(spark, src, n=6)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    res = eng.refresh_from(src, audits=[min_docs(3), max_parse_failure_rate(1.0)])
    assert res["published"] is True and len(res["audits"]) == 2
    assert res["inserted"] == 6
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "aud-ok"))

    # incremental leg: mutate, refresh with passing gates again
    upsert_by_key(
        spark, src, synth_documents_df(spark, 2, seed=41, mega_every=0),
        ["doc_id"], n_buckets=4,
    )
    res2 = eng.refresh_from(src, audits=[min_docs(1)])
    assert res2["published"] is True and res2["updated"] == 2
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "aud-ok2"))


def test_audited_refresh_failure_unwinds_diff_and_watermark(spark, tmp_path):
    """A failing gate must unwind the WHOLE diff — the deletes too — and
    leave the watermark where it was, so readers never see the poisoned
    batch and the next refresh re-processes the same changelog."""
    from srag_spark.plans.audits import min_docs

    src = str(tmp_path / "src")
    _source(spark, src, n=6, seed=5)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.refresh_from(src)
    wm = refresh_checkpoint(eng, src)
    before = {n: _table_rows(getattr(eng, n)()) for n in ("transcripts", "chunks")}

    # poisoned upstream batch: 1 insert + 1 delete, gated on min_docs(5)
    upsert_by_key(
        spark, src, synth_documents_df(spark, 1, seed=88, mega_every=0),
        ["doc_id"], n_buckets=4,
    )
    delete_by_key(
        spark, src,
        spark.createDataFrame([("doc-00000003",)], "doc_id string"),
        ["doc_id"],
    )
    res = eng.refresh_from(src, audits=[min_docs(5)])
    assert res["published"] is False
    assert [r.ok for r in res["audits"]] == [False]
    # nothing moved: deleted doc still visible, no new doc, watermark put
    assert refresh_checkpoint(eng, src) == wm
    for n, rows in before.items():
        assert _table_rows(getattr(eng, n)()) == rows
    assert eng.staged_ingests() == {}  # failed stage fully resolved

    # the same changelog replays cleanly once the gate passes
    res2 = eng.refresh_from(src, audits=[min_docs(1)])
    assert res2["published"] is True and res2["deleted"] == 1
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "aud-fail"))


def test_crash_rerun_converges(spark, tmp_path, monkeypatch):
    """A refresh that dies AFTER applying the diff but BEFORE the
    checkpoint write must converge on rerun (idempotent re-application
    of the same changelog)."""
    src = str(tmp_path / "src")
    _source(spark, src, n=5, seed=5)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.refresh_from(src)
    upsert_by_key(
        spark, src, synth_documents_df(spark, 2, seed=31, mega_every=0),
        ["doc_id"], n_buckets=4,
    )
    delete_by_key(
        spark, src,
        spark.createDataFrame([("doc-00000004",)], "doc_id string"),
        ["doc_id"],
    )

    import srag_spark.plans.incremental as inc

    real_write = inc._write_checkpoint

    def boom(*a, **k):
        raise RuntimeError("injected crash before checkpoint")

    monkeypatch.setattr(inc, "_write_checkpoint", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.refresh_from(src)
    monkeypatch.setattr(inc, "_write_checkpoint", real_write)

    # watermark did not advance; rerun re-applies the same diff
    res = eng.refresh_from(src)
    assert res["deleted"] == 1 and res["updated"] == 2
    assert refresh_checkpoint(eng, src) == latest_manifest_version(spark, src)
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "crash"))


def test_audited_refresh_crash_before_stage_record_never_exposes_batch(
    spark, tmp_path, monkeypatch
):
    """A tick that dies AFTER applying the diff but BEFORE recording the
    stage leaves unpublished table commits.  The rerun's WAP base must
    be the PUBLISHED state readers see — a failing gate then unwinds
    the crashed leftovers too, and the poisoned batch never becomes
    visible (the review-found crash window)."""
    from srag_spark.api import SragEngine as _Eng
    from srag_spark.plans.audits import min_docs

    src = str(tmp_path / "src")
    _source(spark, src, n=6, seed=5)
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.refresh_from(src)
    wm = refresh_checkpoint(eng, src)
    before = _table_rows(eng.transcripts())

    upsert_by_key(
        spark, src, synth_documents_df(spark, 1, seed=88, mega_every=0),
        ["doc_id"], n_buckets=4,
    )
    delete_by_key(
        spark, src,
        spark.createDataFrame([("doc-00000002",)], "doc_id string"),
        ["doc_id"],
    )

    real = _Eng._write_wap_record

    def boom(self, base):
        raise RuntimeError("injected crash before stage record")

    monkeypatch.setattr(_Eng, "_write_wap_record", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.refresh_from(src, audits=[min_docs(5)])
    monkeypatch.setattr(_Eng, "_write_wap_record", real)

    # readers still on the pre-batch snapshot despite the crashed commits
    assert _table_rows(eng.transcripts()) == before

    # rerun with the (still failing) gate: the WHOLE batch — crashed
    # leftovers included — must stay invisible and roll back
    res = eng.refresh_from(src, audits=[min_docs(5)])
    assert res["published"] is False
    assert _table_rows(eng.transcripts()) == before
    assert refresh_checkpoint(eng, src) == wm
    assert eng.staged_ingests() == {}

    # once the gate passes the same changelog applies cleanly
    res2 = eng.refresh_from(src, audits=[min_docs(1)])
    assert res2["published"] is True and res2["deleted"] == 1
    _assert_engines_equal(eng, _scratch_engine(spark, tmp_path, src, "crashwap"))
