"""Audit gates over staged ingests (audited write–audit–publish).

Covers: all-pass publish, failing gate abandons (engine unchanged),
keep_failed_stage leaves the stage inspectable, each canned audit
(min_docs, min_quality, max_duplicate_rate incl. vs_base,
max_contamination, max_parse_failure_rate) firing on a crafted batch,
and staged_changelog's insert/update classification.
"""

from __future__ import annotations

from srag_spark.api import SragEngine
from srag_spark.plans.audits import (
    audited_ingest,
    max_contamination,
    max_duplicate_rate,
    max_parse_failure_rate,
    min_docs,
    min_quality,
)
from srag_spark.schema import DOCUMENTS_SCHEMA

LONG_SENTENCE = (
    "the quick brown fox jumps over the lazy dog while catalyst plans "
    "every stage of the distributed query evaluation pipeline carefully."
)


def _docs(spark, rows):
    """rows: [(doc_id, [(kind, text)])] → documents table shape."""
    data = [
        (doc_id, [(kind, text, None, i) for i, (kind, text) in enumerate(spans)])
        for doc_id, spans in rows
    ]
    return spark.createDataFrame(data, DOCUMENTS_SCHEMA)


def _good_batch(spark, n=3, salt=""):
    return _docs(
        spark,
        [
            (
                f"d{salt}{i}",
                [("text", f"document number {i}{salt} talks about engines. "
                          + LONG_SENTENCE.replace("fox", f"fox{i}{salt}"))],
            )
            for i in range(n)
        ],
    )


def test_all_pass_publishes(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    rep = audited_ingest(
        eng, _good_batch(spark),
        audits=[min_docs(3), min_quality(0.2), max_duplicate_rate(0.99)],
    )
    assert rep["published"] is True and rep["staging_id"] is None
    assert len(rep["audits"]) == 3 and all(r.ok for r in rep["audits"])
    assert eng.transcripts().count() == 3
    assert eng.staged_ingests() == {}


def test_failing_gate_abandons_and_reports_all(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.ingest(_good_batch(spark, salt="base"))
    before = eng.transcripts().count()
    rep = audited_ingest(
        eng, _good_batch(spark, n=2),
        audits=[min_docs(10), min_quality(0.0)],
    )
    assert rep["published"] is False and rep["staging_id"] is None
    # every audit ran, not just the first failing one
    by_name = {r.name: r.ok for r in rep["audits"]}
    assert by_name["min_docs(10)"] is False
    assert by_name["min_quality(0.0)"] is True
    assert eng.transcripts().count() == before
    assert eng.staged_ingests() == {}


def test_keep_failed_stage_for_inspection(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    rep = audited_ingest(
        eng, _good_batch(spark), audits=[min_docs(99)], keep_failed_stage=True
    )
    assert rep["published"] is False
    sid = rep["staging_id"]
    assert sid in eng.staged_ingests()
    assert eng.staged_tables(sid)["transcripts"].count() == 3
    eng.abandon_ingest(sid)
    assert eng.staged_ingests() == {}


def test_contamination_gate(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eval_docs = spark.createDataFrame([(LONG_SENTENCE,)], "text string")
    dirty = _docs(
        spark,
        [("clean0", [("text", "a short unrelated note about parquet files.")]),
         ("leak0", [("text", "prefix words then " + LONG_SENTENCE)])],
    )
    rep = audited_ingest(
        eng, dirty, audits=[max_contamination(eval_docs, 0.0)]
    )
    assert rep["published"] is False
    assert "1/2 contaminated" in rep["audits"][0].detail
    # relaxed threshold lets the same batch through
    rep2 = audited_ingest(
        eng, dirty, audits=[max_contamination(eval_docs, 0.5)]
    )
    assert rep2["published"] is True


def test_duplicate_gate_within_batch_and_vs_base(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    twin = [("text", "identical content " + LONG_SENTENCE)]
    batch = _docs(spark, [("a0", twin), ("a1", twin)])
    rep = audited_ingest(eng, batch, audits=[max_duplicate_rate(0.0)])
    assert rep["published"] is False, rep["audits"][0].detail

    # distinct batch passes, lands as base
    assert audited_ingest(
        eng, _good_batch(spark), audits=[max_duplicate_rate(0.0)]
    )["published"]
    # a NEW doc duplicating base text: within-batch check passes,
    # vs_base check catches it
    def echo(doc_id):
        return _docs(spark, [(doc_id, [("text", "document number 0 talks about engines. "
                                                + LONG_SENTENCE.replace("fox", "fox0"))])])

    assert audited_ingest(
        eng, echo("echo0"), audits=[max_duplicate_rate(0.0)]
    )["published"] is True
    rep3 = audited_ingest(
        eng, echo("echo1"), audits=[max_duplicate_rate(0.0, vs_base=True)]
    )
    assert rep3["published"] is False, rep3["audits"][0].detail


def test_parse_failure_gate(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    bad = _docs(
        spark,
        [("ok0", [("text", LONG_SENTENCE)]),
         ("bad0", [("martian", "unparseable payload"), ("text", LONG_SENTENCE)])],
    )
    rep = audited_ingest(eng, bad, audits=[max_parse_failure_rate(0.0)])
    assert rep["published"] is False
    assert "1/2 docs" in rep["audits"][0].detail
    rep2 = audited_ingest(eng, bad, audits=[max_parse_failure_rate(0.5)])
    assert rep2["published"] is True


def test_staged_changelog_classifies_updates(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.ingest(_good_batch(spark, n=2))
    update_and_new = _docs(
        spark,
        [("d0", [("text", "completely rewritten body. " + LONG_SENTENCE)]),
         ("d9", [("text", "a brand new document. " + LONG_SENTENCE)])],
    )
    sid = eng.stage_ingest(update_and_new)["staging_id"]
    kinds = {
        r["doc_id"]: r["change_type"]
        for r in eng.staged_changelog(sid, "transcripts")
        .select("doc_id", "change_type").collect()
    }
    assert kinds == {"d0": "update", "d9": "insert"}
    eng.abandon_ingest(sid)
