"""SragEngine façade: the reference's endpoint surface end-to-end
(ingest → query → get/list → re-ingest replace → delete)."""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.api import SragEngine
from srag_spark.schema import DOCUMENTS_SCHEMA

TEXT_A = (
    "the quick brown fox jumps over the lazy dog and runs to the hills "
    "in the morning light for a long time with many friends of the forest"
)
TEXT_B = (
    "a completely different document about cooking pasta with tomato "
    "sauce and fresh basil leaves from the garden in the summer"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (
                doc_id,
                [{"kind": "text", "text": t, "media_ref": None, "offset": 0}],
            )
            for doc_id, t in rows
        ],
        schema=DOCUMENTS_SCHEMA,
    )


def test_engine_ingest_query_get_list_delete(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=8)
    stats = eng.ingest(_docs(spark, [("a", TEXT_A), ("b", TEXT_B)]))
    assert stats["documents"] == 2
    assert stats["chunks"] >= 2 and stats["embeddings"] == stats["chunks"]

    # query: deterministic rerank column makes the result checkable
    hits = eng.query(
        "cooking pasta tomato sauce", limit=3,
        rerank_col=F.length("text").cast("double") / 1000.0,
    ).collect()
    assert hits and hits[0]["doc_id"] in {"a", "b"}

    # point lookup + listing
    row = eng.get_transcript("a").collect()
    assert len(row) == 1 and row[0]["doc_id"] == "a"
    listed = eng.list_transcripts(sort_by="doc_id", ascending=True).collect()
    assert [r["doc_id"] for r in listed] == ["a", "b"]

    # delete everywhere
    eng.delete_transcript("a")
    assert eng.get_transcript("a").count() == 0
    assert eng.chunks().filter(F.col("doc_id") == "a").count() == 0
    assert eng.embeddings().filter(F.col("doc_id") == "a").count() == 0
    assert eng.get_transcript("b").count() == 1


def test_engine_reingest_replaces_and_replay_converges(spark, tmp_path):
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=8)
    # long doc -> multiple chunks
    long_text = " ".join([TEXT_A] * 12)
    eng.ingest(_docs(spark, [("a", long_text), ("b", TEXT_B)]))
    n_chunks_long = eng.chunks().filter(F.col("doc_id") == "a").count()
    assert n_chunks_long > 1

    # re-ingest doc a SHRUNK: all old chunks must be replaced, none stale
    eng.ingest(_docs(spark, [("a", TEXT_A)]))
    a_chunks = eng.chunks().filter(F.col("doc_id") == "a").collect()
    assert len(a_chunks) == 1 and a_chunks[0]["text"].startswith("the quick")
    # b untouched
    assert eng.chunks().filter(F.col("doc_id") == "b").count() >= 1

    # replaying the same ingest converges (J7)
    before = {
        (r["doc_id"], r["segment_index"]): r["text"]
        for r in eng.chunks().collect()
    }
    eng.ingest(_docs(spark, [("a", TEXT_A)]))
    after = {
        (r["doc_id"], r["segment_index"]): r["text"]
        for r in eng.chunks().collect()
    }
    assert after == before
