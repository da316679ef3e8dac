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


def _docs_with_attrs(spark, rows):
    """rows: (doc_id, spans, metadata, language) — the optional-column
    ingest shape (reference ingest requests carry language + metadata)."""
    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "metadata map<string,string>, language string"
    )
    return spark.createDataFrame(rows, schema)


def test_engine_ingest_metadata_and_language_flow(spark, tmp_path):
    """VERDICT r3 #1: per-doc metadata + language must flow through
    ingest onto transcripts AND chunks/embeddings so metadata filters
    bite on engine-built tables (Transcript.scala:17-21 merge;
    OpenSearchAdapter.scala:216-224 / QdrantAdapter.scala:173-181
    metadata.* filtering; MainHandlers.scala:71-74 listing filter)."""
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=8)
    span = lambda t: [{"kind": "text", "text": t, "media_ref": None, "offset": 0}]
    eng.ingest(
        _docs_with_attrs(
            spark,
            [
                ("a", span(TEXT_A), {"tenant": "acme", "env": "dev"}, "EN"),
                ("b", span(TEXT_B), {"tenant": "beta"}, "fr"),
                ("c", span("short doc three body text"), None, "zz"),
            ],
        ),
        metadata={"job": "j-7"},
    )
    t = {r["doc_id"]: r for r in eng.transcripts().collect()}
    # language validated (P10): EN→en, fr kept, zz (not in the enum)→NULL
    assert t["a"]["language"] == "en"
    assert t["b"]["language"] == "fr"
    assert t["c"]["language"] is None
    # metadata: per-doc map right-merged with the batch-level job map
    assert dict(t["a"]["metadata"]) == {"tenant": "acme", "env": "dev", "job": "j-7"}
    assert dict(t["b"]["metadata"]) == {"tenant": "beta", "job": "j-7"}
    assert dict(t["c"]["metadata"]) == {"job": "j-7"}

    # chunks and embeddings carry the same merged metadata
    for tbl in (eng.chunks(), eng.embeddings()):
        by_doc = {r["doc_id"]: dict(r["metadata"]) for r in tbl.collect()}
        assert by_doc["a"]["tenant"] == "acme" and by_doc["a"]["job"] == "j-7"
        assert by_doc["b"]["tenant"] == "beta"

    # listing filter returns exactly the matching subset
    assert [
        r["doc_id"] for r in eng.list_transcripts(flt={"tenant": "acme"}).collect()
    ] == ["a"]
    # query filter restricts retrieval to the matching tenant
    hits = eng.query("document text", limit=5, flt={"tenant": "beta"}).collect()
    assert hits and {r["doc_id"] for r in hits} == {"b"}
    # batch-level filter matches everything ingested under the job
    assert eng.list_transcripts(flt={"job": "j-7"}).count() == 3


def test_engine_ingest_batch_metadata_overrides_doc_metadata(spark, tmp_path):
    """The merge is right-biased: batch extra wins on key collision
    (transcript.metadata ++ job.metadata, Transcript.scala:17-21)."""
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    span = [{"kind": "text", "text": TEXT_A, "media_ref": None, "offset": 0}]
    eng.ingest(
        _docs_with_attrs(spark, [("a", span, {"env": "doc-level"}, None)]),
        metadata={"env": "batch-level"},
    )
    row = eng.get_transcript("a").collect()[0]
    assert dict(row["metadata"]) == {"env": "batch-level"}


def test_engine_ingest_audio_word_ms_offsets(spark, tmp_path):
    """VERDICT r3 #8: audio-derived transcript words carry the source
    spans' millisecond offsets (AssemblyAI word shape,
    AssemblyAIAdapter.scala:50-56); text words keep ordinals."""
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    spans = [
        {"kind": "audio", "text": "Hello.", "media_ref": None, "offset": 250},
        {"kind": "audio", "text": "how", "media_ref": None, "offset": 900},
        {"kind": "audio", "text": "are", "media_ref": None, "offset": 1100},
        {"kind": "audio", "text": "you?", "media_ref": None, "offset": 1400},
        # >1000ms gap → new segment
        {"kind": "audio", "text": "Bye", "media_ref": None, "offset": 9000},
        {"kind": "text", "text": "trailing text", "media_ref": None, "offset": 9500},
    ]
    eng.ingest(_docs_with_attrs(spark, [("au", spans, None, "en")]))
    words = eng.get_transcript("au").collect()[0]["words"]
    shaped = [(w["text"], w["start"], w["end"]) for w in words]
    # segments: "Hello." [250,250]; "how are you?" [900,1400]; "Bye" [9000,9000]
    assert shaped[0] == ("Hello.", 250, 250)
    assert shaped[1] == ("how are you?", 900, 1400)
    assert shaped[2] == ("Bye", 9000, 9000)
    # text-derived words fall back to ordinal offsets
    assert shaped[3] == ("trailing", 3, 4)
    assert shaped[4] == ("text", 4, 5)


def test_engine_ingest_parse_kernel_runs_once(spark, tmp_path):
    """VERDICT r3 #2: the extraction kernel must execute each document
    exactly once per ingest call (the persisted plan), not once per
    downstream table action."""
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    docs = _docs(spark, [("a", TEXT_A), ("b", TEXT_B), ("c", "one more doc here")])
    acc = spark.sparkContext.accumulator(0)
    eng.ingest(docs, doc_counter=acc)
    assert acc.value == 3
    # replay (now against existing tables: delete + 3 incremental upserts
    # = strictly more actions) still parses each doc exactly once
    acc2 = spark.sparkContext.accumulator(0)
    eng.ingest(docs, doc_counter=acc2)
    assert acc2.value == 3


def test_engine_ingest_records_extraction_metrics(spark, tmp_path):
    """North-rule lineage: every ingest upserts per-doc extraction
    metrics (spans_out, blocks kept/dropped, parse failures); re-ingest
    updates in place; delete removes the row."""
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    html = "<div>" + " ".join(["word"] * 20) + "</div><div>short nav</div>"
    docs = spark.createDataFrame(
        [
            ("a", [{"kind": "html", "text": html, "media_ref": None, "offset": 0}]),
            ("b", [{"kind": "junkkind", "text": "x", "media_ref": None, "offset": 0}]),
        ],
        schema=DOCUMENTS_SCHEMA,
    )
    eng.ingest(docs)
    m = {r["doc_id"]: r for r in eng.metrics().collect()}
    assert m["a"]["blocks_kept"] == 1 and m["a"]["blocks_dropped"] == 1
    assert m["a"]["spans_out"] == 1 and m["a"]["parse_failures"] == 0
    assert m["b"]["parse_failures"] == 1 and m["b"]["spans_out"] == 0
    eng.ingest(docs)  # replay converges, still one row per doc
    assert eng.metrics().count() == 2
    eng.delete_transcript("b")
    assert [r["doc_id"] for r in eng.metrics().collect()] == ["a"]


def test_cross_table_snapshot_isolation_between_commits(spark, tmp_path, monkeypatch):
    """A reader interleaved between an ingest's four table commits always
    sees the OLD complete engine state; the new state appears atomically
    at the engine-manifest publish (VERDICT r4 #3).  The interleave is
    driven by spying on the facade's upsert_by_key: after EVERY table
    commit of the second ingest, a fresh reader observes the engine."""
    import srag_spark.api as api_mod

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.ingest(_docs(spark, [("a", TEXT_A), ("b", TEXT_B)]))
    t0 = eng.transcripts().count()
    c0 = eng.chunks().count()
    e0 = eng.embeddings().count()
    m0 = eng.metrics().count()

    observed = []
    real_upsert = api_mod.upsert_by_key
    real_delete = api_mod.delete_by_key

    def observe():
        observed.append(
            (
                eng.transcripts().count(),
                eng.chunks().count(),
                eng.embeddings().count(),
                eng.metrics().count(),
            )
        )

    def spy_upsert(spark_, path, *a, **k):
        r = real_upsert(spark_, path, *a, **k)
        observe()
        return r

    def spy_delete(spark_, path, *a, **k):
        r = real_delete(spark_, path, *a, **k)
        observe()
        return r

    monkeypatch.setattr(api_mod, "upsert_by_key", spy_upsert)
    monkeypatch.setattr(api_mod, "delete_by_key", spy_delete)
    # second ingest: re-ingests 'a' (delete-then-upsert across tables) and
    # adds two new docs — the worst interleave surface
    eng.ingest(_docs(spark, [("a", TEXT_B), ("c", TEXT_A), ("d", TEXT_B)]))
    monkeypatch.setattr(api_mod, "upsert_by_key", real_upsert)
    monkeypatch.setattr(api_mod, "delete_by_key", real_delete)

    assert len(observed) >= 4  # 2 entity deletes + 4 upserts interleaved
    for snap in observed:
        assert snap == (t0, c0, e0, m0), (
            "reader between table commits saw a partial state"
        )
    # after the publish, the complete new state is visible
    assert eng.transcripts().count() == 4
    assert eng.chunks().count() == eng.embeddings().count()
    assert eng.metrics().count() == 4


def test_engine_time_travel_across_snapshots(spark, tmp_path):
    """Every ingest/delete publishes an engine snapshot; old versions
    stay readable (four-table-consistent) until vacuumed."""
    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.ingest(_docs(spark, [("a", TEXT_A)]))
    eng.ingest(_docs(spark, [("b", TEXT_B)]))
    eng.delete_transcript("a")

    versions = eng.snapshot_versions()
    assert versions == [1, 2, 3]
    assert sorted(
        r["doc_id"] for r in eng.transcripts(version=1).collect()
    ) == ["a"]
    assert sorted(
        r["doc_id"] for r in eng.transcripts(version=2).collect()
    ) == ["a", "b"]
    assert sorted(r["doc_id"] for r in eng.transcripts().collect()) == ["b"]
    # chunks/embeddings time-travel with the same quadruple
    assert eng.chunks(version=1).count() == eng.embeddings(version=1).count()
    assert eng.chunks(version=1).filter(F.col("doc_id") == "a").count() > 0


def test_engine_vacuum_never_drops_pinned_versions(spark, tmp_path, monkeypatch):
    """After a crash between table commits and the engine publish, the
    engine manifest pins OLDER table versions than latest; vacuum widens
    each table's retention so the pinned versions survive."""
    import srag_spark.api as api_mod
    from srag_spark.sources.tables import upsert_by_key as real_upsert

    eng = SragEngine(spark, str(tmp_path / "kb"), n_buckets=4)
    eng.ingest(_docs(spark, [("a", TEXT_A), ("b", TEXT_B)]))
    t_before = eng.transcripts().count()

    # crash injection: the second ingest commits all tables but dies
    # before publishing the engine snapshot
    def no_publish(self_, max_retries=3):
        raise RuntimeError("crash before engine publish")

    monkeypatch.setattr(
        api_mod.SragEngine, "_publish_engine_snapshot", no_publish
    )
    try:
        eng.ingest(_docs(spark, [("c", TEXT_A)]))
    except RuntimeError:
        pass
    monkeypatch.undo()

    # readers are still on the pinned (old) state
    assert eng.transcripts().count() == t_before
    # vacuum with the tightest retention must keep the pinned versions
    eng.vacuum(keep_manifests=1, min_age_seconds=0.0)
    assert eng.transcripts().count() == t_before
    assert eng.chunks().count() == eng.embeddings().count()
    # replaying the ingest converges and publishes the new state
    eng.ingest(_docs(spark, [("c", TEXT_A)]))
    assert eng.transcripts().count() == t_before + 1
