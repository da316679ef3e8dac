"""Upsert/delete table semantics (S4/S10/J7) + transcript model (P5/P10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.operators.transcripts import (
    build_transcripts,
    enrich_metadata,
    validate_language,
)
from srag_spark.sources.tables import (
    delete_by_key,
    read_manifest,
    read_table,
    upsert_by_key,
    vacuum,
)


def rows_of(spark, path):
    return {
        (r["doc_id"], r["segment_index"]): r["text"]
        for r in read_table(spark, path).collect()
    }


def test_upsert_by_key_semantics(spark, tmp_path):
    path = str(tmp_path / "chunks")
    schema = "doc_id string, segment_index int, text string"
    v1 = spark.createDataFrame(
        [("d1", 0, "a"), ("d1", 1, "b"), ("d2", 0, "c")], schema
    )
    upsert_by_key(spark, path, v1, ["doc_id", "segment_index"])
    assert rows_of(spark, path) == {("d1", 0): "a", ("d1", 1): "b", ("d2", 0): "c"}

    # conflict rows replaced (ON CONFLICT DO UPDATE), new rows inserted
    v2 = spark.createDataFrame([("d1", 0, "a2"), ("d3", 0, "d")], schema)
    upsert_by_key(spark, path, v2, ["doc_id", "segment_index"])
    assert rows_of(spark, path) == {
        ("d1", 0): "a2", ("d1", 1): "b", ("d2", 0): "c", ("d3", 0): "d",
    }

    # idempotent replay (J7)
    upsert_by_key(spark, path, v2, ["doc_id", "segment_index"])
    assert rows_of(spark, path) == {
        ("d1", 0): "a2", ("d1", 1): "b", ("d2", 0): "c", ("d3", 0): "d",
    }


def test_delete_by_key(spark, tmp_path):
    path = str(tmp_path / "chunks")
    schema = "doc_id string, segment_index int, text string"
    upsert_by_key(
        spark,
        path,
        spark.createDataFrame([("d1", 0, "a"), ("d2", 0, "b")], schema),
        ["doc_id", "segment_index"],
    )
    delete_by_key(
        spark, path, spark.createDataFrame([("d1",)], "doc_id string"), ["doc_id"]
    )
    assert rows_of(spark, path) == {("d2", 0): "b"}
    # deleting absent keys is a no-op, not an error
    delete_by_key(
        spark, path, spark.createDataFrame([("dX",)], "doc_id string"), ["doc_id"]
    )
    assert rows_of(spark, path) == {("d2", 0): "b"}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale contract: an upsert touching one key must leave every
    other bucket's files physically untouched (same paths, same bytes —
    the manifest keeps pointing at them) and must remap ONLY the touched
    bucket to a new commit directory."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    schema = "doc_id string, segment_index int, text string"
    rows = [(f"d{i}", 0, f"v{i}") for i in range(200)]
    upsert_by_key(
        spark, path, spark.createDataFrame(rows, schema),
        ["doc_id", "segment_index"], n_buckets=16,
    )
    m1 = read_manifest(spark, path)
    assert len(m1["buckets"]) > 4
    upsert_by_key(
        spark, path, spark.createDataFrame([("d0", 0, "v0b")], schema),
        ["doc_id", "segment_index"],
    )
    m2 = read_manifest(spark, path)
    b0 = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("d0")), F.lit(16)).cast("int")
    ).head()[0]
    # untouched buckets: manifest still references the ORIGINAL dirs —
    # their files were not rewritten, moved, or deleted
    assert {b: d for b, d in m1["buckets"].items() if b != str(b0)} == {
        b: d for b, d in m2["buckets"].items() if b != str(b0)
    }
    assert m2["buckets"][str(b0)] != m1["buckets"][str(b0)]
    got = rows_of(spark, path)
    assert got[("d0", 0)] == "v0b" and len(got) == 200


def test_delete_drops_emptied_buckets_from_snapshot(spark, tmp_path):
    """Deleting every row of every bucket must leave an empty (but
    readable) snapshot — emptied buckets leave the manifest."""
    path = str(tmp_path / "t")
    schema = "doc_id string, segment_index int, text string"
    rows = [(f"d{i}", s, "x") for i in range(40) for s in (0, 1)]
    upsert_by_key(
        spark, path, spark.createDataFrame(rows, schema),
        ["doc_id", "segment_index"], n_buckets=8,
    )
    delete_by_key(
        spark, path,
        spark.createDataFrame([(f"d{i}",) for i in range(40)], "doc_id string"),
        ["doc_id"],
    )
    assert read_manifest(spark, path)["buckets"] == {}
    empty = read_table(spark, path)
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "segment_index", "text"]


def test_crash_before_manifest_commit_preserves_snapshot(spark, tmp_path, monkeypatch):
    """Cross-bucket atomicity: a crash AFTER data files are written but
    BEFORE the manifest rename must leave readers on the old consistent
    snapshot (the documented gap the manifest protocol closes)."""
    import srag_spark.sources.tables as T

    path = str(tmp_path / "t")
    schema = "doc_id string, segment_index int, text string"
    v1 = [(f"d{i}", 0, f"v{i}") for i in range(50)]
    upsert_by_key(
        spark, path, spark.createDataFrame(v1, schema),
        ["doc_id", "segment_index"], n_buckets=8,
    )
    before = rows_of(spark, path)

    def boom(*a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(T, "commit_manifest", boom)
    import pytest

    with pytest.raises(RuntimeError, match="injected crash"):
        upsert_by_key(
            spark, path,
            spark.createDataFrame(
                [(f"d{i}", 0, "CLOBBER") for i in range(50)], schema
            ),
            ["doc_id", "segment_index"],
        )
    monkeypatch.undo()
    # reader sees the OLD snapshot — none of the half-written batch
    assert rows_of(spark, path) == before
    # and replaying the batch converges (J7)
    upsert_by_key(
        spark, path,
        spark.createDataFrame([(f"d{i}", 0, "v2") for i in range(50)], schema),
        ["doc_id", "segment_index"],
    )
    assert set(rows_of(spark, path).values()) == {"v2"}


def test_vacuum_drops_only_unreferenced_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = "doc_id string, segment_index int, text string"
    for ver in ("a", "b", "c"):
        upsert_by_key(
            spark, path,
            spark.createDataFrame([("d1", 0, ver), (f"k{ver}", 0, ver)], schema),
            ["doc_id", "segment_index"], n_buckets=4,
        )
    before = rows_of(spark, path)
    removed = vacuum(spark, path)
    assert removed >= 1
    assert rows_of(spark, path) == before  # latest snapshot fully intact


def test_tables_module_is_object_store_safe():
    """The sink must make NO direct local-filesystem calls — everything
    goes through the Hadoop FS API (fsio) or Spark reads/writes, so it
    runs unchanged on HDFS/S3A/GCS (VERDICT r2 item 1)."""
    import ast
    import pathlib

    import srag_spark.sources.tables as T

    src = pathlib.Path(T.__file__).read_text()
    tree = ast.parse(src)
    imported = {
        alias.name.split(".")[0]
        for node in ast.walk(tree)
        if isinstance(node, (ast.Import, ast.ImportFrom))
        for alias in getattr(node, "names", [])
    } | {
        node.module.split(".")[0]
        for node in ast.walk(tree)
        if isinstance(node, ast.ImportFrom) and node.module
    }
    assert "os" not in imported and "shutil" not in imported
    called = {
        node.func.id
        for node in ast.walk(tree)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
    }
    assert "open" not in called
    attrs = {
        node.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Attribute)
    }
    assert "localCheckpoint" not in attrs


def test_build_transcripts_word_shape(spark):
    from srag_spark.operators.parse import extract_documents
    from srag_spark.schema import DOCUMENTS_SCHEMA

    rows = [
        (
            "t1",
            [
                {"kind": "text", "text": "hello   world\nfrom text", "media_ref": None, "offset": 0},
                {"kind": "media", "text": None, "media_ref": "m", "offset": 1},
            ],
        )
    ]
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    t = build_transcripts(extract_documents(df)).collect()[0]
    # P1 word shape: (text, start=i, end=i+1, confidence=1.0); media skipped
    assert [(w["text"], w["start"], w["end"], w["confidence"]) for w in t["words"]] == [
        ("hello", 0, 1, 1.0),
        ("world", 1, 2, 1.0),
        ("from", 2, 3, 1.0),
        ("text", 3, 4, 1.0),
    ]
    assert t["source"] == "Text"
    assert t["confidence"] == 1.0


def test_enrich_metadata_right_biased(spark):
    # reference golden: {"source":"asr"} ++ {"tenant":"acme"} and
    # right-hand wins on conflict (Transcript.scala:17-21)
    df = spark.createDataFrame(
        [("d1", {"source": "asr", "keep": "x"})],
        "doc_id string, metadata map<string,string>",
    )
    out = enrich_metadata(df, {"tenant": "acme", "source": "job"}).collect()[0]
    assert out["metadata"] == {"source": "job", "keep": "x", "tenant": "acme"}
    # null metadata treated as empty map
    df2 = spark.createDataFrame(
        [("d2", None)], "doc_id string, metadata map<string,string>"
    )
    assert enrich_metadata(df2, {"a": "1"}).collect()[0]["metadata"] == {"a": "1"}


def test_validate_language(spark):
    df = spark.createDataFrame(
        [
            ("1", "en_us"),
            ("2", "FR"),
            ("3", "eng"),
            ("4", None),
            ("5", "d3"),
            # regex-shaped but NOT an enumerated ISO-639-1 code
            # (LanguageCode.scala:27-137): must be rejected
            ("6", "zz"),
            ("7", "la"),  # Latin IS enumerated
        ],
        "doc_id string, language string",
    )
    got = {r["doc_id"]: r["language"] for r in validate_language(df).collect()}
    assert got == {
        "1": "en", "2": "fr", "3": None, "4": None, "5": None,
        "6": None, "7": "la",
    }


def test_build_transcripts_source_dominance(spark):
    """Regression: kind counts must actually count (a default-arg lambda
    in F.filter bound the element INDEX instead of the kind literal,
    making every count empty — source fell back to 'Text' always)."""
    from srag_spark.operators.transcripts import build_transcripts

    df = spark.createDataFrame(
        [
            ("aud", [
                {"kind": "audio", "text": "a", "media_ref": None, "seq": 0},
                {"kind": "audio", "text": "b", "media_ref": None, "seq": 1},
                {"kind": "text", "text": "c", "media_ref": None, "seq": 2},
            ], 0, 0, 0),
            ("doc", [
                {"kind": "pdf", "text": "p", "media_ref": None, "seq": 0},
                {"kind": "pdf", "text": "q", "media_ref": None, "seq": 1},
            ], 0, 0, 0),
            ("tie", [
                {"kind": "text", "text": "t", "media_ref": None, "seq": 0},
                {"kind": "audio", "text": "u", "media_ref": None, "seq": 1},
            ], 0, 0, 0),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,seq:int>>, blocks_kept long, blocks_dropped long, "
        "parse_failures long",
    )
    out = {r["doc_id"]: r["source"] for r in build_transcripts(df).collect()}
    assert out == {"aud": "Audio", "doc": "Document", "tie": "Text"}
