"""Upsert/delete table semantics (S4/S10/J7) + transcript model (P5/P10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.operators.transcripts import (
    build_transcripts,
    enrich_metadata,
    validate_language,
)
from srag_spark.sources.tables import delete_by_key, upsert_by_key


def rows_of(spark, path):
    return {
        (r["doc_id"], r["segment_index"]): r["text"]
        for r in spark.read.parquet(path).collect()
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
