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


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale contract: an upsert touching one key must leave every
    other bucket's files physically untouched (same paths, same mtimes) —
    the partition-scoped rewrite, not a full-table rewrite."""
    import glob
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    schema = "doc_id string, segment_index int, text string"
    rows = [(f"d{i}", 0, f"v{i}") for i in range(200)]
    upsert_by_key(
        spark, path, spark.createDataFrame(rows, schema),
        ["doc_id", "segment_index"], n_buckets=16,
    )

    def files():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(f"{path}/_kb=*/*.parquet")
        }

    before = files()
    assert len({p.split("/_kb=")[1].split("/")[0] for p in before}) > 4
    upsert_by_key(
        spark, path, spark.createDataFrame([("d0", 0, "v0b")], schema),
        ["doc_id", "segment_index"],
    )
    after = files()
    b0 = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("d0")), F.lit(16)).cast("int")
    ).head()[0]
    tag = f"/_kb={b0}/"
    assert {p: m for p, m in before.items() if tag not in p} == {
        p: m for p, m in after.items() if tag not in p
    }
    assert any(tag in p for p in after)
    got = rows_of(spark, path)
    assert got[("d0", 0)] == "v0b" and len(got) == 200


def test_delete_drops_emptied_bucket_dirs(spark, tmp_path):
    """Deleting every row of a bucket must remove the bucket directory
    (dynamic overwrite alone would leave the stale files in place)."""
    import glob

    path = str(tmp_path / "t")
    schema = "doc_id string, segment_index int, text string"
    rows = [(f"d{i}", s, "x") for i in range(40) for s in (0, 1)]
    upsert_by_key(
        spark, path, spark.createDataFrame(rows, schema),
        ["doc_id", "segment_index"], n_buckets=8,
    )
    # delete ALL doc_ids → every bucket emptied → every bucket dir gone
    delete_by_key(
        spark, path,
        spark.createDataFrame([(f"d{i}",) for i in range(40)], "doc_id string"),
        ["doc_id"],
    )
    assert glob.glob(f"{path}/_kb=*") == []


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
