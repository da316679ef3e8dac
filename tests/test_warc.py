"""WET (CommonCrawl text-conversion) source: spec-exact framing parse,
gzip transparency, strict/lenient malformed handling, and the bridge
into the engine's interleaved-documents shape."""

from __future__ import annotations

import gzip

import pytest

from srag_spark.sources.warc import (
    WetFormatError,
    parse_wet_bytes,
    read_wet,
    synth_wet_files,
    wet_to_documents,
)


def test_roundtrip_plain_and_gzip(spark, tmp_path):
    d1, d2 = str(tmp_path / "plain"), str(tmp_path / "gz")
    synth_wet_files(d1, n_files=3, records_per_file=12, compress=False)
    synth_wet_files(d2, n_files=3, records_per_file=12, compress=True)
    a = read_wet(spark, d1 + "/*.wet").collect()
    b = read_wet(spark, d2 + "/*.gz").collect()
    # warcinfo dropped: 3 files x 12 content records
    assert len(a) == len(b) == 36
    ka = {(r["record_id"], r["target_uri"], r["text"]) for r in a}
    kb = {(r["record_id"], r["target_uri"], r["text"]) for r in b}
    assert ka == kb  # compression-transparent
    r0 = next(r for r in a if r["target_uri"] == "https://example.org/0/0")
    assert r0["warc_type"] == "conversion"
    assert r0["content_length"] == len(r0["text"].encode("utf-8"))
    # the embedded fake version line stayed INSIDE the payload
    # (Content-Length framing, not line-splitting)
    assert "WARC/1.0 is mentioned IN the payload" in r0["text"]
    assert "durée" in r0["text"]  # multi-byte length honored


def test_warcinfo_kept_when_asked(spark, tmp_path):
    d = str(tmp_path / "w")
    synth_wet_files(d, n_files=1, records_per_file=4)
    rows = read_wet(spark, d, keep_types=("conversion", "warcinfo")).collect()
    assert sum(r["warc_type"] == "warcinfo" for r in rows) == 1
    assert sum(r["warc_type"] == "conversion" for r in rows) == 4


def test_strict_raises_lenient_resyncs():
    good = parse_wet_bytes(_one_record(b"hello world"))
    assert len(good) == 1 and good[0]["text"] == "hello world"

    garbage = b"NOT-A-WARC\r\njunk\r\n\r\n" + _one_record(b"second")
    with pytest.raises(WetFormatError, match="version line"):
        parse_wet_bytes(garbage)
    lenient = parse_wet_bytes(garbage, strict=False)
    assert [r["text"] for r in lenient] == ["second"]

    truncated = _one_record(b"full payload")[:-20]
    with pytest.raises(WetFormatError):
        parse_wet_bytes(truncated)
    # lenient: the truncated tail record is dropped, never a short row
    assert parse_wet_bytes(truncated, strict=False) == []

    # payload overrun only hurts its own record in lenient mode
    no_len = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n\r\nloose text\n"
        + _one_record(b"tail")
    )
    with pytest.raises(WetFormatError, match="Content-Length"):
        parse_wet_bytes(no_len)
    got = parse_wet_bytes(no_len, strict=False)
    assert [r["text"] for r in got][-1] == "tail"


def test_negative_content_length_terminates():
    # a negative length must not move the cursor backwards (strict: clear
    # error; lenient: resync forward — NEVER an infinite loop)
    bad = _one_record(b"ok").replace(
        b"Content-Length: 2", b"Content-Length: -100"
    ) + _one_record(b"after")
    with pytest.raises(WetFormatError, match="Content-Length"):
        parse_wet_bytes(bad)
    got = parse_wet_bytes(bad, strict=False)
    assert [r["text"] for r in got][-1] == "after"
    assert all(r["content_length"] is None or r["content_length"] >= 0 for r in got)


def test_folded_header_continuation():
    # ISO 28500 allows folded header values (continuation lines start
    # with whitespace) — legal in strict mode, joined with one space
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://x.test/very/long\r\n"
        b"  /folded:path/tail\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    (r,) = parse_wet_bytes(rec)  # strict
    assert r["target_uri"] == "https://x.test/very/long /folded:path/tail"
    assert r["text"] == "ok"


def test_doc_ids_unique_when_uri_and_id_missing(spark):
    # two distinct damaged records with NO record id, NO uri and equal
    # (empty-ish) text must still get distinct doc_ids (byte offset)
    rec = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    parsed = parse_wet_bytes(rec + rec)
    assert len(parsed) == 2
    assert parsed[0]["record_offset"] != parsed[1]["record_offset"]
    from srag_spark.sources.warc import WET_RECORDS_SCHEMA

    df = spark.createDataFrame(parsed, WET_RECORDS_SCHEMA)
    ids = [r["doc_id"] for r in wet_to_documents(df).collect()]
    assert len(set(ids)) == 2


def _one_record(payload: bytes) -> bytes:
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://x.test/\r\n"
        b"WARC-Record-ID: <urn:uuid:deadbeef>\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
        + b"\r\n\r\n"
    )


def test_multi_member_gzip_stream():
    # WARC convention: one gzip member per record, members concatenated
    data = gzip.compress(_one_record(b"m1"), mtime=0) + gzip.compress(
        _one_record(b"m2"), mtime=0
    )
    assert [r["text"] for r in parse_wet_bytes(data)] == ["m1", "m2"]


def test_bridge_to_documents_and_extraction(spark, tmp_path):
    from srag_spark.operators.parse import explode_extracted, extract_documents

    d = str(tmp_path / "wet")
    synth_wet_files(d, n_files=2, records_per_file=6)
    docs = wet_to_documents(read_wet(spark, d))
    rows = docs.collect()
    assert len(rows) == 12
    for r in rows:
        assert r["doc_id"].startswith("<urn:uuid:")
        assert len(r["spans"]) == 1 and r["spans"][0]["kind"] == "text"
        assert r["metadata"]["uri"].startswith("https://example.org/")
        assert "source_file" in r["metadata"]
    # the input_hint shape feeds the extraction pipeline directly
    flat = explode_extracted(extract_documents(docs.select("doc_id", "spans")))
    assert flat.count() > 0
    one = flat.filter(flat.kind == "text").limit(1).collect()
    assert one and one[0]["text"]


def test_doc_id_fallback_without_record_id(spark):
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://no-id.test/\r\n"
        b"Content-Length: 5\r\n\r\nabcde\r\n\r\n"
    )
    parsed = parse_wet_bytes(rec)
    from srag_spark.sources.warc import WET_RECORDS_SCHEMA

    df = spark.createDataFrame(parsed, WET_RECORDS_SCHEMA)
    out = wet_to_documents(df).collect()[0]
    assert out["doc_id"].startswith("https://no-id.test/#")
    assert "warc_date" not in out["metadata"]  # null-valued keys dropped
