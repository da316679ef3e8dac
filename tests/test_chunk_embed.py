"""Chunking + embedding operator tests (P4, P7, P8, P9, E1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from srag_spark import golden, synth
from srag_spark.functions.embedding import embed_udf, hash_embed
from srag_spark.operators.chunk import (
    chunk_documents,
    reconstruct_text,
    word_group_chunk_documents,
)
from srag_spark.operators.parse import extract_documents
from srag_spark.schema import DOCUMENTS_SCHEMA, EMBEDDING_DIM

TEXT_SCHEMA = "doc_id string, text string"


# --- P4 reconstruction: native array_join equals golden join ---
def test_reconstruct_text_native_matches_golden(spark):
    rows = synth.generate_rows(20, seed=11, mega_every=0)
    df = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
    extracted = extract_documents(df)
    got = {r["doc_id"]: r["text"] for r in reconstruct_text(extracted).collect()}
    for doc_id, spans in rows:
        out, *_ = golden.extract_document(spans)
        expected = golden.reconstruct_text([t for _, t, _ in out if t is not None])
        assert got[doc_id] == expected, doc_id


# --- P7 recursive chunker: Spark output == golden, enumerated by posexplode ---
def test_chunk_documents_matches_golden(spark):
    texts = [
        ("d1", "chunk zero"),
        ("d2", " ".join(f"w{i}" for i in range(800))),
        ("d3", ""),
        ("d4", None),
        ("d5", ("sentence one. " * 40 + "\n\n") * 3),
    ]
    df = spark.createDataFrame(texts, TEXT_SCHEMA)
    got = {}
    for r in chunk_documents(df, max_chars=200, overlap=40).collect():
        got.setdefault(r["doc_id"], []).append((r["segment_index"], r["text"]))
    for doc_id, chunks in got.items():
        assert [i for i, _ in sorted(chunks)] == list(range(len(chunks)))
    for doc_id, text in texts:
        exp = golden.recursive_chunk(text, max_chars=200, overlap=40) if text else []
        assert [t for _, t in sorted(got.get(doc_id, []))] == exp, doc_id


# --- P8 word-group chunker (QueryService.scala:28-33) ---
def test_word_group_chunk_documents(spark):
    df = spark.createDataFrame(
        [("d1", " ".join(str(i) for i in range(25)))], TEXT_SCHEMA
    )
    out = sorted(
        (r["segment_index"], r["text"])
        for r in word_group_chunk_documents(df, chunk_size=10).collect()
    )
    assert out == [
        (0, " ".join(str(i) for i in range(10))),
        (1, " ".join(str(i) for i in range(10, 20))),
        (2, " ".join(str(i) for i in range(20, 25))),
    ]


# --- E1 deterministic embedding stub ---
def test_hash_embed_contract():
    v = hash_embed("some chunk text")
    assert v.shape == (EMBEDDING_DIM,)
    assert v.dtype == np.float32
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    assert np.array_equal(v, hash_embed("some chunk text"))
    assert not np.array_equal(v, hash_embed("other text"))


def test_embed_udf_matches_local(spark):
    df = spark.createDataFrame([("a", "hello"), ("b", "world")], TEXT_SCHEMA)
    got = {r["doc_id"]: r["v"] for r in df.select("doc_id", embed_udf("text").alias("v")).collect()}
    assert np.allclose(got["a"], hash_embed("hello"), atol=1e-6)
    assert np.allclose(got["b"], hash_embed("world"), atol=1e-6)
