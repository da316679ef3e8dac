"""Real-model injection contract (VERDICT r4 #7): a custom batch
embedder / reranker drops into the full engine path (ingest → query)
through ``embed_fn`` / ``rerank_fn`` with no plan changes, and the
defaults remain the deterministic stubs.

The custom callables here stand in for e.g. an ONNX MiniLM session —
module-level (picklable) batch functions with the documented contract:

    embed_fn(texts: pd.Series[str]) -> iterable of float32[dim]
    rerank_fn(query: str, texts: pd.Series[str]) -> iterable of float
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from srag_spark.api import SragEngine
from srag_spark.functions.embedding import embed_query, hash_embed, make_embed_udf
from srag_spark.operators.retrieval import retrieve_context
from srag_spark.schema import DOCUMENTS_SCHEMA, EMBEDDING_DIM

TEXTS = {
    "a": "alpha document with several words about spark tables",
    "b": "bravo text mentioning pasta sauce and basil in the kitchen",
    "c": "charlie entry on spark joins and shuffle partitions at scale",
    "d": "delta note about gardens tomatoes and summer rain outside",
    "e": "echo page describing spark aggregation and window functions",
    "f": "foxtrot article on baking bread with yeast and warm water",
}


# the injected callables are built as CLOSURES (factories) so cloudpickle
# ships them by value to executors — a test module isn't importable from
# Spark workers; a real deployment's embed_fn would live in a --py-files
# module or a closure just like this
def make_toy_embed():
    import numpy as _np

    dim = EMBEDDING_DIM

    def toy_embed(texts):
        """Deterministic non-stub embedder: dim0 = 1, dim1 = len/100,
        unit-normalized — trivially distinguishable from hash_embed."""
        out = []
        for t in texts:
            v = _np.zeros(dim, dtype=_np.float32)
            v[0] = 1.0
            v[1] = len(t) / 100.0
            out.append(v / _np.linalg.norm(v))
        return out

    return toy_embed


def make_toy_rerank():
    def toy_rerank(query, texts):
        """Deterministic non-stub cross-encoder: token-overlap ratio
        with the query, spread into the [0.3, 1.0] acceptance range."""
        q = set(query.lower().split())
        return [
            0.3
            + 0.7 * (len(q & set((t or "").lower().split())) / max(len(q), 1))
            for t in texts
        ]

    return toy_rerank


toy_embed = make_toy_embed()
toy_rerank = make_toy_rerank()


def _docs(spark):
    return spark.createDataFrame(
        [
            (k, [{"kind": "text", "text": t, "media_ref": None, "offset": 0}])
            for k, t in TEXTS.items()
        ],
        schema=DOCUMENTS_SCHEMA,
    )


def test_custom_embed_fn_flows_through_ingest_and_query(spark, tmp_path):
    eng = SragEngine(
        spark, str(tmp_path / "kb"), n_buckets=4,
        embed_fn=toy_embed, rerank_fn=toy_rerank,
    )
    eng.ingest(_docs(spark))

    # the stored vectors are the CUSTOM embedder's output, not the stub's
    rows = {r["doc_id"]: r for r in eng.embeddings().collect()}
    assert set(rows) == set(TEXTS)
    for k, t in TEXTS.items():
        got = np.array(rows[k]["vector"], dtype=np.float32)
        exp = toy_embed([t])[0]
        np.testing.assert_allclose(got, exp, rtol=1e-6)
        assert not np.allclose(got, hash_embed(t), atol=1e-3)

    # the query embeds through the SAME function (one vector space) and
    # the reranker is the custom one: top hit is the best token overlap
    hits = eng.query("spark shuffle partitions joins", limit=3).collect()
    assert hits and hits[0]["doc_id"] == "c"
    assert all(0.3 <= r["score"] <= 1.0 for r in hits)


def test_embed_query_matches_chunk_udf_space(spark):
    """Driver-side query embedding == executor-side chunk embedding for
    the same text and the same embed_fn (vectors in one space)."""
    df = spark.createDataFrame([("x", "hello world one two")], "id string, text string")
    udf_vec = df.select(make_embed_udf(toy_embed)(F.col("text")).alias("v")).head()["v"]
    drv_vec = embed_query("hello world one two", toy_embed)
    np.testing.assert_allclose(
        np.array(udf_vec, dtype=np.float32), drv_vec, rtol=1e-6
    )
    # and the default path is still the stub
    np.testing.assert_allclose(
        embed_query("hello world one two"), hash_embed("hello world one two")
    )


def test_rerank_fn_failure_falls_back_to_fusion(spark, tmp_path):
    """An injected reranker that raises hits the same fusion fallback as
    the stub path (QueryService rerankWithFallback recover semantics)."""

    def broken_rerank(query, texts):
        raise RuntimeError("model server down")

    eng = SragEngine(
        spark, str(tmp_path / "kb"), n_buckets=4,
        embed_fn=toy_embed, rerank_fn=broken_rerank,
    )
    eng.ingest(_docs(spark))
    hits = eng.query("spark shuffle partitions joins", limit=3).collect()
    # fusion fallback still returns candidates (scores are RRF fusion scores)
    assert hits
    assert all(r["score"] < 0.3 for r in hits)  # rrf scores ≪ rerank range
