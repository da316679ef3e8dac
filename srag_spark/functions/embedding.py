"""Deterministic embedding + scoring stubs.

The reference calls external model services for embeddings
(HuggingFaceAdapter.scala:29-60, all-MiniLM-L6-v2 → 384-dim cosine space,
VectorStoreInitializer.scala:79-81) and cross-encoder rerank scores
(TransformersRerankerAdapter.scala:37-82).  Those models aren't in this
container, so the engine ships deterministic stand-ins with the same
contract: text → unit-norm float32[384]; (query, text) → score in [0,1].
Both are pure functions of their inputs (sha256-seeded), so results are
reproducible across runs, partitionings, and cluster sizes — which is
what the correctness and resume tests require.  Swapping in a real model
is a one-function change (the pandas-UDF plumbing is identical; a real
model would batch through the same Arrow path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, FloatType

from srag_spark.schema import EMBEDDING_DIM


def _seed_for(text: str) -> int:
    return int.from_bytes(hashlib.sha256(text.encode("utf-8")).digest()[:8], "big")


def hash_embed(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Deterministic unit-norm float32 embedding of a string."""
    rng = np.random.Generator(np.random.PCG64(_seed_for(text or "")))
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    if n == 0.0:
        v[0] = 1.0
        n = 1.0
    return v / n


@pandas_udf(ArrayType(FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    """E1/E2 chunk- and query-embedding (Arrow-batched)."""
    return texts.map(lambda t: hash_embed(t if t is not None else ""))


def stable_unit_score(query: str, text: str) -> float:
    """Deterministic stand-in for a cross-encoder relevance score in [0,1]."""
    h = hashlib.md5(f"{query}\x1f{text}".encode("utf-8")).hexdigest()
    return int(h[:8], 16) / float(0xFFFFFFFF)


def make_rerank_udf(query: str):
    """Q6 rerank scorer for a fixed query — pandas UDF over candidate text."""

    @pandas_udf(DoubleType())
    def rerank_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: stable_unit_score(query, t if t is not None else ""))

    return rerank_udf
