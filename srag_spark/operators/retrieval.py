"""Retrieval operators Q1–Q11 (SURVEY.md §2.4), Spark-native.

The reference delegates vector search to Qdrant, lexical search to
OpenSearch BM25, and fuses in memory (QueryService.scala:95-266).  Here
every stage is an in-engine DataFrame plan:

* Q2 exact cosine top-k — native ``zip_with``/``aggregate`` dot product
  (unit-norm vectors ⇒ cosine), no UDF;
* Q3 BM25 — two-pass aggregation (corpus stats, then scoring) with
  broadcast of the tiny per-term idf relation;
* Q4 RRF fusion — two ``row_number`` ranks + one full-outer join
  (QueryService.scala:137-167, k=60, pool=200);
* Q5 candidate-text resolution — left joins + ``coalesce``
  (QueryService.scala:169-199);
* Q6/Q7 rerank gate + filtering (QueryService.scala:210-266) — scoring is
  a pandas UDF (the cross-encoder port), gates are native window/agg math;
* Q9 listing filter/sort (MainHandlers.scala:62-90), Q10 top-k, Q11
  distinct — trivially native.

Determinism: the reference relies on Scala's stable sort for ties; Spark
ordering is non-deterministic under ties, so every rank/top-k here adds
the secondary key ``(doc_id, segment_index)`` (SURVEY.md §4.2.3).

Scale notes: the score relations entering fusion are ≤ pool (200) rows —
they broadcast.  BM25's idf relation has one row per *query term*, also
broadcast.  The only big shuffles are the two groupBys over the exploded
token table, both with map-side partial aggregation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from srag_spark.functions.embedding import embed_query, make_rerank_udf

FUSION_POOL_SIZE = 200   # QueryService.scala:65
RERANKER_POOL_SIZE = 200
RRF_K = 60               # QueryService.scala:68
MIN_CANDIDATES_FOR_RERANK = 5
RERANK_TOP_K_RATIO = 0.2
MIN_ACCEPTABLE_GAP = 0.5
MIN_ABSOLUTE_SCORE = 0.3

_KEY = ("doc_id", "segment_index")


# ---------------------------------------------------------------------------
# metadata filter (VectorStoreFilter: conjunctive equality,
# QdrantAdapter.scala:173-181 / OpenSearchAdapter.scala:216-224)
# ---------------------------------------------------------------------------
def apply_metadata_filter(df: DataFrame, flt: dict[str, str] | None) -> DataFrame:
    if not flt:
        return df
    for k, v in flt.items():
        df = df.filter(F.col("metadata").getItem(k) == F.lit(v))
    return df


# ---------------------------------------------------------------------------
# Q2 — exact cosine top-k (replaces the ANN server with an exact scan)
# ---------------------------------------------------------------------------
def cosine_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = FUSION_POOL_SIZE,
    flt: dict[str, str] | None = None,
) -> DataFrame:
    """(doc_id, segment_index, vector[, metadata]) → top-k by cosine.

    Dot product entirely JVM-side: ``aggregate(zip_with(v, q, *), +)``
    (the higher-order fold is the FASTER JVM form — a 64-term unrolled
    sum exceeds the JVM's huge-method JIT limit and runs interpreted,
    measured 6-10× slower; see ``dedup.dot_lit_sql``).  The query
    vector is a literal array — effectively broadcast.  Top-k is a
    global sort-limit (Spark performs it as per-partition top-k +
    driver merge — no full shuffle).
    """
    from srag_spark.operators.dedup import lit_vec

    q = lit_vec(query_vec)  # ONE py4j round trip, not 384 per-element lit()s
    scored = apply_metadata_filter(embeddings, flt).select(
        "doc_id",
        "segment_index",
        F.aggregate(
            F.zip_with("vector", q, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), *_KEY).limit(k)


# ---------------------------------------------------------------------------
# Q3 — BM25 lexical top-k, in-engine
# ---------------------------------------------------------------------------
LEX_TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize_lex(text: str) -> list[str]:
    """Frozen lexical analyzer (≈ OpenSearch standard analyzer):
    lowercase, split on non-alphanumeric runs, drop empties.
    Python twin of the native column expression in :func:`_tokens_col`."""
    return [t for t in re.split(LEX_TOKEN_SPLIT, (text or "").lower()) if t]


def _tokens_col(col) -> "F.Column":
    return F.array_remove(F.split(F.lower(col), LEX_TOKEN_SPLIT), "")


def bm25_topk(
    chunks: DataFrame,
    query_text: str,
    k: int = FUSION_POOL_SIZE,
    k1: float = 1.2,
    b: float = 0.75,
    flt: dict[str, str] | None = None,
) -> DataFrame:
    """BM25 (Lucene formulation) top-k over the chunks table.

    Two aggregation passes, both with map-side combine:
      1. corpus stats: N, avgdl (single tiny row → broadcast);
      2. per-(chunk, term) tf over the exploded token table, restricted to
         the query's terms *before* the shuffle (predicate pushed below
         the explode by Catalyst).
    idf uses the Lucene/OpenSearch form ln(1 + (N-df+0.5)/(df+0.5)).
    Empty query → all chunks at score 0.0 (zero_terms_query: all,
    OpenSearchAdapter.scala:205-235), deterministic order.

    Filtered-scoring semantics (frozen, = OpenSearch): a metadata filter
    restricts the RESULT set but never the SCORING statistics.  N, avgdl
    and per-term df are computed over the WHOLE corpus — OpenSearch
    scores the ``match`` clause with index-wide stats and puts the
    metadata terms in non-scoring filter context
    (OpenSearchAdapter.scala:205-235 bool.must(match)+bool.filter), so a
    chunk's score is identical with or without a filter.  The plan pays
    one exploded-token pass over the full corpus either way (that IS the
    index-wide df); the filter drops non-matching chunks from the tf
    relation via a co-keyed semi-join before scoring, so the sort-limit
    still sees only candidate rows.  Pinned by the ``q3_bm25_filtered``
    oracle entry (VERDICT r4 #3).
    """
    terms = sorted(set(tokenize_lex(query_text)))
    if not terms:
        base = apply_metadata_filter(chunks, flt).select(*_KEY, "text")
        return (
            base.select(*_KEY, "text", F.lit(0.0).alias("score"))
            .orderBy(*_KEY)
            .limit(k)
        )

    # r6 evaluation rewrite (guide §2.3/§2.4 — shuffle fewer bytes,
    # remove shuffles outright): the old shape exploded EVERY token of
    # every doc and hash-aggregated the survivors into per-(chunk, term)
    # tf — a corpus-tokens-sized explode feeding a shuffle.  But the
    # query's term set is tiny and known, so one alternation regex pass
    # per doc extracts ONLY matching occurrences (``hits`` arrays are
    # as short as the match count), and tf comes from counting inside
    # the row — the explode below is over the ≤|terms| distinct matched
    # terms per doc, and NO groupBy shuffle exists at all.  ``dl`` is a
    # token-run count (regexp_count of the token alphabet), value-equal
    # to size(split(...)).  The lookarounds pin each alternative to a
    # maximal [a-z0-9] run, so a hit ≡ a token equal to the term —
    # tf/df/dl are value-identical to the exploded form (pinned by the
    # q3 oracle entries; terms are alnum-only, so the alternation is
    # injection-safe).  An earlier spread_input here was net-negative
    # (shuffling full text costs more than the pass it parallelizes);
    # with the explode gone the scan-shaped pass is cheaper still.
    alt = "|".join(terms)
    hit_pat = f"(?<![a-z0-9])({alt})(?![a-z0-9])"
    # the LIGHT relation (keys + dl + matched occurrences, no text) is
    # persisted: stats and tf both consume it, which would otherwise be
    # two full scans + two evaluations of the regex pass.  The text
    # column deliberately stays OUT of the cached relation (guide §2.3:
    # decide on lightweight proxies, move payloads once) — the final
    # fetch joins the ≤k winners back against a plain text scan.
    from srag_spark.operators.dedup import _persist

    docs = _persist(
        chunks.select(
            *_KEY,
            F.expr(
                "CAST(regexp_count(lower(text), '[a-z0-9]+') AS INT)"
            ).alias("dl"),
            F.expr(
                f"regexp_extract_all(lower(text), '{hit_pat}', 1)"
            ).alias("_hits"),
        ),
        None,
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    def _count_of(t_: str):
        # single-parameter closure: a default-arg form (lambda h, t=t_)
        # would be bound by pyspark as the BINARY (element, index)
        # lambda and silently compare against the index column
        return lambda h: h == F.lit(t_)

    tf_full = (
        docs.select(
            *_KEY,
            "dl",
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t_).alias("term"),
                                F.size(
                                    F.filter(F.col("_hits"), _count_of(t_))
                                ).cast("double").alias("tf"),
                            )
                            for t_ in terms
                        ]
                    ),
                    lambda s: s["tf"] > 0,
                )
            ).alias("_tc"),
        )
        .select(*_KEY, "dl", F.col("_tc.term").alias("term"), F.col("_tc.tf").alias("tf"))
    )
    # index-wide df — from the UNfiltered tf relation
    df_t = tf_full.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    if flt:
        cand_keys = apply_metadata_filter(chunks, flt).select(*_KEY)
        tf = tf_full.join(cand_keys, list(_KEY), "left_semi")
    else:
        tf = tf_full
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )

    scored = (
        tf.join(F.broadcast(idf), "term")
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(*_KEY)
        .agg(F.sum("term_score").alias("score"))
    )
    # top-k FIRST, then broadcast the ≤k winners back to fetch text: the
    # score relation alone enters the sort-limit (per-partition top-k +
    # driver merge), and the text join moves only k rows' keys instead of
    # shuffling every chunk containing any query term (VERDICT r3 #5 —
    # on a 100 TB chunks table with a common term that join was the
    # dominant data motion)
    topk = scored.orderBy(F.desc("score"), *_KEY).limit(k)
    return (
        chunks.select(*_KEY, "text")
        .join(F.broadcast(topk), list(_KEY))
        .select(*_KEY, "text", "score")
        .orderBy(F.desc("score"), *_KEY)
    )


# ---------------------------------------------------------------------------
# Q4 — RRF rank fusion (QueryService.scala:137-167)
# ---------------------------------------------------------------------------
def rrf_fuse(
    semantic: DataFrame,
    lexical: DataFrame,
    rrf_k: int = RRF_K,
    pool: int = FUSION_POOL_SIZE,
    key_cols: tuple[str, ...] = _KEY,
) -> DataFrame:
    """Fuse two (key..., score) relations by reciprocal rank:
    rank = position+1 by score desc; fused = Σ 1/(rrf_k + rank);
    keep > 0; sort desc; take pool.

    The ≤pool invariant is ENFORCED here (both inputs are sort-limited to
    ``pool`` before ranking), so the global rank window is always bounded
    — a caller passing an unlimited frame cannot trigger a single-task
    sort of the world.  Note: Catalyst constant-folds the ``lit(0)``
    partition key OUT of the executed window spec, so WindowExec still
    logs its "No Partition Defined" warning — that warning is BENIGN here
    (the input is already limited to ≤pool rows; one partition is the
    point), and the ``.limit(pool)`` calls below are what actually bound
    it.  The full-outer join broadcasts."""
    semantic = semantic.orderBy(F.desc("score"), *key_cols).limit(pool)
    lexical = lexical.orderBy(F.desc("score"), *key_cols).limit(pool)
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), *key_cols)
    sem = semantic.select(*key_cols, F.row_number().over(w).alias("sem_rank"))
    lex = lexical.select(*key_cols, F.row_number().over(w).alias("lex_rank"))
    fused = (
        sem.join(lex, list(key_cols), "full_outer")
        .select(
            *key_cols,
            (
                F.coalesce(1.0 / (F.lit(rrf_k) + F.col("sem_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            ).alias("fused_score"),
        )
        .filter(F.col("fused_score") > 0.0)
    )
    return fused.orderBy(F.desc("fused_score"), *key_cols).limit(pool)


# ---------------------------------------------------------------------------
# Q5 — candidate text resolution (QueryService.scala:169-199)
# ---------------------------------------------------------------------------
def resolve_candidate_texts(
    fused: DataFrame, lexical: DataFrame, chunks: DataFrame
) -> DataFrame:
    """text = lexical hit text if non-empty else chunk-table text; rows
    with no resolvable text are dropped.  fused/lexical are tiny
    (≤ pool) → broadcast to the chunks join."""
    lex_text = lexical.select(*_KEY, F.col("text").alias("lex_text"))
    chunk_text = chunks.select(*_KEY, F.col("text").alias("chunk_text"))
    return (
        fused.join(F.broadcast(lex_text), list(_KEY), "left")
        .join(chunk_text, list(_KEY), "left")
        .select(
            *_KEY,
            "fused_score",
            F.coalesce(
                F.when(F.length("lex_text") > 0, F.col("lex_text")),
                F.col("chunk_text"),
            ).alias("text"),
        )
        .filter(F.col("text").isNotNull())
    )


# ---------------------------------------------------------------------------
# Q7 — rerank result filtering (QueryService.scala:238-266)
# ---------------------------------------------------------------------------
def filter_reranked(scored: DataFrame, limit: int) -> DataFrame:
    """Gates: reject ALL if top < 0.3 or (top−worst) < 0.5; else keep
    score ≥ top − 0.2·(top−worst), sorted desc, take limit.  The
    max/min stats are one broadcast row."""
    stats = scored.agg(F.max("score").alias("top"), F.min("score").alias("worst"))
    return (
        scored.crossJoin(F.broadcast(stats))
        .filter(
            (F.col("top") >= MIN_ABSOLUTE_SCORE)
            & ((F.col("top") - F.col("worst")) >= MIN_ACCEPTABLE_GAP)
            & (
                F.col("score")
                >= F.col("top") - RERANK_TOP_K_RATIO * (F.col("top") - F.col("worst"))
            )
        )
        .select(*_KEY, "text", "score")
        .orderBy(F.desc("score"), *_KEY)
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# Q1 — hybrid retrieval orchestrator (QueryService.retrieveContext)
# ---------------------------------------------------------------------------
def retrieve_context(
    chunks: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    limit: int = 5,
    flt: dict[str, str] | None = None,
    query_vec=None,
    rerank_col=None,
    embed_fn=None,
    rerank_fn=None,
) -> DataFrame:
    """embed query → vector top-200 ∥ BM25 top-200 → RRF → resolve text →
    rerank gate (≥5 candidates) → gated filter.

    Returns (doc_id, segment_index, text, score).  The candidate count
    gate is a driver-side branch, as in the reference (Q6).

    Fallback semantics (QueryService.scala:95-133): fusion-score results
    are returned when there are <5 candidates OR when the reranker FAILS
    (rerankWithFallback's recover path).  When the reranker succeeds and
    the gates reject everything (filterRerankedResults → List.empty on
    topScore < 0.3, gap < 0.5, or an empty post-threshold set), the
    result is EMPTY — low-confidence queries are suppressed, not padded
    with fusion scores.

    ``query_vec`` overrides the query embedding (default: the engine's
    embed function applied to the query text); ``rerank_col`` overrides
    the reranker with a Column scoring expression over the candidate
    rows (doc_id, segment_index, text) — a deterministic rerank_col
    makes the whole path oracle-checkable cross-engine.

    ``embed_fn`` / ``rerank_fn`` inject REAL models (batch-callable
    contract in functions.embedding): the query is embedded through the
    same ``embed_fn`` that produced the chunk vectors, and the rerank
    stage batches candidate texts through ``rerank_fn``.  Defaults are
    the deterministic stubs, so injection changes no oracle entry.
    """
    qvec = query_vec if query_vec is not None else embed_query(query_text, embed_fn)
    semantic = cosine_topk(embeddings, qvec, FUSION_POOL_SIZE, flt)
    lexical = bm25_topk(chunks, query_text, FUSION_POOL_SIZE, flt=flt)
    fused = rrf_fuse(semantic, lexical)
    candidates = resolve_candidate_texts(fused, lexical, chunks).cache()
    try:
        n = candidates.count()
        # every returned frame is MATERIALIZED (eager localCheckpoint of
        # ≤limit rows) before candidates is unpersisted below — otherwise
        # the caller's first action would re-execute the whole plan
        # uncached, and a reranker failure at consumption time would
        # escape the fusion fallback (ADVICE r2)
        fusion_results = (
            candidates.select(*_KEY, "text", F.col("fused_score").alias("score"))
            .orderBy(F.desc("score"), *_KEY)
            .limit(limit)
        )
        if n < MIN_CANDIDATES_FOR_RERANK:
            return fusion_results.localCheckpoint(eager=True)
        try:
            score = (
                rerank_col
                if rerank_col is not None
                else make_rerank_udf(query_text, rerank_fn)(F.col("text"))
            )
            scored = candidates.select(*_KEY, "text", score.alias("score"))
            # eager checkpoint forces the rerank UDF NOW, inside the try —
            # the fallback decision is made on materialized results
            return filter_reranked(scored, limit).localCheckpoint(eager=True)
        except Exception:  # noqa: BLE001 — reranker failure → fusion fallback
            return fusion_results.localCheckpoint(eager=True)
    finally:
        candidates.unpersist(blocking=False)


# ---------------------------------------------------------------------------
# Q9 — transcript listing filter + sort (MainHandlers.scala:62-90)
# ---------------------------------------------------------------------------
def listing(
    transcripts: DataFrame,
    flt: dict[str, str] | None = None,
    sort_by: str = "created_at",
    metadata_key: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    df = apply_metadata_filter(transcripts, flt)
    key = (
        F.col("metadata").getItem(metadata_key)
        if metadata_key is not None
        else F.col(sort_by)
    )
    key = key.asc() if ascending else key.desc()
    return df.orderBy(key, F.col("doc_id").asc())


# Q10 top-k and Q11 distinct are one-liners at call sites:
#   df.orderBy(...).limit(k)        df.select("doc_id").distinct()
def distinct_doc_ids(df: DataFrame) -> DataFrame:
    return df.select("doc_id").distinct()
