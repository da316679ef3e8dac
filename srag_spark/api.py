"""SragEngine — the engine's façade: the reference's service surface as
one object over manifest-committed tables.

The reference exposes its capabilities as HTTP endpoints
(MainHandlers.scala: POST /api/v1/ingest/{audio|text}, POST
/api/v1/query, GET /api/v1/transcripts[/id], DELETE /api/v1/transcripts/
id) backed by Postgres + Qdrant + OpenSearch.  A user switching to this
engine gets the same verbs on one class, backed by four
manifest-committed tables under a single root:

    root/transcripts   (doc_id)                    — S4/S5/S6/Q9
    root/chunks        (doc_id, segment_index)     — S9 lexical corpus
    root/embeddings    (doc_id, segment_index)     — S7/S8 vector corpus
    root/metrics       (doc_id)                    — extraction lineage
                       (spans_out, blocks kept/dropped, parse failures)

``ingest`` is the whole worker pipeline (extract → transcript build →
chunk → embed → upsert, IngestionWorker.scala:70-95 +
IndexingPipeline.scala:56-115) as ONE call: re-ingesting a document
replaces it everywhere (entity delete before keyed upsert, so a shrunk
doc leaves no stale chunks — the reference's delete-then-index,
OpenSearchAdapter.scala:147-181); replaying converges (J7).  ``query``
is QueryService.retrieveContext (vector ∥ BM25 → RRF → rerank gates).

Every write commits through the snapshot-atomic manifest protocol
(sources/tables): each table is individually consistent at all times (a
crash between a table's commits leaves it on a committed snapshot), and
CROSS-table consistency is eventual — a crash between the entity
deletes and the upserts leaves the batch's chunk/embedding rows absent
until the ingest is replayed, which converges (J7).  This matches the
reference, whose delete-then-index against OpenSearch/Qdrant has the
same replay-to-converge window (IndexingPipeline.scala:93-103).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from srag_spark.operators.parse import extract_documents
from srag_spark.operators.retrieval import listing, retrieve_context
from srag_spark.operators.transcripts import (
    build_transcripts,
    enrich_metadata,
    validate_language,
)
from srag_spark.plans.indexing import build_chunks, build_embeddings
from srag_spark.schema import TRANSCRIPTS_SCHEMA
from srag_spark.sources.tables import (
    delete_by_key,
    read_table,
    table_exists,
    upsert_by_key,
)

_CHUNK_KEY = ["doc_id", "segment_index"]


class SragEngine:
    """One engine instance per table root; safe to re-instantiate over
    existing tables (all state lives in the manifests)."""

    def __init__(
        self, spark: SparkSession, root: str, n_buckets: int = 64
    ) -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.n_buckets = n_buckets
        self.transcripts_path = f"{self.root}/transcripts"
        self.chunks_path = f"{self.root}/chunks"
        self.embeddings_path = f"{self.root}/embeddings"
        self.metrics_path = f"{self.root}/metrics"

    # -- ingest (POST /api/v1/ingest/* + the async worker pipeline) --------
    def _doc_meta(self, docs: DataFrame, extra: dict[str, str] | None):
        """(doc_id, metadata) with per-doc input metadata (optional
        ``metadata`` column on ``docs``) right-merged with the batch-level
        ``extra`` dict — the reference's job-metadata merge
        (Transcript.scala:17-21 ``transcript.metadata ++ job.metadata``).
        None when the batch carries no metadata at all."""
        has_col = "metadata" in docs.columns
        if not has_col and not extra:
            return None
        meta = (
            F.col("metadata")
            if has_col
            else F.create_map().cast("map<string,string>")
        )
        base = docs.select("doc_id", meta.alias("metadata"))
        return enrich_metadata(base, extra) if extra else base

    def ingest(
        self,
        docs: DataFrame,
        metadata: dict[str, str] | None = None,
        doc_counter=None,
    ) -> dict:
        """Extract, build transcripts, chunk, embed, and upsert — the full
        ingestion worker for a batch of interleaved documents
        (DOCUMENTS_SCHEMA).  Returns row counts per table.

        ``docs`` may carry two OPTIONAL columns beyond the input_hint
        shape: ``metadata map<string,string>`` (per-doc) and ``language
        string`` — the reference's ingest request fields
        (MainEndpoints.scala text/audio requests carry language +
        metadata; IngestionWorker merges job metadata into the
        transcript, Transcript.scala:17-21).  ``metadata`` (the kwarg) is
        batch-level extra metadata, right-merged over per-doc maps.  Both
        flow onto the transcript row AND every derived chunk/embedding
        row, so ``query(flt=...)`` / ``list_transcripts(flt=...)``
        filter engine-built tables exactly as the reference filters
        OpenSearch/Qdrant on ``metadata.*``
        (OpenSearchAdapter.scala:216-224, QdrantAdapter.scala:173-181).

        ``doc_counter`` (a Spark accumulator) counts documents entering
        the parse kernel — the 'docs parsed' lineage metric, and the
        proof that the persisted extraction executes ONCE per ingest.

        Returned counts are BATCH-level: documents/chunks/embeddings
        rows written by THIS call (no full-table re-scan; embeddings is
        row-for-row the chunk count — build_embeddings is a per-row
        projection).
        """
        from pyspark import StorageLevel

        # the input batch feeds several subplans (both extraction
        # branches, the metadata/language joins, audio timing, the
        # doc-id deletes) — persist it so an expensive source (a JSONL
        # parse, a remote scan) is read once per ingest
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
        extracted = extract_documents(
            docs.select("doc_id", "spans"), doc_counter=doc_counter
        )
        # the Python parse kernel is the most expensive stage and its
        # output feeds transcripts AND chunks AND embeddings — persist it
        # for the duration of the call so it executes exactly once
        # (upsert_by_key persists each table's own incoming plan for its
        # three actions; this covers the stage they all share)
        extracted = extracted.persist(StorageLevel.MEMORY_AND_DISK)
        doc_meta = self._doc_meta(docs, metadata)
        transcripts = build_transcripts(extracted, source_docs=docs)
        if doc_meta is not None:
            transcripts = (
                transcripts.drop("metadata")
                .join(doc_meta, "doc_id", "left")
                .withColumn(
                    "metadata",
                    F.coalesce(
                        "metadata", F.create_map().cast("map<string,string>")
                    ),
                )
            )
        if "language" in docs.columns:
            transcripts = (
                transcripts.drop("language")
                .join(docs.select("doc_id", "language"), "doc_id", "left")
            )
        transcripts = validate_language(transcripts).select(
            *[f.name for f in TRANSCRIPTS_SCHEMA.fields]
        )
        chunks = build_chunks(extracted, doc_meta=doc_meta)
        # chunks feed their own upsert, the embeddings build, and the
        # returned count — persist so the chunk UDF runs once
        chunks = chunks.persist(StorageLevel.MEMORY_AND_DISK)
        embeddings = build_embeddings(chunks)

        try:
            doc_ids = docs.select("doc_id").distinct()
            # replace-entity: a re-ingested doc drops ALL its previous rows
            # first (delete-then-index), so shrunk docs leave nothing stale
            for path in (self.chunks_path, self.embeddings_path):
                if table_exists(self.spark, path):
                    delete_by_key(self.spark, path, doc_ids, ["doc_id"])
            upsert_by_key(
                self.spark, self.transcripts_path, transcripts, ["doc_id"],
                n_buckets=self.n_buckets,
            )
            upsert_by_key(
                self.spark, self.chunks_path, chunks, _CHUNK_KEY,
                n_buckets=self.n_buckets,
            )
            upsert_by_key(
                self.spark, self.embeddings_path, embeddings, _CHUNK_KEY,
                n_buckets=self.n_buckets,
            )
            # per-doc extraction lineage metrics (north rule; the batch
            # pipeline records the same per bucket, plans/pipeline.py) —
            # a thin projection of the already-persisted extraction
            upsert_by_key(
                self.spark,
                self.metrics_path,
                extracted.select(
                    "doc_id",
                    F.size("spans").alias("spans_out"),
                    "blocks_kept",
                    "blocks_dropped",
                    "parse_failures",
                    F.current_timestamp().alias("ingested_at"),
                ),
                ["doc_id"],
                n_buckets=self.n_buckets,
                persist_incoming=False,  # cheap projection of a cached frame
            )
            n_chunks = chunks.count()
            return {
                "documents": doc_ids.count(),
                "chunks": n_chunks,
                "embeddings": n_chunks,
            }
        finally:
            chunks.unpersist(blocking=False)
            docs.unpersist(blocking=False)
            extracted.unpersist(blocking=False)

    # -- table accessors ---------------------------------------------------
    def transcripts(self) -> DataFrame:
        return read_table(self.spark, self.transcripts_path)

    def chunks(self) -> DataFrame:
        return read_table(self.spark, self.chunks_path)

    def embeddings(self) -> DataFrame:
        return read_table(self.spark, self.embeddings_path)

    def metrics(self) -> DataFrame:
        """Per-doc extraction lineage metrics (spans_out, blocks kept/
        dropped, parse failures, ingest time) — one row per doc, updated
        on re-ingest."""
        return read_table(self.spark, self.metrics_path)

    # -- query (POST /api/v1/query) ----------------------------------------
    def query(
        self,
        text: str,
        limit: int = 5,
        flt: dict[str, str] | None = None,
        rerank_col=None,
    ) -> DataFrame:
        """Hybrid retrieval (Q1): vector top-200 ∥ BM25 top-200 → RRF →
        rerank gates.  Returns (doc_id, segment_index, text, score)."""
        return retrieve_context(
            self.chunks(), self.embeddings(), text, limit=limit, flt=flt,
            rerank_col=rerank_col,
        )

    # -- transcripts endpoints (GET/DELETE /api/v1/transcripts*) -----------
    def get_transcript(self, doc_id: str) -> DataFrame:
        """Point lookup (S6)."""
        return self.transcripts().filter(F.col("doc_id") == doc_id).limit(1)

    def list_transcripts(
        self,
        flt: dict[str, str] | None = None,
        sort_by: str = "created_at",
        metadata_key: str | None = None,
        ascending: bool = False,
        limit: int | None = None,
    ) -> DataFrame:
        """Filtered, sorted listing (Q9, MainHandlers.scala:62-90)."""
        out = listing(
            self.transcripts(), flt, sort_by, metadata_key, ascending
        )
        return out.limit(limit) if limit is not None else out

    def delete_transcript(self, doc_id: str) -> None:
        """Delete a document everywhere (S10): transcript row plus all its
        chunks and embeddings."""
        keys = self.spark.createDataFrame([(doc_id,)], "doc_id string")
        for path in (
            self.transcripts_path, self.chunks_path, self.embeddings_path,
            self.metrics_path,
        ):
            if table_exists(self.spark, path):
                delete_by_key(self.spark, path, keys, ["doc_id"])

    # -- maintenance -------------------------------------------------------
    def health(self) -> list:
        """J8/J9 parity (HealthCheckService.scala:62-75): aggregated
        health over the three table roots — every latest snapshot
        readable and complete, root writable.  Returns the check results;
        raises RuntimeError listing every failure."""
        from srag_spark.plans.preflight import health_check

        return health_check(
            self.spark,
            [self.transcripts_path, self.chunks_path, self.embeddings_path,
             self.metrics_path],
            self.root,
        )

    def vacuum(
        self, keep_manifests: int = 1, min_age_seconds: float = 3600.0
    ) -> int:
        """Reclaim data dirs unreferenced by recent snapshots across all
        three tables (run out-of-band; never needed for correctness).
        ``min_age_seconds`` is the orphan-retention guard protecting
        concurrent writers' unpublished commits (sources.tables.vacuum)."""
        from srag_spark.sources.tables import vacuum

        return sum(
            vacuum(
                self.spark, path, keep_manifests=keep_manifests,
                min_age_seconds=min_age_seconds,
            )
            for path in (
                self.transcripts_path, self.chunks_path, self.embeddings_path,
                self.metrics_path,
            )
            if table_exists(self.spark, path)
        )
