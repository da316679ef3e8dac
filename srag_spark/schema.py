"""Fixed schemas (no inference anywhere — mirrors the reference's rigid
case-class + Flyway-DDL model, SURVEY.md §1.3).

Input table per BASELINE.json input_hint:
    doc_id:string,
    spans:array<struct<kind:string, text:string, media_ref:string, offset:int>>

Derived tables mirror the reference's domain records:
  - transcripts  ≙ srag-domain Transcript.scala:8-16
  - chunks       ≙ OpenSearch segment docs (OpenSearchAdapter.scala:107-127)
  - embeddings   ≙ Qdrant points (QdrantAdapter.scala:66-77, dim 384 cosine)
  - checkpoints  ≙ IngestionJob state machine (IngestionJob.scala:8-31)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# span kinds recognized by the parser router (P6)
KIND_TEXT = "text"
KIND_HTML = "html"
KIND_PDF = "pdf"
KIND_AUDIO = "audio"
KIND_MEDIA = "media"
ALL_KINDS = (KIND_TEXT, KIND_HTML, KIND_PDF, KIND_AUDIO, KIND_MEDIA)

EMBEDDING_DIM = 384  # VectorStoreInitializer.scala:79-81 (cosine space)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

# parser output: ordered extracted span sequence (the per-row invariant is
# (kind, text, media_ref, order) equality against the golden parser)
EXTRACTED_SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("seq", IntegerType(), True),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(EXTRACTED_SPAN_TYPE), False),
        StructField("blocks_kept", LongType(), False),
        StructField("blocks_dropped", LongType(), False),
        StructField("parse_failures", LongType(), False),
    ]
)

# exploded, one row per extracted span — what tests/oracles compare
EXTRACTED_FLAT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("seq", IntegerType(), False),
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
    ]
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("language", StringType(), True),
        StructField(
            "words",
            ArrayType(
                StructType(
                    [
                        StructField("text", StringType(), True),
                        StructField("start", LongType(), True),
                        StructField("end", LongType(), True),
                        StructField("confidence", DoubleType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("confidence", DoubleType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("source", StringType(), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

CHUNKS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("segment_index", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("segment_index", IntegerType(), False),
        StructField("vector", ArrayType(FloatType()), False),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)

# checkpoint/lineage table (FIXTURES.md §6; reference job state machine J1)
CHECKPOINTS_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("max_attempts", IntegerType(), False),
        StructField("error_message", StringType(), True),
        StructField("input_snapshot", StringType(), True),
        StructField("docs_processed", LongType(), False),
        StructField("blocks_kept", LongType(), False),
        StructField("blocks_dropped", LongType(), False),
        StructField("parse_failures", LongType(), False),
        StructField("started_at", TimestampType(), True),
        StructField("updated_at", TimestampType(), True),
        # earliest time a Failed bucket may be retried (J5 exponential
        # backoff: 2s · 2^(attempt−1), cap 60s — IngestionWorker.scala:
        # 362-368, application.conf jobs.initial/max-retry-delay/backoff);
        # NULL for Success/DeadLetter rows
        StructField("next_attempt_at", TimestampType(), True),
    ]
)

# JobStatus enum (IngestionJob.scala:8-15)
STATUS_PENDING = "Pending"
STATUS_SUCCESS = "Success"
STATUS_FAILED = "Failed"
STATUS_DEAD_LETTER = "DeadLetter"
