"""JSONL source/sink for the interleaved-documents table.

Training-data pipelines interchange corpora as JSON-lines (one document
object per line, usually gzip'd); this module reads/writes the
input_hint document shape to/from JSONL with a FIXED schema — no
inference, mirroring the engine's rigid-schema policy (schema.py): a
malformed line yields nulls in the mandatory columns and is surfaced by
``strict`` rather than silently reshaping the table.

Spark handles ``.gz``/``.zst`` extensions transparently on read and
``compression=`` on write; both paths are plain DataFrame I/O, so
predicate pushdown is absent (JSON has none) but column pruning and
split-parallel reads still apply — use parquet for anything hot, JSONL
for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

from srag_spark.schema import DOCUMENTS_SCHEMA

# the ingest-facing shape: input_hint columns + the optional per-doc
# attribute columns SragEngine.ingest understands
DOCUMENTS_JSONL_SCHEMA = StructType(
    list(DOCUMENTS_SCHEMA.fields)
    + [
        StructField("metadata", MapType(StringType(), StringType()), True),
        StructField("language", StringType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    with_attrs: bool = True,
    strict: bool = True,
) -> DataFrame:
    """Read a JSONL document corpus with the fixed schema.

    ``with_attrs=False`` prunes to the bare input_hint columns.
    ``strict=True`` fails the read on rows whose mandatory columns
    (doc_id, spans) came out null — a malformed or schema-drifted line;
    ``strict=False`` drops them silently (logged count is the caller's
    job via the returned frame's lineage)."""
    df = spark.read.schema(DOCUMENTS_JSONL_SCHEMA).json(path)
    bad = F.col("doc_id").isNull() | F.col("spans").isNull()
    if strict:
        df = df.withColumn(
            "doc_id",
            F.when(~bad, F.col("doc_id")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("malformed JSONL document row in "),
                        F.lit(path),
                        F.lit(" (null doc_id/spans)"),
                    )
                )
            ),
        )
    else:
        df = df.filter(~bad)
    if not with_attrs:
        df = df.select("doc_id", "spans")
    return df


def write_documents_jsonl(
    docs: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """Write a documents frame as JSONL (one object per line), keeping
    only the columns the JSONL schema defines."""
    cols = [f.name for f in DOCUMENTS_JSONL_SCHEMA.fields if f.name in docs.columns]
    w = docs.select(*cols).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
