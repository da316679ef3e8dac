"""Distributed main-content extraction (the north-rule core).

The per-document kernel is the frozen golden parser
(``srag_spark.golden.extract_document`` — P1 text word spans, P11 HTML
block scoring, P12 PDF reading order, P2 audio segmentation, media-anchor
pass-through).  This module supplies the *distributed machinery* around
it, which is what must be engineered explicitly for 100 TB (SURVEY.md
§4.2):

* **doc_id-hash repartitioning** before the parse stage so work spreads
  evenly across executors;
* **salting for skewed mega-documents**: docs whose span count exceeds
  ``salt_threshold`` are split into contiguous span slices at audio-run-
  safe boundaries, the slices are hash-distributed ``(doc_id, slice_id)``
  and parsed independently, then reassembled in slice order with
  renumbered global ``seq`` — order-stable by construction (AQE skew-join
  handling cannot help here because the skew lives inside the UDF stage,
  not a join);
* per-doc extraction metrics (blocks kept/dropped, parse failures)
  carried alongside the spans for the lineage/metrics table.

Everything crosses the JVM↔Python boundary as Arrow batches
(``mapInPandas`` / ``applyInPandas``); there is no row-at-a-time Python
UDF and no driver-side collect in this path.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from srag_spark.golden import extract_document
from srag_spark.schema import (
    EXTRACTED_FLAT_SCHEMA,
    EXTRACTED_SCHEMA,
    SPAN_TYPE,
)

DEFAULT_SALT_THRESHOLD = 512   # spans; docs above this get sliced
DEFAULT_SLICE_TARGET = 256     # spans per salted slice

_SLICE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("slice_id", IntegerType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

_PARSED_SLICE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("slice_id", IntegerType(), False),
        StructField("spans", EXTRACTED_SCHEMA["spans"].dataType, False),
        StructField("blocks_kept", LongType(), False),
        StructField("blocks_dropped", LongType(), False),
        StructField("parse_failures", LongType(), False),
    ]
)


def slice_spans(spans: list[dict], target: int) -> list[list[dict]]:
    """Split an ordered span list into contiguous slices of ~``target``
    spans, never splitting inside a contiguous audio run (a run sliced in
    two would segment differently than the golden whole-doc parse).

    Assumes ``spans`` is already in document order.
    """
    n = len(spans)
    if n <= target:
        return [spans]
    slices: list[list[dict]] = []
    start = 0
    while start < n:
        end = min(start + target, n)
        # push the boundary right while it would split an audio run
        while (
            0 < end < n
            and spans[end - 1].get("kind") == "audio"
            and spans[end].get("kind") == "audio"
        ):
            end += 1
        slices.append(spans[start:end])
        start = end
    return slices


def _sort_doc_spans(spans: list[dict]) -> list[dict]:
    """Document order: (offset, original array position) — the stable
    order the golden parser uses (golden.extract_document)."""
    return [
        s
        for _, s in sorted(
            enumerate(spans),
            key=lambda p: (
                p[1].get("offset") if p[1].get("offset") is not None else p[0],
                p[0],
            ),
        )
    ]


def _extract_rows(doc_id: str, spans: list[dict]) -> dict:
    out, kept, dropped, failures = extract_document(spans)
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "seq": i}
            for i, (k, t, m) in enumerate(out)
        ],
        "blocks_kept": kept,
        "blocks_dropped": dropped,
        "parse_failures": failures,
    }


def _parse_whole(batches: Iterator) -> Iterator:
    import pandas as pd  # noqa: PLC0415

    for pdf in batches:
        rows = [
            _extract_rows(doc_id, list(spans) if spans is not None else [])
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"])
        ]
        yield pd.DataFrame(
            rows, columns=["doc_id", "spans", "blocks_kept", "blocks_dropped", "parse_failures"]
        )


def _make_slicer(target: int):
    def _slice(batches: Iterator) -> Iterator:
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            out = {"doc_id": [], "slice_id": [], "spans": []}
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                ordered = _sort_doc_spans(list(spans) if spans is not None else [])
                for i, sl in enumerate(slice_spans(ordered, target)):
                    out["doc_id"].append(doc_id)
                    out["slice_id"].append(i)
                    out["spans"].append(sl)
            yield pd.DataFrame(out)

    return _slice


def _parse_slice(batches: Iterator) -> Iterator:
    import pandas as pd  # noqa: PLC0415

    for pdf in batches:
        rows = []
        for doc_id, slice_id, spans in zip(pdf["doc_id"], pdf["slice_id"], pdf["spans"]):
            r = _extract_rows(doc_id, list(spans) if spans is not None else [])
            r["slice_id"] = int(slice_id)
            rows.append(r)
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "slice_id", "spans", "blocks_kept", "blocks_dropped", "parse_failures"],
        )


def _reassemble(key, pdf) -> "pd.DataFrame":  # noqa: F821
    import pandas as pd  # noqa: PLC0415

    pdf = pdf.sort_values("slice_id")
    spans: list[dict] = []
    for sl in pdf["spans"]:
        for s in sl:
            spans.append(
                {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "seq": len(spans)}
            )
    return pd.DataFrame(
        [
            {
                "doc_id": key[0],
                "spans": spans,
                "blocks_kept": int(pdf["blocks_kept"].sum()),
                "blocks_dropped": int(pdf["blocks_dropped"].sum()),
                "parse_failures": int(pdf["parse_failures"].sum()),
            }
        ]
    )


def extract_documents(
    docs: DataFrame,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    slice_target: int = DEFAULT_SLICE_TARGET,
    num_partitions: int | None = None,
) -> DataFrame:
    """Full extraction over an interleaved-docs table → EXTRACTED_SCHEMA.

    Two physical paths chosen by per-doc span count (a cheap native
    ``size()`` — no Python involved in routing):

    * normal docs: ``repartition(hash(doc_id))`` → ``mapInPandas`` parse;
    * mega docs: slice → ``repartition(doc_id, slice_id)`` →
      ``mapInPandas`` parse per slice → ``groupBy(doc_id).applyInPandas``
      reassembly (slice-order concat, seq renumber, metric sums).

    The salted path touches only the skewed tail, so at 100 TB the extra
    shuffle moves a tiny fraction of rows while removing the straggler
    tasks that would otherwise dominate the stage.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    n = F.size("spans")
    small = (
        docs.filter(n <= salt_threshold)
        .select("doc_id", "spans")
        .repartition(num_partitions, "doc_id")
        .mapInPandas(_parse_whole, schema=EXTRACTED_SCHEMA)
    )
    big = (
        docs.filter(n > salt_threshold)
        .select("doc_id", "spans")
        .mapInPandas(_make_slicer(slice_target), schema=_SLICE_SCHEMA)
        .repartition(num_partitions, "doc_id", "slice_id")
        .mapInPandas(_parse_slice, schema=_PARSED_SLICE_SCHEMA)
        .groupBy("doc_id")
        .applyInPandas(_reassemble, schema=EXTRACTED_SCHEMA)
    )
    return small.unionByName(big)


def explode_extracted(extracted: DataFrame) -> DataFrame:
    """Nested extracted docs → flat span rows (EXTRACTED_FLAT_SCHEMA).

    Pure native: explode + field projection, no Python.
    """
    return (
        extracted.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.seq").alias("seq"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Per-doc extraction metrics view (native projection)."""
    return extracted.select(
        "doc_id",
        F.size("spans").alias("spans_out"),
        "blocks_kept",
        "blocks_dropped",
        "parse_failures",
    )


__all__ = [
    "extract_documents",
    "explode_extracted",
    "extraction_metrics",
    "slice_spans",
    "EXTRACTED_FLAT_SCHEMA",
]
