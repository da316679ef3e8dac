"""WET (WARC text-conversion) source — the CommonCrawl ingest format.

A web-scale extraction pipeline's raw input is the Common Crawl: WARC
archives (ISO 28500) and their ``.wet`` text-conversion siblings — files
of concatenated records, each a small header block (``WARC/1.0`` version
line + ``Name: value`` headers, CRLF-separated) followed by exactly
``Content-Length`` bytes of payload.  CCNet, C4 and RefinedWeb all start
here.  This module parses WET files into a DataFrame and bridges the
records into the engine's interleaved-documents shape (input_hint
schema) so the extraction pipeline / ``SragEngine.ingest`` can consume a
crawl directly.

Execution model (the one every public CC pipeline uses): WET files are
~100-150 MB and gzip'd per record, so they are NOT byte-splittable — the
unit of parallelism is the FILE.  ``spark.read.format("binaryFile")``
gives one row per file; an Arrow-batched ``mapInPandas`` parser walks
each file's bytes honoring Content-Length (never a line-split heuristic
— payloads may themselves contain ``WARC/1.0`` lines).  At 100 TB that
is ~1M files fanned out one-per-task, the exact shape of production
CC processing; skew is bounded by the crawl's own file sizing.  Parsing
is pure per-file Python over Arrow batches — no JVM round-trips per
record, no driver-side I/O.

No external WARC library: the record grammar implemented here is the
public ISO 28500 / WARC 1.1 framing (version line, header block, blank
line, Content-Length payload, two-CRLF record separator), which is also
what ``warcio`` implements.  Gzip transparency comes from Python's
stdlib (member-concatenated gzip per the WARC spec's record-per-member
convention decompresses in one stream).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

WET_RECORDS_SCHEMA = StructType(
    [
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("content_length", LongType(), True),
        StructField("record_offset", LongType(), True),
        StructField("text", StringType(), True),
        StructField("source_file", StringType(), True),
    ]
)

_CRLF = b"\r\n"


class WetFormatError(ValueError):
    """A WET file violated the record framing (strict mode)."""


def _parse_stream(data: bytes, name: str, strict: bool) -> Iterator[dict]:
    """Walk one decompressed WET byte stream record by record.

    Framing per ISO 28500: ``WARC/<ver>`` line, header lines to the
    first empty line, exactly Content-Length payload bytes, then the
    two-CRLF record boundary.  Tolerates bare-LF files (some mirrors
    re-line-end); payload slicing always trusts Content-Length."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines (any CR/LF run)
        while pos < n and data[pos] in (0x0A, 0x0D):
            pos += 1
        if pos >= n:
            return
        eol = data.find(b"\n", pos)
        if eol < 0:
            if strict:
                raise WetFormatError(f"{name}: truncated version line at byte {pos}")
            return
        version = data[pos:eol].rstrip(b"\r")
        if not version.startswith(b"WARC/"):
            if strict:
                raise WetFormatError(
                    f"{name}: expected WARC/ version line at byte {pos}, "
                    f"got {version[:40]!r}"
                )
            # lenient: resync to the next version line
            nxt = data.find(b"\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 1
            continue
        rec_off = pos
        pos = eol + 1
        headers: dict[str, str] = {}
        last_key: str | None = None
        while pos < n:
            eol = data.find(b"\n", pos)
            if eol < 0:
                if strict:
                    raise WetFormatError(f"{name}: truncated header block")
                return
            line = data[pos:eol].rstrip(b"\r")
            pos = eol + 1
            if not line:
                break  # end of header block
            if line[:1] in (b" ", b"\t") and last_key is not None:
                # WARC grammar folded continuation line: append to the
                # previous header's value
                headers[last_key] += " " + line.strip().decode("utf-8", "replace")
            elif b":" in line:
                k, v = line.split(b":", 1)
                last_key = k.strip().decode("utf-8", "replace").lower()
                headers[last_key] = v.strip().decode("utf-8", "replace")
            elif strict:
                raise WetFormatError(f"{name}: malformed header line {line[:60]!r}")
        try:
            clen = int(headers.get("content-length", ""))
            if clen < 0:
                raise ValueError("negative")
        except ValueError:
            if strict:
                raise WetFormatError(
                    f"{name}: record without valid Content-Length"
                )
            clen = None
        if clen is None:
            # lenient fallback: cut at the next version line
            nxt = data.find(b"\nWARC/", pos)
            payload = data[pos : nxt + 1 if nxt >= 0 else n]
            pos = (nxt + 1) if nxt >= 0 else n
        else:
            if pos + clen > n:
                if strict:
                    raise WetFormatError(f"{name}: payload overruns file end")
                # lenient: a truncated member costs its tail record, not
                # the job — and never a short/garbage payload row
                return
            payload = data[pos : pos + clen]
            pos += clen
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "record_offset": rec_off,
            "text": payload.decode("utf-8", "replace"),
            "source_file": name,
        }


def parse_wet_bytes(data: bytes, name: str = "<mem>", strict: bool = True) -> list:
    """Pure-Python single-stream parser (the kernel ``read_wet`` maps
    over files; exposed for tests and local tooling).  Transparently
    gunzips (multi-member streams concatenate per the WARC-record-per-
    member convention)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    return list(_parse_stream(data, name, strict))


def read_wet(
    spark: SparkSession,
    path: str,
    strict: bool = True,
    keep_types: tuple = ("conversion", "response", "resource"),
) -> DataFrame:
    """Read WET/WARC-text files under ``path`` (glob ok; ``.gz``
    handled) into one row per content record.

    ``warcinfo`` file-header records are metadata, not documents — they
    are dropped unless named in ``keep_types``.  ``strict=True`` fails
    the job on a framing violation; ``strict=False`` skips malformed
    tails and resyncs on the next ``WARC/`` version line (the lenient
    posture crawls need — a truncated member costs its records, never
    the job).

    One file = one task (binaryFile source, non-splittable gzip — the
    standard CC execution shape); the parser runs as Arrow-batched
    ``mapInPandas``, so record rows stream out per file without
    collecting anything driver-side."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    kt = tuple(keep_types)

    def parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WET_RECORDS_SCHEMA.fields]
        for b in batches:
            out = []
            for fpath, content in zip(b["path"], b["content"]):
                for rec in parse_wet_bytes(bytes(content), fpath, strict):
                    if rec["warc_type"] in kt:
                        out.append(rec)
            yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(
        parse, schema=WET_RECORDS_SCHEMA
    )


def wet_to_documents(records: DataFrame) -> DataFrame:
    """Bridge WET records into the engine's interleaved-documents shape
    (input_hint: ``doc_id, spans array<struct<kind,text,media_ref,
    offset>>`` + the optional ``metadata`` map ``SragEngine.ingest``
    merges): one text span per record, URI/date/file provenance in
    metadata.  doc_id prefers the WARC-Record-ID (globally unique by
    spec), falling back to ``file#byte-offset`` — unique per record even
    when uri AND record id are both missing (the lenient-parse damage
    case), so upsert-by-key can never silently merge unrelated records.
    Pure native expressions."""
    doc_id = F.coalesce(
        F.col("record_id"),
        F.concat_ws(
            "#",
            F.coalesce(F.col("target_uri"), F.col("source_file")),
            F.col("record_offset"),
        ),
    )
    span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    meta = F.map_filter(
        F.create_map(
            F.lit("uri"), F.col("target_uri"),
            F.lit("warc_date"), F.col("warc_date"),
            F.lit("source_file"), F.col("source_file"),
        ),
        lambda k, v: v.isNotNull(),
    )
    return records.select(
        doc_id.alias("doc_id"),
        F.array(span).alias("spans"),
        meta.alias("metadata"),
    )


def synth_wet_files(
    out_dir: str,
    n_files: int = 2,
    records_per_file: int = 20,
    seed: int = 42,
    compress: bool = False,
) -> list[str]:
    """Deterministic WET corpus generator (driver-side, test/bench
    scale): spec-exact framing — CRLF headers, byte-accurate
    Content-Length (payloads include multi-byte UTF-8 and an embedded
    fake ``WARC/1.0`` line so naive line-splitters fail), a warcinfo
    lead record per file.  Returns the file paths."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for fi in range(n_files):
        buf = io.BytesIO()

        def rec(headers: dict, payload: bytes) -> None:
            buf.write(b"WARC/1.0\r\n")
            for k, v in headers.items():
                buf.write(f"{k}: {v}\r\n".encode())
            buf.write(f"Content-Length: {len(payload)}\r\n".encode())
            buf.write(b"\r\n")
            buf.write(payload)
            buf.write(b"\r\n\r\n")

        rec(
            {"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
            f"software: srag-synth/1.0\r\nfile: {fi}\r\n".encode(),
        )
        for ri in range(records_per_file):
            h = hashlib.md5(f"{seed}:{fi}:{ri}".encode()).hexdigest()
            words = [f"w{h[j % 32]}{(ri * 7 + j) % 97}" for j in range(5 + ri % 11)]
            body = " ".join(words) + f"\nparagraph two — durée {h[:6]}…\n"
            if ri % 5 == 0:
                body += "WARC/1.0 is mentioned IN the payload\n"
            rec(
                {
                    "WARC-Type": "conversion",
                    "WARC-Target-URI": f"https://example.org/{fi}/{ri}",
                    "WARC-Date": "2024-01-01T00:00:00Z",
                    "WARC-Record-ID": f"<urn:uuid:{h}>",
                    "Content-Type": "text/plain",
                },
                body.encode("utf-8"),
            )
        name = f"part-{fi:04d}.warc.wet" + (".gz" if compress else "")
        p = os.path.join(out_dir, name)
        data = buf.getvalue()
        if compress:
            data = gzip.compress(data, mtime=0)
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    return paths
