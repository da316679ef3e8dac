"""Transcript-model operators: the reference's domain record as a table.

Builds the TRANSCRIPTS_SCHEMA table (srag-domain Transcript.scala:8-16 —
doc_id, language, words, confidence, created_at, source, metadata) from
extracted documents, plus the P5 metadata-enrichment and P10 language-
validation operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

# per-span-kind source attribution: reference IngestSource enum
# (IngestSource.scala:3-4; DB also reserves 'Document', V1 migration :8)
_SOURCE_FOR_KIND = {
    "text": "Text",
    "audio": "Audio",
    "html": "Document",
    "pdf": "Document",
}


_AUDIO_TIMES_TYPE = ArrayType(
    StructType(
        [
            StructField("start", LongType(), True),
            StructField("end", LongType(), True),
        ]
    )
)


@pandas_udf(_AUDIO_TIMES_TYPE)
def _audio_times_udf(spans: pd.Series) -> pd.Series:
    """Per-document (start_ms, end_ms) for each AUDIO SEGMENT the golden
    extraction emits, in output order.  Mirrors the kernel's document
    ordering + audio run batching (golden.extract_document_cols) but
    touches only audio runs — html/pdf/text spans are skipped entirely,
    so this pass is cheap even on mixed docs.  Alignment invariant
    (pinned by tests): element j of the result times the j-th audio-kind
    span of the extracted output."""
    from srag_spark.golden import segment_audio_words_timed

    def times(doc_spans):
        if doc_spans is None:
            return []
        n = len(doc_spans)
        offsets = [s.get("offset") for s in doc_spans]
        order = sorted(
            range(n),
            key=lambda i: (offsets[i] if offsets[i] is not None else i, i),
        )
        out = []
        p = 0
        while p < n:
            i = order[p]
            if doc_spans[i].get("kind") != "audio":
                p += 1
                continue
            run = []
            q = p
            while q < n and doc_spans[order[q]].get("kind") == "audio":
                j = order[q]
                off = offsets[j]
                run.append(
                    (doc_spans[j].get("text") or "", off if off is not None else 0)
                )
                q += 1
            out.extend(
                {"start": t0, "end": t1}
                for _txt, t0, t1 in segment_audio_words_timed(run)
            )
            p = q
        return out

    return spans.map(times)


def build_transcripts(
    extracted: DataFrame, created_at=None, source_docs: DataFrame | None = None
) -> DataFrame:
    """Extracted docs → transcripts table.

    words: one Word per extracted non-media span — text spans carry
    synthetic ordinal offsets with confidence 1.0 (the exact
    TextPreparatorPipeline.scala:52-58 shape); source = the dominant
    span kind's IngestSource, 'Text' on ties (deterministic).

    ``source_docs`` (the original DOCUMENTS_SCHEMA batch) opts into audio
    timing fidelity: audio-derived words carry their segment's real
    millisecond offsets from the source ASR spans (the AssemblyAI word
    shape the reference stores, AssemblyAIAdapter.scala:50-56 /
    Transcript word start/end) instead of ordinals.  Only docs that
    actually contain audio spans pay the timing pass (filtered before
    the UDF); the join is doc_id-keyed like every other ingest stage.
    """
    if created_at is None:
        created_at = F.current_timestamp()
    nonmedia = F.filter("spans", lambda s: s["text"].isNotNull())
    if source_docs is None:
        words = F.transform(
            nonmedia,
            lambda s, i: F.struct(
                s["text"].alias("text"),
                i.cast("long").alias("start"),
                (i + 1).cast("long").alias("end"),
                F.lit(1.0).alias("confidence"),
            ),
        )
    else:
        times = (
            source_docs.filter(
                F.exists("spans", lambda s: s["kind"] == F.lit("audio"))
            )
            .select("doc_id", _audio_times_udf(F.col("spans")).alias("_atimes"))
        )
        extracted = extracted.join(times, "doc_id", "left")

        def _word(s, i):
            # audio ordinal of position i = audio spans strictly before it
            # (media spans are never audio, so the nonmedia prefix count
            # equals the full-output prefix count)
            ord_ = F.size(
                F.filter(
                    F.slice(nonmedia, F.lit(1), i),
                    lambda x: x["kind"] == F.lit("audio"),
                )
            )
            t = F.element_at(F.col("_atimes"), ord_ + 1)
            use_ms = (
                F.col("_atimes").isNotNull()
                & (s["kind"] == F.lit("audio"))
                & t.isNotNull()
            )
            return F.struct(
                s["text"].alias("text"),
                F.when(use_ms, t["start"]).otherwise(i.cast("long")).alias("start"),
                F.when(use_ms, t["end"]).otherwise((i + 1).cast("long")).alias("end"),
                F.lit(1.0).alias("confidence"),
            )

        words = F.transform(nonmedia, _word)
    def count_kind(k: str):
        # factory closure, NOT a default-arg lambda: pyspark counts ALL
        # lambda parameters when choosing the unary (element) vs binary
        # (element, index) filter form, so `lambda s, _k=...` binds _k to
        # the element-index column (string-vs-int compare: wrong counts,
        # or a CAST error under ANSI)
        return F.size(F.filter("spans", lambda s: s["kind"] == F.lit(k)))

    kind_counts = {k: count_kind(k) for k in _SOURCE_FOR_KIND}
    source = None
    best = None
    for k in ("text", "audio", "html", "pdf"):  # tie order: text wins
        c = kind_counts[k]
        if source is None:
            source, best = F.lit(_SOURCE_FOR_KIND[k]), c
        else:
            source = F.when(c > best, F.lit(_SOURCE_FOR_KIND[k])).otherwise(source)
            best = F.when(c > best, c).otherwise(best)
    return extracted.select(
        "doc_id",
        F.lit(None).cast("string").alias("language"),
        words.alias("words"),
        F.lit(1.0).alias("confidence"),
        created_at.alias("created_at"),
        source.alias("source"),
        F.create_map().cast("map<string,string>").alias("metadata"),
    )


def enrich_metadata(df: DataFrame, extra: dict[str, str]) -> DataFrame:
    """P5: right-biased metadata merge — ``transcript.metadata ++ extra``
    (Transcript.scala:17-21).  Requires
    spark.sql.mapKeyDedupPolicy=LAST_WIN (set by srag_spark.session) so
    ``map_concat`` keeps the right-hand value on duplicate keys."""
    extra_map = F.create_map(
        *[F.lit(x) for kv in extra.items() for x in kv]
    )
    merged = F.map_concat(
        F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
        extra_map,
    )
    return df.withColumn("metadata", merged)


# The reference's enumerated ISO-639-1 codes (LanguageCode.scala:27-137,
# allSupportedLanguages + the named vals at :139-251) — exactly these 109
# two-letter codes (set equality re-verified against the reference enum).
# DELIBERATE TIGHTENING beyond the reference: LanguageCode.isValid (used
# at runtime by AssemblyAIAdapter) is regex-only (^[a-z]{2}$), so the
# reference would preserve any two-letter string; we enforce the domain
# model's enumerated names instead, so e.g. 'zz' (regex-valid, not a
# language) → NULL.  Real ISO codes absent from the reference's own enum
# (e.g. 'be', 'nb', 'nn') are likewise nulled — matching the enum, not
# the ISO registry, is the contract here, and the DuckDB oracle mirrors
# the same set.
ISO_639_1_CODES = frozenset(
    """en fr es de it pt ru nl pl uk cs sk hu ro bg hr sr sl mk bs sq el tr
    fi sv no da is et lv lt ca gl eu cy ga br mt lb fo zh ja ko hi bn ta te
    mr gu kn ml pa or as ne si sd ur th vi id ms tl jv su my km lo mn kk ky
    uz tg tk ug bo dz ar fa ps ku he am ti so ha yo ig sw zu xh af sn ts mg
    mi sm to fj ty hy ka az ba tt cv yi ht la""".split()
)


def validate_language(df: DataFrame, col: str = "language") -> DataFrame:
    """P10: ISO-639-1 normalization — lowercase, must be one of the
    reference's 109 enumerated codes (LanguageCode.scala:27-137; a
    deliberate tightening of its regex-only isValid — see ISO_639_1_CODES
    above), else NULL; 'en_us'-style ASR codes take the primary subtag
    first (AssemblyAIAdapter.scala:310-314)."""
    primary = F.lower(F.split(F.col(col), "_")[0])
    return df.withColumn(
        col,
        F.when(primary.isin(*sorted(ISO_639_1_CODES)), primary).otherwise(F.lit(None)),
    )
