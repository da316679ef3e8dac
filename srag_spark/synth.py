"""Deterministic synthetic interleaved-document generator.

Produces the BASELINE.json input_hint table
    (doc_id:string, spans:array<struct<kind,text,media_ref,offset:int>>)
at any scale, either as local rows (tests) or distributed via
``mapInPandas`` (bench).  Determinism: every document is generated from
``Random(f"{seed}:{doc_id}")`` so output is identical regardless of
partition count or executor placement — required for cross-parallelism
bench comparability and for resumability tests.

Includes the FIXTURES.md §1 requirements: interleaved kinds within single
documents, audio word spans with millisecond-style offsets (AssemblyAI
shape), skewed mega-docs (100–1000× median span count) to exercise salted
repartitioning, and the reference-pinned whitespace edge cases.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from srag_spark.schema import DOCUMENTS_SCHEMA

_VOCAB = (
    "the quick brown fox jumps over lazy dog spark engine parses documents "
    "into ordered span sequences while catalyst optimizes every declarative "
    "plan and arrow batches move columns between jvm and python workers "
    "extraction keeps main content drops boilerplate navigation chrome "
    "pages columns paragraphs sentences words offsets anchors media refs"
).split()

_BOILER_LINKS = (
    '<a href="/home">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/login">Login</a>'
)

# reference-pinned whitespace fixture (TextPreparatorPipelineSpec.scala:36)
PINNED_TEXTS = (
    "hello   world\nfrom text",
    "Hello, world!",
    "  leading and trailing  ",
    "tab\tseparated\twords",
    "",
    "   ",
)


def _sentence(rng: random.Random, lo: int = 4, hi: int = 12) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_VOCAB) for _ in range(n)]
    return " ".join(words) + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random, n_sent: int | None = None) -> str:
    n = n_sent if n_sent is not None else rng.randint(2, 5)
    return " ".join(_sentence(rng) for _ in range(n))


def _html_payload(rng: random.Random) -> str:
    parts = ["<html><body>", "<nav>", _BOILER_LINKS, "</nav>"]
    for _ in range(rng.randint(1, 4)):
        parts.append(f"<p>{_paragraph(rng)}</p>")
        if rng.random() < 0.4:
            parts.append(f"<div>{_BOILER_LINKS} short</div>")
        if rng.random() < 0.3:
            parts.append(f"<div>tiny {rng.choice(_VOCAB)}</div>")
    if rng.random() < 0.3:
        parts.append(f"<script>var x = {rng.randint(0, 99)};</script>")
    parts.append("<footer>" + _BOILER_LINKS + "</footer>")
    parts.append("</body></html>")
    return "".join(parts)


def _pdf_payload(rng: random.Random, malformed: bool = False) -> str:
    lines = []
    y = 50.0
    page = 1
    for _ in range(rng.randint(3, 10)):
        col_x = rng.choice([72.0, 320.0])
        y += rng.choice([12.0, 14.0, 40.0])
        if y > 700:
            page += 1
            y = 50.0
        lines.append(f"{page}\t{col_x + rng.random():.1f}\t{y:.1f}\t{_sentence(rng)}")
    if malformed:
        lines.append("not-a-valid-run-line")
    return "\n".join(lines)


def _audio_words(rng: random.Random, n: int) -> list[tuple[str, int]]:
    out = []
    t = rng.randint(0, 1000)
    for i in range(n):
        w = rng.choice(_VOCAB)
        if rng.random() < 0.18:
            w += rng.choice([".", "?", "!", ","])
        out.append((w, t))
        t += rng.randint(120, 400)
        if rng.random() < 0.05:
            t += rng.randint(1200, 3000)  # silence → segment break
    return out


def generate_doc(doc_id: str, seed: int = 42, mega: bool = False) -> list[dict]:
    """Generate one document's ordered span list, deterministically."""
    rng = random.Random(f"{seed}:{doc_id}")
    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str | None, media_ref: str | None = None) -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    n_units = rng.randint(2, 8)
    if mega:
        n_units = rng.randint(300, 1200)  # 100–1000× median span count

    for _ in range(n_units):
        r = rng.random()
        if r < 0.40:
            add("text", _paragraph(rng))
        elif r < 0.55:
            add("html", _html_payload(rng))
        elif r < 0.68:
            add("pdf", _pdf_payload(rng, malformed=rng.random() < 0.05))
        elif r < 0.88:
            # audio word run: offsets are doc-monotonic "virtual ms" —
            # base position + elapsed ms so inter-word gaps (and the
            # >AUDIO_GAP_MS segment breaks) survive the doc-order sort
            words = _audio_words(rng, rng.randint(5, 40))
            t0 = words[0][1]
            for w, t in words:
                spans.append(
                    {"kind": "audio", "text": w, "media_ref": None, "offset": off + (t - t0)}
                )
            off = spans[-1]["offset"] + 1
        else:
            add("media", None, f"blob://bucket/{doc_id}/{rng.randint(0, 9999):04d}")

    # sprinkle reference-pinned whitespace edge cases into some docs
    if rng.random() < 0.15:
        add("text", rng.choice(PINNED_TEXTS))
    # occasional unknown-kind span → parse_failure path
    if rng.random() < 0.03:
        add("glyph", "unknown kind payload")
    return spans


def generate_rows(
    n_docs: int, seed: int = 42, mega_every: int = 500
) -> list[tuple[str, list[dict]]]:
    """Local (driver-side) generation for tests. ``mega_every`` docs is a
    skewed mega-doc (0 disables)."""
    rows = []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        mega = mega_every > 0 and i % mega_every == mega_every - 1
        rows.append((doc_id, generate_doc(doc_id, seed=seed, mega=mega)))
    return rows


def synth_documents_df(spark, n_docs: int, seed: int = 42, mega_every: int = 500):
    """Distributed generation: spark.range → mapInPandas, per-doc seeding.

    Output is independent of partitioning (each doc seeded by its own id),
    so the same (n_docs, seed) always yields the same table — the property
    the two-parallelism bench and resume tests rely on.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            doc_ids = [f"doc-{i:08d}" for i in ids]
            spans = [
                generate_doc(
                    d,
                    seed=seed,
                    mega=mega_every > 0 and i % mega_every == mega_every - 1,
                )
                for i, d in zip(ids, doc_ids)
            ]
            yield pd.DataFrame({"doc_id": doc_ids, "spans": spans})

    return spark.range(n_docs).mapInPandas(gen, schema=DOCUMENTS_SCHEMA)
