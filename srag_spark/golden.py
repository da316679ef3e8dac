"""Golden (frozen) pure-Python reference parsers.

These functions DEFINE the engine's extraction semantics.  The Spark
pipeline (srag_spark.operators.parse) must produce span sequences that are
row-wise equal to these on ``(kind, text, media_ref, order)`` — the
per-row invariant from BASELINE.json.

Provenance of each spec:

* ``tokenize_ws`` / ``reconstruct_text`` reproduce the reference's text
  parser exactly: Java ``split("\\s+").filter(_.nonEmpty)`` with synthetic
  ordinal offsets (srag-application TextPreparatorPipeline.scala:48-60) and
  single-space join reconstruction (srag-domain Transcript.scala:23-24).
  Java's split+filter ≡ Python ``str.split()`` — pinned by the reference
  fixture "hello   world\\nfrom text" → ["hello","world","from","text"]
  (TextPreparatorPipelineSpec.scala:36,45-46).

* ``extract_html_blocks`` implements the north-rule HTML boilerplate
  heuristic (the reference declares but does not implement Document
  ingestion — README.md:180-181).  It is an Arc90/Boilerpipe-class
  text-density / link-density block scorer, frozen HERE as the oracle.

* ``parse_pdf_runs`` implements the north-rule PDF reading-order spec over
  a deterministic text-run encoding (page\\tx\\ty\\ttext lines), frozen
  HERE as the oracle.

* ``segment_audio_words`` segments ASR word spans (AssemblyAI word shape:
  per-word text + millisecond start offsets,
  AssemblyAIAdapter.scala:293-309) into sentence-like segments.

All functions are deterministic, dependency-free, and version-stable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Frozen constants (changing any of these invalidates every golden fixture)
# ---------------------------------------------------------------------------
HTML_MIN_WORDS = 8          # blocks shorter than this are boilerplate
HTML_MAX_LINK_DENSITY = 1.0 / 3.0
PDF_COLUMN_SPLIT_X = 306.0  # US-Letter midpoint in points
PDF_PARA_Y_GAP = 20.0       # new paragraph when vertical gap exceeds this
AUDIO_GAP_MS = 1000         # new segment when inter-word silence exceeds this
AUDIO_SENTENCE_END = (".", "!", "?")


# ---------------------------------------------------------------------------
# P1 / P4 — whitespace word-span parse + reconstruction
# ---------------------------------------------------------------------------
def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokenization, empty tokens dropped.

    The reference's ``text.split("\\s+").filter(_.nonEmpty)``
    (TextPreparatorPipeline.scala:48-60), frozen here with PYTHON
    ``str.split()`` semantics: Unicode-aware (NBSP, U+3000, ... all
    split), unlike Java's default ASCII-only ``\\s`` (ADVICE r5 — the
    native operators use ``(?U)\\s+`` to match this spec).
    """
    if text is None:
        return []
    return text.split()


def reconstruct_text(words: list[str]) -> str:
    """``words.mkString(" ")`` (Transcript.scala:23-24)."""
    return " ".join(words)


# ---------------------------------------------------------------------------
# P11 — HTML boilerplate strip (frozen spec; north rule)
# ---------------------------------------------------------------------------
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th|section|article|"
    r"header|footer|nav|aside|blockquote|pre|figure|figcaption|main|form|"
    r"br|hr)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def _unescape(text: str) -> str:
    if "&" not in text:  # fast path: most fragments carry no entities
        return text
    for ent, ch in _ENTITIES.items():
        text = text.replace(ent, ch)
    return text


def _strip_tags(fragment: str) -> str:
    if "<" not in fragment:  # fast path: fragment between block tags is tag-free
        return _unescape(fragment)
    return _unescape(_TAG_RE.sub(" ", fragment))


@dataclass
class HtmlBlock:
    text: str
    word_count: int
    link_word_count: int
    kept: bool

    @property
    def link_density(self) -> float:
        if self.word_count == 0:
            return 1.0
        return self.link_word_count / self.word_count


def score_html_blocks(html: str) -> list[HtmlBlock]:
    """Segment HTML into blocks and score each by text/link density.

    Spec (frozen):
      1. remove comments, then <script>/<style> elements with content;
      2. split on block-level tags (see _BLOCK_SPLIT_RE) — each fragment
         between consecutive block tags is one candidate block;
      3. per block: link words = whitespace tokens inside <a> elements;
         total words = whitespace tokens after stripping all tags and
         unescaping entities;
      4. keep iff word_count >= HTML_MIN_WORDS
         and link_density < HTML_MAX_LINK_DENSITY.
    """
    if not html:
        return []
    cleaned = _COMMENT_RE.sub(" ", html)
    cleaned = _SCRIPT_STYLE_RE.sub(" ", cleaned)
    blocks: list[HtmlBlock] = []
    for fragment in _BLOCK_SPLIT_RE.split(cleaned):
        link_words = 0
        # precheck is a conservative superset of the IGNORECASE <a\b match
        if "<a" in fragment or "<A" in fragment:
            for m in _ANCHOR_RE.finditer(fragment):
                link_words += len(tokenize_ws(_strip_tags(m.group(1))))
        words = tokenize_ws(_strip_tags(fragment))
        if not words:
            continue  # whitespace-only fragments are not blocks at all
        wc = len(words)
        ld = 1.0 if wc == 0 else link_words / wc
        kept = wc >= HTML_MIN_WORDS and ld < HTML_MAX_LINK_DENSITY
        blocks.append(
            HtmlBlock(
                text=reconstruct_text(words),
                word_count=wc,
                link_word_count=link_words,
                kept=kept,
            )
        )
    return blocks


def extract_html_blocks(html: str) -> list[str]:
    """Kept main-content block texts, in DOM order."""
    return [b.text for b in score_html_blocks(html) if b.kept]


def html_kept_blocks(html: str) -> tuple[list[str], int, int]:
    """(kept_texts, blocks_kept, blocks_dropped) — the hot-path twin of
    :func:`score_html_blocks` (same classification, pinned equal by
    tests/test_golden.py).  Faster because it only computes what the
    extraction kernel consumes:

    * comment / script-style removal run conditionally (one C-level
      substring scan instead of two regex passes on tag-free blocks);
    * the anchor scan is skipped for fragments that already fail the
      word-count gate (link density cannot rescue them) — most
      boilerplate fragments are short, so this skips the regex where it
      is least useful.
    """
    if not html:
        return [], 0, 0
    if "<!--" in html:
        html = _COMMENT_RE.sub(" ", html)
    low = html.lower()
    if "<script" in low or "<style" in low:
        html = _SCRIPT_STYLE_RE.sub(" ", html)
    kept_texts: list[str] = []
    kept = 0
    dropped = 0
    for fragment in _BLOCK_SPLIT_RE.split(html):
        if not fragment:
            continue  # adjacent block tags produce empty fragments
        words = _strip_tags(fragment).split()
        if not words:
            continue  # whitespace-only fragments are not blocks at all
        wc = len(words)
        if wc < HTML_MIN_WORDS:
            dropped += 1
            continue
        link_words = 0
        if "<a" in fragment or "<A" in fragment:
            for m in _ANCHOR_RE.finditer(fragment):
                link_words += len(_strip_tags(m.group(1)).split())
        if link_words / wc < HTML_MAX_LINK_DENSITY:
            kept_texts.append(" ".join(words))
            kept += 1
        else:
            dropped += 1
    return kept_texts, kept, dropped


# ---------------------------------------------------------------------------
# Hyperlink extraction (frozen spec; the link-graph miner — the web-scale
# complement of P11: the same anchor elements the block scorer counts for
# link density, mined for (href, anchor text) edges a crawl/quality
# pipeline builds its host/page graph from)
# ---------------------------------------------------------------------------
_HREF_RE = re.compile(r'href="([^"]*)"', re.IGNORECASE)
_NOFOLLOW_RE = re.compile(r'rel="[^"]*nofollow[^"]*"', re.IGNORECASE)
_ANCHOR_FULL_RE = re.compile(
    r"<a\b([^>]*)>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL
)


def extract_links(html: str) -> list[tuple[int, str, str, bool]]:
    """Extract hyperlinks from an HTML payload.

    Spec (frozen):
      1. remove comments, then <script>/<style> elements (consistent with
         :func:`score_html_blocks` — commented-out / scripted anchors are
         not links);
      2. scan <a ...>...</a> elements in document order; each element
         gets an ``anchor_index`` = its 0-based ordinal among ALL anchor
         elements (skipped elements still consume an index, so the index
         is stable under filtering);
      3. the element's href is the value of the first double-quoted
         ``href="..."`` attribute in its opening tag; elements without
         one, or with an empty value, emit nothing;
      4. ``nofollow`` is true iff the opening tag carries a double-quoted
         ``rel`` attribute whose value contains ``nofollow``;
      5. anchor text = the inner HTML with tags stripped, entities
         unescaped (the _ENTITIES order), whitespace-normalized
         (tokenize + single-space join).

    Returns ``[(anchor_index, href, anchor_text, nofollow), ...]``.
    """
    if not html:
        return []
    html = _COMMENT_RE.sub(" ", html)
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    out: list[tuple[int, str, str, bool]] = []
    for idx, m in enumerate(_ANCHOR_FULL_RE.finditer(html)):
        attrs, inner = m.group(1), m.group(2)
        hm = _HREF_RE.search(attrs)
        if not hm or not hm.group(1):
            continue
        out.append(
            (
                idx,
                hm.group(1),
                reconstruct_text(tokenize_ws(_strip_tags(inner))),
                bool(_NOFOLLOW_RE.search(attrs)),
            )
        )
    return out


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")
_URL_PARTS_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$")


def resolve_href(href: str, base_scheme: str, base_host: str) -> str | None:
    """Resolve an extracted href against its page's base, canonicalized.

    Spec (frozen; the bounded RFC 3986 subset a link-graph build needs):
      1. strip the fragment (everything from the first ``#``); an href
         that becomes empty resolves to nothing (None);
      2. scheme-ful hrefs (``scheme:...``, incl. mailto:/javascript:)
         are taken as-is; protocol-relative ``//host/...`` takes the
         base scheme; root-relative ``/path`` and bare relative paths
         resolve against the base authority root (directory-relative
         resolution is deliberately out of spec — document-level link
         graphs key on authorities and absolute paths);
      3. canonicalization (applied to the resolved URL when it has a
         ``scheme://authority`` form; non-hierarchical URLs like
         mailto: pass through): scheme and host lowercased, a default
         port stripped (``:80`` for http, ``:443`` for https), an empty
         path made ``/``, a trailing ``?`` with no query dropped.
    """
    if href is None:
        return None
    href = href.split("#", 1)[0]
    if not href:
        return None
    if href.startswith("//"):
        url = f"{base_scheme}:{href}"
    elif _SCHEME_RE.match(href):
        url = href
    elif href.startswith("/"):
        url = f"{base_scheme}://{base_host}{href}"
    else:
        url = f"{base_scheme}://{base_host}/{href}"
    m = _URL_PARTS_RE.match(url)
    if not m:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    rest = m.group(3)
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if rest.endswith("?"):
        rest = rest[:-1]
    if not rest:
        rest = "/"
    return f"{scheme}://{host}{rest}"


_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_META_RE = re.compile(r"<meta\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_LINKTAG_RE = re.compile(r"<link\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_NAME_ATTR_RE = re.compile(r'name="([^"]*)"', re.IGNORECASE)
_CONTENT_ATTR_RE = re.compile(r'content="([^"]*)"', re.IGNORECASE)
_REL_ATTR_RE = re.compile(r'rel="([^"]*)"', re.IGNORECASE)


def extract_meta(html: str) -> tuple[str | None, str | None, str | None, bool]:
    """Extract head metadata from an HTML payload.

    Spec (frozen):
      1. remove comments, then <script>/<style> elements (consistent
         with :func:`score_html_blocks` / :func:`extract_links` —
         commented-out or scripted metadata is not metadata);
      2. ``title`` = the inner HTML of the FIRST ``<title>...</title>``
         element, tag-stripped, entity-unescaped (the _ENTITIES order),
         whitespace-normalized; None when absent or empty after
         normalization;
      3. a ``<meta ...>`` tag's name is its first double-quoted
         ``name="..."`` attribute and its content its first double-quoted
         ``content="..."`` attribute, in either attribute order;
         ``description`` = the content of the FIRST meta tag whose name
         equals ``description`` case-insensitively AND whose raw content
         is non-empty, entity-unescaped and whitespace-normalized (a
         first match normalizing to empty yields None — later tags do
         not rescue it); None when absent;
      4. ``canonical`` = the first double-quoted ``href`` of the FIRST
         ``<link ...>`` tag whose double-quoted ``rel`` value equals
         ``canonical`` case-insensitively, taken RAW (resolution against
         the page base composes via :func:`resolve_href`); None when
         absent or empty;
      5. ``robots_noindex`` is true iff ANY meta tag with name
         ``robots`` has a content containing ``noindex``
         case-insensitively.

    Returns ``(title, description, canonical, robots_noindex)``.
    """
    if not html:
        return (None, None, None, False)
    html = _COMMENT_RE.sub(" ", html)
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    title: str | None = None
    tm = _TITLE_RE.search(html)
    if tm:
        title = reconstruct_text(tokenize_ws(_strip_tags(tm.group(1)))) or None
    description: str | None = None
    desc_found = False
    robots_noindex = False
    for m in _META_RE.finditer(html):
        attrs = m.group(1)
        nm = _NAME_ATTR_RE.search(attrs)
        cm = _CONTENT_ATTR_RE.search(attrs)
        name = nm.group(1).lower() if nm else None
        content = cm.group(1) if cm else None
        if name == "description" and not desc_found and content:
            desc_found = True
            description = (
                reconstruct_text(tokenize_ws(_unescape(content))) or None
            )
        if name == "robots" and content and "noindex" in content.lower():
            robots_noindex = True
    canonical: str | None = None
    for m in _LINKTAG_RE.finditer(html):
        attrs = m.group(1)
        rm = _REL_ATTR_RE.search(attrs)
        if rm and rm.group(1).lower() == "canonical":
            hm = _HREF_RE.search(attrs)
            if hm and hm.group(1):
                canonical = hm.group(1)
            break
    return (title, description, canonical, robots_noindex)


# ---------------------------------------------------------------------------
# P12 — PDF reading-order parse (frozen spec; north rule)
# ---------------------------------------------------------------------------
def parse_pdf_runs(payload: str) -> list[str]:
    """Parse a PDF text-run payload into reading-order paragraph texts.

    Payload encoding (one text run per line, tab-separated):
        page \\t x \\t y \\t text
    with page:int, x/y:float in points (origin top-left, y grows downward).

    Spec (frozen):
      1. parse runs; malformed lines raise ValueError (counted as a parse
         failure by the caller);
      2. column assignment: x < PDF_COLUMN_SPLIT_X → column 0, else 1;
      3. reading order: sort by (page, column, y, x) — all ascending;
      4. paragraph merge: a run continues the current paragraph iff same
         (page, column) and y - prev_y <= PDF_PARA_Y_GAP; else a new
         paragraph starts;
      5. paragraph text = run texts whitespace-normalized and joined with
         a single space.
    """
    if not payload or not payload.strip():
        return []
    runs = []
    seq = 0
    for line in payload.split("\n"):
        if not line.strip():
            continue
        parts = line.split("\t")
        if len(parts) != 4:
            raise ValueError(f"malformed pdf run line: {line!r}")
        page = int(parts[0])
        x = float(parts[1])
        y = float(parts[2])
        column = 0 if x < PDF_COLUMN_SPLIT_X else 1
        # seq makes the plain C tuple sort stable-by-insertion on full
        # (page, column, y, x) ties without comparing text — identical
        # order to a stable keyed sort on the first four fields
        runs.append((page, column, y, x, seq, parts[3]))
        seq += 1
    runs.sort()
    paragraphs: list[list[str]] = []
    prev = None
    for page, column, y, _x, _seq, text in runs:
        words = text.split()
        if not words:
            continue
        if (
            prev is not None
            and prev[0] == page
            and prev[1] == column
            and y - prev[2] <= PDF_PARA_Y_GAP
        ):
            paragraphs[-1].extend(words)
        else:
            paragraphs.append(words)
        prev = (page, column, y)
    return [" ".join(p) for p in paragraphs]


# ---------------------------------------------------------------------------
# P2 — audio word-span segmentation (frozen spec)
# ---------------------------------------------------------------------------
def segment_audio_words(words: list[tuple[str, int]]) -> list[str]:
    """Segment (word, start_ms) ASR spans into sentence-like segments.

    Spec (frozen): start a new segment when the previous word ends with
    sentence punctuation (AUDIO_SENTENCE_END) or the gap between start
    offsets exceeds AUDIO_GAP_MS.  Segment text = words joined with a
    single space (Transcript.scala:23-24 reconstruction).  A single
    whole-text span (the Whisper degenerate case,
    WhisperAdapter.scala:52-80) passes through as one segment.
    """
    segments: list[str] = []
    cur: list[str] = []
    prev_last: str | None = None  # last char of previous word (all
    prev_off: int | None = None   # AUDIO_SENTENCE_END marks are 1-char)
    for text, off in words:
        if not text:
            continue
        if (
            prev_last is None
            or prev_last in AUDIO_SENTENCE_END
            or (prev_off is not None and off - prev_off > AUDIO_GAP_MS)
        ):
            if cur:
                segments.append(" ".join(cur))
                cur = []
        cur.append(text)
        prev_last, prev_off = text[-1], off
    if cur:
        segments.append(" ".join(cur))
    return segments


def segment_audio_words_timed(
    words: list[tuple[str, int]],
) -> list[tuple[str, int, int]]:
    """(segment_text, start_ms, end_ms) per segment — segmentation
    IDENTICAL to :func:`segment_audio_words` (pinned by tests), plus the
    millisecond span each segment covers: start = first word's start
    offset, end = LAST word's start offset (the input spans carry only
    AssemblyAI start offsets — AssemblyAIAdapter.scala:50-56 word shape —
    so a word-duration end is not reconstructible; last-start is the
    faithful bound the data supports)."""
    segments: list[tuple[str, int, int]] = []
    cur: list[str] = []
    cur_t0: int | None = None
    prev_last: str | None = None
    prev_off: int | None = None
    for text, off in words:
        if not text:
            continue
        if (
            prev_last is None
            or prev_last in AUDIO_SENTENCE_END
            or (prev_off is not None and off - prev_off > AUDIO_GAP_MS)
        ):
            if cur:
                segments.append((" ".join(cur), cur_t0, prev_off))
                cur = []
        if not cur:
            cur_t0 = off
        cur.append(text)
        prev_last, prev_off = text[-1], off
    if cur:
        segments.append((" ".join(cur), cur_t0, prev_off))
    return segments


# ---------------------------------------------------------------------------
# Whole-document golden extraction (the per-row invariant generator)
# ---------------------------------------------------------------------------
def extract_document_cols(
    kinds: list,
    texts: list,
    medias: list,
    offsets: list,
    assume_sorted: bool = False,
) -> tuple[list, list, list, int, int, int]:
    """Columnar form of :func:`extract_document`: four parallel lists in,
    three parallel output lists + metrics out.  This is the hot-path
    kernel — it never materializes per-span dicts, so the Spark operator
    can feed it directly from Arrow child arrays.

    Returns (out_kinds, out_texts, out_medias, blocks_kept,
    blocks_dropped, parse_failures); output ``seq`` is the list index.

    Routing (P6, PreparatorPipelineRouter.scala:30-34 generalized to span
    granularity):
      text  → one output span per whitespace word (P1)
      html  → one output span per kept block (P11)
      pdf   → one output span per reading-order paragraph (P12)
      audio → consecutive audio spans form one ASR run, segmented together
              (P2); segment boundaries never cross a non-audio span
      media → passed through verbatim as an anchor (order invariant)
      other/None kind, or a parser error → parse_failure, span dropped
    """
    n = len(kinds)
    if assume_sorted:
        # caller (the salted slicer) already applied the global document
        # order; re-sorting a slice would use slice-LOCAL indices as the
        # null-offset keys, which is not idempotent with the global sort
        order = range(n)
    else:
        # fast path: offsets already non-decreasing and non-null (the
        # common on-disk layout) → identity order, skip the keyed sort
        sorted_already = True
        prev_off = None
        for off in offsets:
            if off is None or (prev_off is not None and off < prev_off):
                sorted_already = False
                break
            prev_off = off
        if sorted_already:
            order = range(n)
        else:
            order = sorted(
                range(n),
                key=lambda i: (offsets[i] if offsets[i] is not None else i, i),
            )

    ok: list = []
    ot: list = []
    om: list = []
    kept = 0
    dropped = 0
    failures = 0

    # Run-batched dispatch: consecutive same-kind spans are processed as
    # one run with C-level list.extend fills instead of per-span/per-word
    # appends.  Semantically identical to per-span dispatch (pinned by
    # tests): whitespace tokenization is concatenation-compatible
    # (split(join(ts, ' ')) == concat(split(t) for t)), and audio runs
    # were already segmented together by spec.
    p = 0
    while p < n:
        i = order[p]
        kind = kinds[i]
        if kind == "text":
            q = p + 1
            while q < n and kinds[order[q]] == "text":
                q += 1
            if q == p + 1:
                words = (texts[i] or "").split()
            else:
                words = " ".join(
                    texts[order[r]] or "" for r in range(p, q)
                ).split()
            ot.extend(words)
            ok.extend(["text"] * len(words))
            om.extend([None] * len(words))
            p = q
            continue
        if kind == "audio":
            run: list[tuple[str, int]] = []
            q = p
            while q < n and kinds[order[q]] == "audio":
                j = order[q]
                off = offsets[j]
                run.append((texts[j] or "", off if off is not None else 0))
                q += 1
            segs = segment_audio_words(run)
            ot.extend(segs)
            ok.extend(["audio"] * len(segs))
            om.extend([None] * len(segs))
            p = q
            continue
        if kind == "html":
            kept_texts, k, d = html_kept_blocks(texts[i] or "")
            ot.extend(kept_texts)
            ok.extend(["html"] * len(kept_texts))
            om.extend([None] * len(kept_texts))
            kept += k
            dropped += d
        elif kind == "pdf":
            try:
                paras = parse_pdf_runs(texts[i] or "")
            except (ValueError, TypeError):
                failures += 1
            else:
                ot.extend(paras)
                ok.extend(["pdf"] * len(paras))
                om.extend([None] * len(paras))
        elif kind == "media":
            ok.append("media")
            ot.append(None)
            om.append(medias[i])
        else:
            failures += 1
        p += 1
    return ok, ot, om, kept, dropped, failures


def extract_document(
    spans: list[dict],
) -> tuple[list[tuple[str, str | None, str | None]], int, int, int]:
    """Dict-based view of the golden extraction (the test/spec API).

    Input spans: dicts with keys kind, text, media_ref, offset.  Returns
    (out_spans, blocks_kept, blocks_dropped, parse_failures) where
    out_spans is the ordered list of (kind, text, media_ref); the output
    ``seq`` is its list index.  Delegates to
    :func:`extract_document_cols` — one kernel, two views.
    """
    ok, ot, om, kept, dropped, failures = extract_document_cols(
        [s.get("kind") for s in spans],
        [s.get("text") for s in spans],
        [s.get("media_ref") for s in spans],
        [s.get("offset") for s in spans],
    )
    return list(zip(ok, ot, om)), kept, dropped, failures


# ---------------------------------------------------------------------------
# P7 — recursive chunker (frozen spec; the reference delegates to
# langchain4j DocumentSplitters.recursive(max, max*0.2) — a black box —
# so OUR recursive spec is the oracle, same shape: paragraph ▸ line ▸
# sentence ▸ word splitting with max size and overlap)
# ---------------------------------------------------------------------------
CHUNK_MAX_CHARS = 1000  # TextChunker.scala:14 call-site value
CHUNK_OVERLAP = 200     # maxTokensPerChunk * 0.2

_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def _split_level(text: str, level: int) -> list[str]:
    if level == 0:
        return [p for p in re.split(r"\n{2,}", text)]
    if level == 1:
        return [p for p in text.split("\n")]
    if level == 2:
        return _SENTENCE_SPLIT_RE.split(text)
    return text.split(" ")


def recursive_chunk(
    text: str,
    max_chars: int = CHUNK_MAX_CHARS,
    overlap: int = CHUNK_OVERLAP,
) -> list[str]:
    """Recursive character chunker (frozen spec).

    Splits by paragraph, then line, then sentence, then word until every
    piece fits ``max_chars``; greedily packs adjacent pieces back together
    (joined with a single space) without exceeding ``max_chars``; between
    consecutive chunks, carries a suffix of up to ``overlap`` chars (whole
    trailing words) of the previous chunk as the next chunk's prefix.
    Empty segments dropped (TextChunker.scala:17).
    """
    norm = reconstruct_text(tokenize_ws(text))
    if not norm:
        return []
    if len(norm) <= max_chars:
        return [norm]

    def atomize(piece: str, level: int) -> list[str]:
        if len(piece) <= max_chars or level > 3:
            return [piece]
        out: list[str] = []
        for sub in _split_level(piece, level):
            sub = sub.strip()
            if not sub:
                continue
            out.extend(atomize(sub, level + 1))
        return out

    atoms = atomize(norm, 0)

    chunks: list[str] = []
    cur = ""
    for atom in atoms:
        candidate = atom if not cur else cur + " " + atom
        if len(candidate) <= max_chars:
            cur = candidate
            continue
        if cur:
            chunks.append(cur)
            tail_words: list[str] = []
            tail_len = 0
            for w in reversed(cur.split(" ")):
                extra = len(w) + (1 if tail_words else 0)
                if tail_len + extra > overlap:
                    break
                tail_words.append(w)
                tail_len += extra
            prefix = " ".join(reversed(tail_words))
            cur = (prefix + " " + atom).strip() if prefix else atom
            while len(cur) > max_chars:
                # atom longer than max even after level-3 split (a single
                # mega-word): hard-cut without overlap
                chunks.append(cur[:max_chars])
                cur = cur[max_chars:]
        else:
            while len(atom) > max_chars:
                chunks.append(atom[:max_chars])
                atom = atom[max_chars:]
            cur = atom
    if cur:
        chunks.append(cur)
    return [c for c in chunks if c]


# ---------------------------------------------------------------------------
# P8 — query-time word-group chunker (QueryService.scala:28-33)
# ---------------------------------------------------------------------------
def word_group_chunks(text: str, chunk_size: int = 1000) -> list[str]:
    """``text.split("\\s+").grouped(chunkSize).map(_.mkString(" "))``."""
    words = tokenize_ws(text)
    return [
        reconstruct_text(words[i : i + chunk_size])
        for i in range(0, len(words), chunk_size)
    ]


def parse_robots(txt: str, agent: str) -> list[tuple[bool, str]]:
    """Parse a robots.txt payload into the rules applying to ``agent``.

    Spec (frozen; the bounded RFC 9309 subset a crawl gate needs —
    literal path prefixes only, no ``*``/``$`` wildcards):
      1. split on newlines; strip everything from the first ``#``
         (comments); trim; blank lines are insignificant but do NOT
         close a group;
      2. a line is ``key: value`` on the FIRST colon, key lowercased +
         trimmed, value trimmed; keys other than ``user-agent`` /
         ``allow`` / ``disallow`` are ignored;
      3. groups: a ``user-agent`` line OPENS a new group when the
         previous significant (parsed-key) line was not itself a
         user-agent line — adjacent user-agent lines share the group;
         the group's rules are the allow/disallow lines until the next
         group opens;
      4. a group names ``agent`` when any of its user-agent values
         equals it case-insensitively; it names the wildcard when any
         value is ``*``.  If ANY group names the agent, only
         agent-naming groups apply (RFC 9309 §2.2.1 most-specific
         group); otherwise the wildcard groups apply;
      5. allow/disallow lines with an EMPTY value are ignored (an
         empty Disallow means allow-all);
      6. returns ``[(allow, prefix), ...]`` in file order.

    Match with :func:`robots_allowed`.
    """
    groups: list[dict] = []
    cur: dict | None = None
    last_was_ua = False
    for raw in (txt or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            if not last_was_ua or cur is None:
                cur = {"agents": [], "rules": []}
                groups.append(cur)
            cur["agents"].append(value.lower())
            last_was_ua = True
        elif key in ("allow", "disallow"):
            last_was_ua = False
            if cur is not None and value:
                cur["rules"].append((key == "allow", value))
        else:
            last_was_ua = False
    agent = agent.lower()
    specific = [g for g in groups if agent in g["agents"]]
    chosen = specific or [g for g in groups if "*" in g["agents"]]
    return [r for g in chosen for r in g["rules"]]


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """Longest-prefix-match verdict over :func:`parse_robots` rules:
    the matching rule with the longest prefix decides; a tie between
    an allow and a disallow of equal length goes to ALLOW (RFC 9309
    §2.2.2); no matching rule → allowed."""
    best: tuple[int, bool] | None = None
    for allow, prefix in rules:
        if path.startswith(prefix):
            key = (len(prefix), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


_PROP_ATTR_RE = re.compile(r'property="([^"]*)"', re.IGNORECASE)
_TIME_TAG_RE = re.compile(r'<time\b[^>]*\bdatetime="([^"]*)"', re.IGNORECASE | re.DOTALL)
_DATE_META_KEYS = ("article:published_time", "datepublished", "date", "dc.date.issued")
_ISO_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})")
_URL_DATE_RE = re.compile(r"/((?:19|20)\d{2})/(\d{2})(?:/(\d{2}))?(?:/|$)")


def _valid_ymd(y: str, m: str, d: str) -> bool:
    return "1900" <= y <= "2099" and "01" <= m <= "12" and "01" <= d <= "31"


def extract_pubdate(html: str, url: str | None = None):
    """Publication-date extraction (trafilatura-class, bounded).

    Spec (frozen):
      1. comments then <script>/<style> removed (shared convention);
      2. candidate sources in PRIORITY order — the first source that
         yields a VALID date wins:
         a. ``meta``: the first ``<meta>`` tag whose double-quoted
            ``property`` or ``name`` value equals one of
            article:published_time / datePublished / date /
            dc.date.issued case-insensitively, with a non-empty
            ``content``; the date is the content's leading
            ``YYYY-MM-DD`` prefix;
         b. ``time``: the first ``<time ... datetime="...">`` tag's
            datetime value, same leading-prefix rule;
         c. ``url``: the first ``/YYYY/MM/DD/`` or ``/YYYY/MM/`` path
            segment of ``url`` (years 19xx/20xx; a missing day is
            ``01``; the segment must end at ``/`` or end-of-string);
      3. validity = year in [1900, 2099], month in [01, 12], day in
         [01, 31] — a LEXICAL bound (no calendar arithmetic: the gate
         is a curation signal, not a datetime library);
      4. returns ``(date 'YYYY-MM-DD', source)`` or ``(None, None)``.
    """
    if html:
        cleaned = _COMMENT_RE.sub(" ", html)
        cleaned = _SCRIPT_STYLE_RE.sub(" ", cleaned)
    else:
        cleaned = ""
    for m in _META_RE.finditer(cleaned):
        attrs = m.group(1)
        keys = []
        nm = _NAME_ATTR_RE.search(attrs)
        pm = _PROP_ATTR_RE.search(attrs)
        if nm:
            keys.append(nm.group(1).lower())
        if pm:
            keys.append(pm.group(1).lower())
        if not any(k in _DATE_META_KEYS for k in keys):
            continue
        cm = _CONTENT_ATTR_RE.search(attrs)
        if not cm or not cm.group(1):
            continue
        dm = _ISO_DATE_RE.match(cm.group(1))
        if dm and _valid_ymd(*dm.groups()):
            return ("-".join(dm.groups()), "meta")
        break  # first keyed meta decides for the meta source
    tm = _TIME_TAG_RE.search(cleaned)
    if tm:
        dm = _ISO_DATE_RE.match(tm.group(1))
        if dm and _valid_ymd(*dm.groups()):
            return ("-".join(dm.groups()), "time")
    if url:
        um = _URL_DATE_RE.search(url)
        if um:
            y, mo, d = um.group(1), um.group(2), um.group(3) or "01"
            if _valid_ymd(y, mo, d):
                return (f"{y}-{mo}-{d}", "url")
    return (None, None)


_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>", re.IGNORECASE | re.DOTALL)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.IGNORECASE | re.DOTALL)
_CELL_RE = re.compile(
    r"<(td|th)\b[^>]*>(.*?)</\1\s*>", re.IGNORECASE | re.DOTALL
)


def extract_tables(html: str) -> list[tuple[int, int, int, bool, str]]:
    """Extract HTML tables into a cell relation.

    Spec (frozen):
      1. remove comments, then <script>/<style> (shared convention);
      2. tables = non-overlapping ``<table>...</table>`` elements in
         document order (NESTED tables are out of spec: the non-greedy
         match closes the outer table at the inner ``</table>``);
         ``table_index`` = 0-based ordinal;
      3. rows = ``<tr>...</tr>`` within the table body, ``row_index``
         0-based; cells = ``<td>``/``<th>`` within the row (matching
         closing tag), ``col_index`` 0-based in document order —
         colspan/rowspan attributes are ignored (lexical grid, not a
         rendered grid);
      4. ``is_header`` = the cell is a ``<th>``;
      5. cell text = inner HTML tag-stripped, entity-unescaped,
         whitespace-normalized (the extract_links convention); empty
         cells yield empty strings (the grid position is the datum).

    Returns ``[(table_index, row_index, col_index, is_header, text)]``.
    """
    if not html:
        return []
    html = _COMMENT_RE.sub(" ", html)
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    out: list[tuple[int, int, int, bool, str]] = []
    for t_idx, tm in enumerate(_TABLE_RE.finditer(html)):
        for r_idx, rm in enumerate(_TR_RE.finditer(tm.group(1))):
            for c_idx, cm in enumerate(_CELL_RE.finditer(rm.group(1))):
                out.append(
                    (
                        t_idx,
                        r_idx,
                        c_idx,
                        cm.group(1).lower() == "th",
                        reconstruct_text(
                            tokenize_ws(_strip_tags(cm.group(2)))
                        ),
                    )
                )
    return out


_HEADING_RE = re.compile(
    r"<h([1-6])\b[^>]*>(.*?)</h\1\s*>", re.IGNORECASE | re.DOTALL
)


def extract_headings(html: str) -> list[tuple[int, int, str]]:
    """Extract the heading outline from an HTML payload.

    Spec (frozen):
      1. remove comments, then <script>/<style> (shared convention);
      2. headings = ``<hN>...</hN>`` elements (N in 1..6, matching
         closing level) in document order; ``heading_index`` = 0-based
         ordinal over ALL headings;
      3. text = inner HTML tag-stripped, entity-unescaped,
         whitespace-normalized; headings whose text normalizes to
         empty still consume an index but emit nothing (the
         extract_links skip convention).

    Returns ``[(heading_index, level, text), ...]``.
    """
    if not html:
        return []
    html = _COMMENT_RE.sub(" ", html)
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    out: list[tuple[int, int, str]] = []
    for idx, m in enumerate(_HEADING_RE.finditer(html)):
        text = reconstruct_text(tokenize_ws(_strip_tags(m.group(2))))
        if text:
            out.append((idx, int(m.group(1)), text))
    return out


_PRE_RE = re.compile(r"<pre\b([^>]*)>(.*?)</pre\s*>", re.IGNORECASE | re.DOTALL)
_CODE_OPEN_RE = re.compile(r"^[ \t\r\n\f\x0b]*<code\b[^>]*>", re.IGNORECASE)
_CODE_CLOSE_RE = re.compile(r"</code\s*>[ \t\r\n\f\x0b]*$", re.IGNORECASE)
_LANG_CLASS_RE = re.compile(r"\blanguage-([A-Za-z0-9_+#-]+)", re.IGNORECASE)
_ASCII_TRIM_RE = re.compile(r"^[ \t\r\n\f\x0b]+|[ \t\r\n\f\x0b]+$")


def extract_code_blocks(html: str) -> list[tuple[int, str | None, str]]:
    """Extract code blocks from an HTML payload.

    Spec (frozen):
      1. remove comments (NOT script/style — a <pre> inside neither);
      2. blocks = ``<pre>...</pre>`` elements in document order,
         0-based ``block_index`` over all pre elements (empty blocks
         consume an index but emit nothing — the skip convention);
      3. ``language`` = the first ``language-X`` class token anywhere
         in the element (opening-tag attributes or inner markup),
         lowercased; None when absent;
      4. code = the inner HTML with ONE optional wrapping
         ``<code ...>``/``</code>`` pair stripped, entities unescaped,
         and ASCII whitespace trimmed at both ends — inner whitespace
         is preserved verbatim (code layout is significant; this is
         NOT the whitespace-normalizing text chain).

    Returns ``[(block_index, language, code), ...]``.
    """
    if not html:
        return []
    html = _COMMENT_RE.sub(" ", html)
    out: list[tuple[int, str | None, str]] = []
    for idx, m in enumerate(_PRE_RE.finditer(html)):
        attrs, inner = m.group(1), m.group(2)
        lm = _LANG_CLASS_RE.search(attrs) or _LANG_CLASS_RE.search(inner)
        code = _CODE_OPEN_RE.sub("", inner)
        code = _CODE_CLOSE_RE.sub("", code)
        code = _ASCII_TRIM_RE.sub("", _unescape(code))
        if code:
            out.append((idx, lm.group(1).lower() if lm else None, code))
    return out


_MD_FENCE_RE = re.compile(
    r"^```([^\n]*)\n(.*?)^```[ \t]*(?:\n|$)", re.MULTILINE | re.DOTALL
)
_MD_INFO_RE = re.compile(r"^[ \t]*([A-Za-z0-9_+#-]+)")


def extract_md_fences(text: str) -> list[tuple[int, str | None, str]]:
    """Extract fenced code blocks from a markdown/plain-text payload.

    Spec (frozen; the bounded CommonMark subset a code miner needs):
      1. an opening fence is a line STARTING with ``` (no indent),
         whose remainder is the info string; the block runs to the
         next line starting with ``` (trailing spaces/tabs allowed);
         an unterminated fence yields nothing;
      2. ``language`` = the info string's first
         ``[A-Za-z0-9_+#-]+`` token, lowercased; None when absent;
      3. code = the enclosed lines VERBATIM (no trimming beyond the
         single newline before the closing fence — markdown code
         layout is data); empty blocks consume a ``block_index`` but
         emit nothing (the skip convention).

    Returns ``[(block_index, language, code), ...]``.
    """
    if not text:
        return []
    out: list[tuple[int, str | None, str]] = []
    for idx, m in enumerate(_MD_FENCE_RE.finditer(text)):
        info, body = m.group(1), m.group(2)
        code = body[:-1] if body.endswith("\n") else body
        if not code:
            continue
        lm = _MD_INFO_RE.match(info)
        out.append((idx, lm.group(1).lower() if lm else None, code))
    return out
