"""Property-based invariants for the frozen golden kernels (pure Python,
no SparkSession) — the invariant style backing the P7 oracle:

* every chunk fits ``max_chars`` and is non-empty;
* the first chunk is a prefix of the normalized text;
* consecutive chunks carry exactly the overlap suffix computed by the
  frozen tail rule, and de-overlapped concatenation round-trips to the
  normalized text (on inputs whose atoms fit ``max_chars - overlap``,
  i.e. no mega-word hard cut is involved);
* word-group chunks partition the token stream exactly.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from srag_spark import golden


def _overlap_tail(chunk: str, overlap: int) -> str:
    """The frozen tail rule from golden.recursive_chunk: the longest
    suffix of whole words of ``chunk`` whose joined length fits
    ``overlap``."""
    tail_words: list[str] = []
    tail_len = 0
    for w in reversed(chunk.split(" ")):
        extra = len(w) + (1 if tail_words else 0)
        if tail_len + extra > overlap:
            break
        tail_words.append(w)
        tail_len += extra
    return " ".join(reversed(tail_words))


_word = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
    min_size=1,
    max_size=8,
)
# sentences are the level-2 atoms; keeping each well under
# max_chars - overlap guarantees the greedy packer never needs a
# mega-word hard cut, so the exact round-trip invariant applies
_sentence = st.lists(_word, min_size=1, max_size=4).map(
    lambda ws: " ".join(ws) + "."
)
_doc = st.lists(_sentence, min_size=0, max_size=60).map(" ".join)

MAX_CHARS = 100
OVERLAP = 20


@settings(max_examples=300, deadline=None)
@given(_doc)
def test_chunker_invariants_roundtrip(text):
    norm = golden.reconstruct_text(golden.tokenize_ws(text))
    chunks = golden.recursive_chunk(text, max_chars=MAX_CHARS, overlap=OVERLAP)

    # universal invariants
    assert all(chunks), "no empty chunks"
    assert all(len(c) <= MAX_CHARS for c in chunks)
    if not norm:
        assert chunks == []
        return
    assert chunks[0] == norm[: len(chunks[0])], "first chunk is a norm prefix"

    # overlap + round-trip (no hard cut possible: every sentence atom is
    # far shorter than MAX_CHARS - OVERLAP by construction)
    rebuilt = ""
    for i, c in enumerate(chunks):
        if i == 0:
            rebuilt = c
            continue
        prefix = _overlap_tail(chunks[i - 1], OVERLAP)
        if prefix:
            assert c == prefix or c.startswith(prefix + " "), (
                "chunk must start with the previous chunk's overlap tail"
            )
            body = c[len(prefix) :].lstrip(" ")
        else:
            body = c
        if body:
            rebuilt = rebuilt + " " + body
    assert rebuilt == norm


@settings(max_examples=200, deadline=None)
@given(_doc)
def test_chunker_matches_single_chunk_fastpath(text):
    norm = golden.reconstruct_text(golden.tokenize_ws(text))
    chunks = golden.recursive_chunk(text, max_chars=10_000, overlap=200)
    assert chunks == ([norm] if norm else [])


# coordinates on a 0.001 grid so the "%.3f" payload encoding is exact
# (the property compares against a sort on the ORIGINAL values)
_pdf_run = st.tuples(
    st.integers(1, 3),                                   # page
    st.integers(0, 612_000).map(lambda v: v / 1000),     # x
    st.integers(0, 792_000).map(lambda v: v / 1000),     # y
    st.lists(_word, min_size=1, max_size=4).map(" ".join),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_pdf_run, max_size=25))
def test_pdf_parse_preserves_words_in_reading_order(runs):
    payload = "\n".join(
        f"{p}\t{x:.3f}\t{y:.3f}\t{t}" for p, x, y, t in runs
    )
    paras = golden.parse_pdf_runs(payload)
    got = [w for para in paras for w in para.split(" ")]
    # expected word stream: runs sorted by (page, column, y, x, input pos)
    ordered = sorted(
        enumerate(runs),
        key=lambda e: (
            e[1][0],
            0 if e[1][1] < golden.PDF_COLUMN_SPLIT_X else 1,
            e[1][2],
            e[1][1],
            e[0],
        ),
    )
    want = [w for _, (_p, _x, _y, t) in ordered for w in t.split()]
    assert got == want
    assert all(paras), "no empty paragraphs"


_audio_word = st.tuples(
    st.lists(_word, min_size=1, max_size=2).map(" ".join).map(
        lambda w: w + "." if len(w) % 3 == 0 else w
    ),
    st.integers(0, 40_000),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_audio_word, max_size=30))
def test_audio_segments_concat_and_boundaries(words):
    segs = golden.segment_audio_words(words)
    nonempty = [(t, o) for t, o in words if t]
    # word stream preserved in order
    assert " ".join(segs).split(" ") == (
        " ".join(t for t, _ in nonempty).split(" ") if nonempty else [""]
    ) or (not nonempty and segs == [])
    # segment count = boundary count + 1 (boundary: prev ends in
    # sentence punctuation, or offset gap exceeds AUDIO_GAP_MS)
    if nonempty:
        boundaries = sum(
            1
            for (pt, po), (_t, o) in zip(nonempty, nonempty[1:])
            if pt[-1] in golden.AUDIO_SENTENCE_END
            or o - po > golden.AUDIO_GAP_MS
        )
        assert len(segs) == boundaries + 1


def _span_row(kind, text, off):
    return {
        "kind": kind,
        "text": text if kind in ("text", "audio", "html", "pdf") else None,
        "media_ref": "blob://m" if kind == "media" else None,
        "offset": off,
    }


_kernel_spans = st.lists(
    st.builds(
        _span_row,
        st.sampled_from(["text", "audio", "media", "junk"]),
        st.lists(_word, max_size=3).map(" ".join),
        st.one_of(st.none(), st.integers(0, 3000)),
    ),
    max_size=24,
)


@settings(max_examples=300, deadline=None)
@given(_kernel_spans, st.integers(1, 8))
def test_salted_slice_kernel_equals_whole_doc(spans, target):
    """The salted-path law, pure-Python: global-order the spans, slice at
    audio-run-safe bounds, run the kernel per slice with assume_sorted,
    concatenate — must equal the whole-doc kernel output (the invariant
    the Spark mega-doc path relies on, incl. null/unsorted offsets)."""
    from srag_spark.operators.parse import slice_spans

    cols = lambda ss: (  # noqa: E731
        [s["kind"] for s in ss],
        [s["text"] for s in ss],
        [s["media_ref"] for s in ss],
        [s["offset"] for s in ss],
    )
    whole = golden.extract_document_cols(*cols(spans))

    order = sorted(
        range(len(spans)),
        key=lambda i: (
            spans[i]["offset"] if spans[i]["offset"] is not None else i,
            i,
        ),
    )
    ordered = [spans[i] for i in order]
    ok: list = []
    ot: list = []
    om: list = []
    kept = dropped = fails = 0
    for sl in slice_spans(ordered, target):
        k, t, m, kk, dd, ff = golden.extract_document_cols(
            *cols(sl), assume_sorted=True
        )
        ok.extend(k)
        ot.extend(t)
        om.extend(m)
        kept += kk
        dropped += dd
        fails += ff
    assert (ok, ot, om, kept, dropped, fails) == whole


@settings(max_examples=200, deadline=None)
@given(st.lists(_word, max_size=50), st.integers(1, 7))
def test_word_group_chunks_partition_tokens(words, size):
    text = "  ".join(words)
    chunks = golden.word_group_chunks(text, chunk_size=size)
    toks = golden.tokenize_ws(text)
    # chunks partition the token stream in order, each group ≤ size
    regrouped: list[str] = []
    for c in chunks:
        got = c.split(" ")
        assert len(got) <= size
        regrouped.extend(got)
    assert regrouped == toks or (toks == [] and chunks == [])


@settings(max_examples=200, deadline=None)
@given(st.lists(_audio_word, max_size=30))
def test_audio_segments_timed_matches_untimed(words):
    """segment_audio_words_timed segments IDENTICALLY to
    segment_audio_words; its times are the first/last word start offsets
    of each segment (the only offsets the input carries)."""
    timed = golden.segment_audio_words_timed(words)
    assert [t for t, _s, _e in timed] == golden.segment_audio_words(words)
    nonempty = [(t, o) for t, o in words if t]
    # segments partition the nonempty entries in order; greedily consume
    # entries per segment (joining another entry strictly lengthens the
    # text, so the match point is unique) and check the ms bounds
    pos = 0
    for seg_text, t0, t1 in timed:
        taken: list[str] = []
        offs: list[int] = []
        while " ".join(taken) != seg_text:
            taken.append(nonempty[pos][0])
            offs.append(nonempty[pos][1])
            pos += 1
        assert t0 == offs[0] and t1 == offs[-1]
    assert pos == len(nonempty)
