"""Golden parser semantics pinned by the reference's own test fixtures.

Each test cites the reference file that fixes the behavior; these are the
fixtures the north rule's span-sequence equality is graded against.
"""

from __future__ import annotations

from srag_spark import golden


# --- P1 whitespace tokenizer (TextPreparatorPipelineSpec.scala:36,45-46) ---
def test_tokenize_pinned_fixture():
    assert golden.tokenize_ws("hello   world\nfrom text") == [
        "hello",
        "world",
        "from",
        "text",
    ]


def test_tokenize_edges():
    assert golden.tokenize_ws("") == []
    assert golden.tokenize_ws("   ") == []
    assert golden.tokenize_ws("  leading and trailing  ") == ["leading", "and", "trailing"]
    assert golden.tokenize_ws("tab\tsep\nnl") == ["tab", "sep", "nl"]
    assert golden.tokenize_ws(None) == []


# --- P4 reconstruction (srag-domain TranscriptSpec golden) ---
def test_reconstruct_pinned_fixture():
    assert golden.reconstruct_text(["Hello,", "world!"]) == "Hello, world!"
    assert (
        golden.reconstruct_text(golden.tokenize_ws("hello   world\nfrom text"))
        == "hello world from text"
    )


# --- P11 HTML boilerplate strip (frozen spec) ---
def test_html_keeps_long_low_link_blocks():
    html = (
        "<html><body><nav><a href='/'>Home</a> <a href='/x'>About</a></nav>"
        "<p>This is the real main content of the page with many words in it.</p>"
        "<div><a href='/a'>one</a> <a href='/b'>two</a> three</div>"
        "</body></html>"
    )
    assert golden.extract_html_blocks(html) == [
        "This is the real main content of the page with many words in it."
    ]


def test_html_link_density_boundary():
    # 9 words, 3 linked → density 1/3 exactly → dropped (strict <)
    html = "<p><a href='x'>a b c</a> d e f g h i</p>"
    assert golden.extract_html_blocks(html) == []
    # 10 words, 3 linked → 0.3 < 1/3 → kept
    html2 = "<p><a href='x'>a b c</a> d e f g h i j</p>"
    assert golden.extract_html_blocks(html2) == ["a b c d e f g h i j"]


def test_html_script_style_comments_stripped():
    html = (
        "<p>Main content sentence with enough words to pass the filter here.</p>"
        "<script>var boilerplate = 'lots of words in script should vanish entirely';</script>"
        "<style>.c { color: red; } /* words words words words words words words */</style>"
        "<!-- comment with plenty of words that must not count at all ever -->"
    )
    assert golden.extract_html_blocks(html) == [
        "Main content sentence with enough words to pass the filter here."
    ]


def test_html_entities_and_whitespace():
    html = "<p>Fish &amp; chips &lt;here&gt; cost   ten&nbsp;pounds in the old shop.</p>"
    assert golden.extract_html_blocks(html) == [
        "Fish & chips <here> cost ten pounds in the old shop."
    ]


def test_html_empty():
    assert golden.extract_html_blocks("") == []
    assert golden.extract_html_blocks("<div></div>") == []


# --- P12 PDF reading order (frozen spec) ---
def test_pdf_two_columns_reading_order():
    payload = "\n".join(
        [
            "1\t72\t100\tleft column first line",
            "1\t72\t112\tleft column second line",
            "1\t320\t100\tright column starts here",
            "1\t72\t400\tleft new paragraph far below",
        ]
    )
    assert golden.parse_pdf_runs(payload) == [
        "left column first line left column second line",
        "left new paragraph far below",
        "right column starts here",
    ]


def test_pdf_pages_sorted():
    payload = "\n".join(
        [
            "2\t72\t50\tsecond page text",
            "1\t72\t50\tfirst page text",
        ]
    )
    assert golden.parse_pdf_runs(payload) == ["first page text", "second page text"]


def test_pdf_malformed_raises():
    import pytest

    with pytest.raises(ValueError):
        golden.parse_pdf_runs("garbage line without tabs")
    assert golden.parse_pdf_runs("") == []


# --- P2 audio segmentation (frozen spec) ---
def test_audio_segments_on_punct_and_gap():
    words = [
        ("hello", 0),
        ("world.", 300),
        ("next", 600),
        ("sentence", 900),
        ("after", 5000),  # 4100ms gap → break
        ("gap", 5300),
    ]
    assert golden.segment_audio_words(words) == [
        "hello world.",
        "next sentence",
        "after gap",
    ]


def test_audio_single_whole_text_span():
    # Whisper degenerate case: one whole-text word at offset 0
    assert golden.segment_audio_words([("the whole transcript text", 0)]) == [
        "the whole transcript text"
    ]


# --- whole-document golden extraction ---
def test_extract_document_interleaved_order():
    spans = [
        {"kind": "text", "text": "alpha beta", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "blob://b/1", "offset": 1},
        {"kind": "audio", "text": "spoken", "media_ref": None, "offset": 2},
        {"kind": "audio", "text": "words.", "media_ref": None, "offset": 3},
        {"kind": "text", "text": "gamma", "media_ref": None, "offset": 4},
    ]
    out, kept, dropped, failures = golden.extract_document(spans)
    assert out == [
        ("text", "alpha", None),
        ("text", "beta", None),
        ("media", None, "blob://b/1"),
        ("audio", "spoken words.", None),
        ("text", "gamma", None),
    ]
    assert (kept, dropped, failures) == (0, 0, 0)


def test_extract_document_unknown_kind_is_failure():
    spans = [{"kind": "glyph", "text": "x", "media_ref": None, "offset": 0}]
    out, kept, dropped, failures = golden.extract_document(spans)
    assert out == [] and failures == 1


def test_extract_document_audio_run_broken_by_media():
    spans = [
        {"kind": "audio", "text": "one", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "m", "offset": 1},
        {"kind": "audio", "text": "two", "media_ref": None, "offset": 2},
    ]
    out, *_ = golden.extract_document(spans)
    assert out == [("audio", "one", None), ("media", None, "m"), ("audio", "two", None)]


# --- P7 recursive chunker (frozen spec) ---
def test_chunker_short_text_single_chunk():
    assert golden.recursive_chunk("chunk zero") == ["chunk zero"]
    assert golden.recursive_chunk("") == []
    assert golden.recursive_chunk("   ") == []


def test_chunker_respects_max_and_overlap():
    text = " ".join(f"word{i:04d}" for i in range(600))  # 600*9-1 chars
    chunks = golden.recursive_chunk(text, max_chars=100, overlap=20)
    assert all(len(c) <= 100 for c in chunks)
    # overlap: each chunk after the first starts with the tail of the previous
    for prev, cur in zip(chunks, chunks[1:]):
        first_word = cur.split(" ")[0]
        assert first_word in prev.split(" ")[-4:]
    # coverage: every word appears
    joined = " ".join(chunks)
    assert all(f"word{i:04d}" in joined for i in range(600))


def test_chunker_megaword_hard_cut():
    text = "x" * 250
    chunks = golden.recursive_chunk(text, max_chars=100, overlap=20)
    assert chunks == ["x" * 100, "x" * 100, "x" * 50]


# --- P8 word-group chunker (QueryService.scala:28-33) ---
def test_word_group_chunks():
    text = " ".join(str(i) for i in range(25))
    chunks = golden.word_group_chunks(text, chunk_size=10)
    assert chunks == [
        " ".join(str(i) for i in range(10)),
        " ".join(str(i) for i in range(10, 20)),
        " ".join(str(i) for i in range(20, 25)),
    ]


# --- fast-path guard tests (entity/tag/anchor prechecks, order fast path) ---
def test_html_uppercase_anchor_counts_link_words():
    # IGNORECASE anchor matching must survive the '<a'/'<A' precheck
    html = "<p><A HREF='x'>a b c</A> d e f g h i</p>"
    assert golden.extract_html_blocks(html) == []  # density 1/3 → dropped
    html2 = "<p><A HREF='x'>a b c</A> d e f g h i j</p>"
    assert golden.extract_html_blocks(html2) == ["a b c d e f g h i j"]


def test_html_entities_inside_anchor():
    # entity unescape inside the anchor fragment (link-word tokenization)
    html = "<p><a href='x'>a&nbsp;b c</a> d e f g h i</p>"
    assert golden.extract_html_blocks(html) == []  # 3 link words of 9


def test_extract_document_unsorted_offsets():
    # out-of-order offsets must be re-sorted (fast path only when sorted)
    spans = [
        {"kind": "text", "text": "gamma", "media_ref": None, "offset": 4},
        {"kind": "text", "text": "alpha beta", "media_ref": None, "offset": 0},
        {"kind": "media", "text": None, "media_ref": "m", "offset": 2},
    ]
    out, *_ = golden.extract_document(spans)
    assert out == [
        ("text", "alpha", None),
        ("text", "beta", None),
        ("media", None, "m"),
        ("text", "gamma", None),
    ]


def test_extract_document_none_offsets_use_position():
    # None offsets fall back to array position; equal offsets tie-break
    # by position (stable)
    spans = [
        {"kind": "text", "text": "one", "media_ref": None, "offset": None},
        {"kind": "text", "text": "two", "media_ref": None, "offset": None},
        {"kind": "text", "text": "zero", "media_ref": None, "offset": 0},
    ]
    out, *_ = golden.extract_document(spans)
    # keys: (None→i=0,0), (None→i=1,1), (0,2) → order: zero? no —
    # offsets None use index i as key: [(0,0),(1,1),(0,2)] → zero sorts
    # with key (0,2) after (0,0): one, zero, two
    assert out == [("text", "one", None), ("text", "zero", None), ("text", "two", None)]


# --- fast-path equivalence (the hot kernel vs the frozen spec) ---
def _spans_strategy():
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs", "Po")),
        max_size=60,
    )
    html_bits = st.sampled_from(
        ["<p>", "</p>", "<div class=x>", "<a href=y>", "</a>", "<script>zz</script>",
         "<!-- c -->", "&amp;", "one two three four five six seven eight nine", "hi "]
    )
    html = st.lists(html_bits, max_size=12).map("".join)
    pdf = st.sampled_from(
        ["1\t10.0\t20.0\thello world", "1\t400.0\t20.0\tright col",
         "2\t10.0\t90.0\tnext page", "broken line", ""]
    )
    kind = st.sampled_from(["text", "html", "pdf", "audio", "media", "junk", None])

    def mk(k, t, h, p, off):
        payload = {"text": t, "html": h, "pdf": p, "audio": t}.get(k, None)
        return {
            "kind": k,
            "text": payload,
            "media_ref": "blob://m" if k == "media" else None,
            "offset": off,
        }

    return st.lists(
        st.builds(mk, kind, text, html, pdf,
                  st.one_of(st.none(), st.integers(0, 5000))),
        max_size=12,
    )


def test_html_kept_blocks_equals_spec_scorer():
    from hypothesis import given, settings

    @settings(max_examples=300, deadline=None)
    @given(_spans_strategy())
    def check(spans):
        for s in spans:
            h = s["text"] or ""
            blocks = golden.score_html_blocks(h)
            exp = ([b.text for b in blocks if b.kept],
                   sum(1 for b in blocks if b.kept),
                   sum(1 for b in blocks if not b.kept))
            assert golden.html_kept_blocks(h) == exp

    check()


def test_run_batched_kernel_equals_per_span_reference():
    """extract_document_cols batches same-kind runs; it must stay
    row-identical to the naive per-span spec composition."""
    from hypothesis import given, settings

    def reference(spans):
        # per-span composition of the frozen stage specs
        order = sorted(
            range(len(spans)),
            key=lambda i: (
                spans[i]["offset"] if spans[i]["offset"] is not None else i, i
            ),
        )
        out, kept, dropped, failures = [], 0, 0, 0
        p = 0
        while p < len(order):
            s = spans[order[p]]
            k = s["kind"]
            if k == "audio":
                run = []
                while p < len(order) and spans[order[p]]["kind"] == "audio":
                    j = order[p]
                    run.append((spans[j]["text"] or "",
                                spans[j]["offset"] if spans[j]["offset"] is not None else 0))
                    p += 1
                out += [("audio", seg, None) for seg in golden.segment_audio_words(run)]
                continue
            if k == "text":
                out += [("text", w, None) for w in golden.tokenize_ws(s["text"] or "")]
            elif k == "html":
                for b in golden.score_html_blocks(s["text"] or ""):
                    if b.kept:
                        out.append(("html", b.text, None))
                        kept += 1
                    else:
                        dropped += 1
            elif k == "pdf":
                try:
                    out += [("pdf", t, None) for t in golden.parse_pdf_runs(s["text"] or "")]
                except (ValueError, TypeError):
                    failures += 1
            elif k == "media":
                out.append(("media", None, s["media_ref"]))
            else:
                failures += 1
            p += 1
        return out, kept, dropped, failures

    @settings(max_examples=300, deadline=None)
    @given(_spans_strategy())
    def check(spans):
        got_spans, k, d, f = golden.extract_document(spans)
        assert (got_spans, k, d, f) == reference(spans)

    check()
