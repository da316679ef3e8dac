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
