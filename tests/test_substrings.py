"""Exact substring dedup (operators/substrings) vs a brute-force
Python twin — census counts, token mass, positions, and the
keep-first-occurrence strip, over a hand corpus with exact copies,
partial overlaps, short docs, and whitespace noise."""

import hashlib

import pytest

from srag_spark.operators.substrings import (
    duplicate_window_flags,
    strip_duplicate_spans,
)

N = 4

DOCS = [
    ("d1", "a b c d e f g h"),
    ("d2", "x y a b c d e q r s"),
    ("d3", "p q r"),  # shorter than N: zero windows, always clean
    ("d4", "a b c d e f g h"),  # exact copy of d1
    ("d5", "one  two\tthree a b c d e zz"),  # whitespace runs collapse
    ("d6", ""),
    ("d7", "m m m m m m m m m m"),  # self-repeating windows within one doc
]


def _toks(t):
    return [w for w in t.split() if w]


def _brute_windows():
    wins = {}
    for d, t in DOCS:
        tk = _toks(t)
        for p in range(max(0, len(tk) - N + 1)):
            h = hashlib.md5(" ".join(tk[p : p + N]).encode()).hexdigest()
            wins.setdefault(h, []).append((d, p))
    return wins


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_duplicate_window_flags_matches_brute(spark, docs_df):
    dups = {h: o for h, o in _brute_windows().items() if len(o) >= 2}
    got = {
        r["doc_id"]: r
        for r in duplicate_window_flags(docs_df, n=N, positions=True).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for d, t in DOCS:
        tk = _toks(t)
        ps = sorted(p for occ in dups.values() for (dd, p) in occ if dd == d)
        cov = set()
        for p in ps:
            cov.update(range(p, p + N))
        g = got[d]
        assert g["n_windows"] == max(0, len(tk) - N + 1)
        assert g["dup_windows"] == len(ps)
        assert g["dup_tokens"] == len(cov)
        assert list(g["dup_positions"]) == ps


def test_strip_matches_brute_and_keeps_first(spark, docs_df):
    dups = {h: o for h, o in _brute_windows().items() if len(o) >= 2}
    cuts = {}
    for occ in dups.values():
        first = min(occ)
        for o in occ:
            if o != first:
                cuts.setdefault(o[0], []).append(o[1])
    got = {
        r["doc_id"]: r for r in strip_duplicate_spans(docs_df, n=N).collect()
    }
    for d, t in DOCS:
        tk = _toks(t)
        cov = set()
        for p in cuts.get(d, []):
            cov.update(range(p, p + N))
        kept = [w for i, w in enumerate(tk) if i not in cov]
        g = got[d]
        assert g["text"] == " ".join(kept)
        assert g["n_tokens"] == len(tk)
        assert g["n_removed"] == len(tk) - len(kept)
    # d1 is the corpus-wide first occurrence of the shared block: intact.
    assert got["d1"]["n_removed"] == 0 and got["d1"]["text"] == DOCS[0][1]
    # its exact copy d4 loses everything.
    assert got["d4"]["text"] == "" and got["d4"]["n_removed"] == 8


def test_strip_reconstructed_corpus_has_no_duplicate_windows(spark, docs_df):
    stripped = strip_duplicate_spans(docs_df, n=N).select("doc_id", "text")
    # Idempotence-ish guarantee of the paper's rule: after cutting all
    # non-first occurrences, no window may still repeat corpus-wide
    # (new windows can form at cut seams, but on this corpus they don't).
    flags = duplicate_window_flags(stripped, n=N).collect()
    assert all(r["dup_windows"] == 0 for r in flags)


def test_min_count_threshold(spark, docs_df):
    # min_count=3: windows occurring only in the d1/d4 pair (2×) drop
    # out; "a b c d" / "b c d e" (also in d2 and d5, 4× corpus-wide)
    # and d7's self-repeating window ("m m m m" × 7 starts) remain.
    got = {
        r["doc_id"]: r
        for r in duplicate_window_flags(docs_df, n=N, min_count=3).collect()
    }
    assert got["d1"]["dup_windows"] == 2
    assert got["d4"]["dup_windows"] == 2
    assert got["d7"]["dup_windows"] == 7


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_randomized_corpus_matches_brute(spark, seed):
    """Randomized corpora from a 6-token vocabulary (dense window
    collisions: adjacent, overlapping, self-repeating) — census and
    strip both equal the brute-force twin on every doc."""
    import random

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "e", "f"]
    docs = [
        (f"d{i}", " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(60)
    ]
    n = 3
    wins = {}
    for d, t in docs:
        tk = t.split()
        for p in range(max(0, len(tk) - n + 1)):
            h = " ".join(tk[p : p + n])
            wins.setdefault(h, []).append((d, p))
    dups = {h: o for h, o in wins.items() if len(o) >= 2}

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    flags = {r["doc_id"]: r for r in
             duplicate_window_flags(df, n=n, positions=True).collect()}
    strip = {r["doc_id"]: r for r in
             strip_duplicate_spans(df, n=n).collect()}

    cuts = {}
    for occ in dups.values():
        first = min(occ)
        for o in occ:
            if o != first:
                cuts.setdefault(o[0], []).append(o[1])
    for d, t in docs:
        tk = t.split()
        ps = sorted(p for occ in dups.values() for (dd, p) in occ if dd == d)
        cov = set()
        for p in ps:
            cov.update(range(p, p + n))
        f = flags[d]
        assert (f["n_windows"], f["dup_windows"], f["dup_tokens"]) == (
            max(0, len(tk) - n + 1), len(ps), len(cov)), d
        assert list(f["dup_positions"]) == ps, d
        cut_cov = set()
        for p in cuts.get(d, []):
            cut_cov.update(range(p, p + n))
        kept = [w for i, w in enumerate(tk) if i not in cut_cov]
        s = strip[d]
        assert s["text"] == " ".join(kept), d
        assert s["n_removed"] == len(cut_cov), d
