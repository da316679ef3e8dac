"""corpus_profile census and tfidf_keywords extraction.

Hand-computable micro-corpora: the census totals and the exact
duplicate mass are asserted against arithmetic done by eye, and the
TF-IDF ranking against the smoothed-idf formula computed inline.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from srag_spark.operators.textstats import corpus_profile, tfidf_keywords


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_corpus_profile_counts_and_duplicate_mass(spark):
    rows = [
        (1, "alpha beta gamma", "en"),
        (2, "alpha beta gamma", "en"),   # exact dup of 1 (same normalized text)
        (3, "Alpha, beta GAMMA!", "en"), # normalizes to the same fingerprint
        (4, "delta", "en"),
        (5, "eins zwei", "de"),
    ]
    out = {
        r["group"]: r
        for r in corpus_profile(_docs(spark, rows), group_col="lang").collect()
    }
    en = out["en"]
    assert en["n_docs"] == 4
    assert en["n_tokens"] == 3 + 3 + 3 + 1
    assert en["n_distinct"] == 2  # {alpha beta gamma, delta}
    assert en["min_chars"] == len("delta")
    assert en["max_chars"] == len("Alpha, beta GAMMA!")
    assert abs(en["avg_tokens_r"] - 10 / 4) < 1e-9
    de = out["de"]
    assert (de["n_docs"], de["n_tokens"], de["n_distinct"]) == (1, 2, 1)


def test_corpus_profile_group_rows_sorted(spark):
    rows = [(i, "x", lang) for i, lang in enumerate(["fr", "en", "de"])]
    got = [r["group"] for r in corpus_profile(_docs(spark, rows)).collect()]
    assert got == sorted(got)


def test_tfidf_keywords_formula_and_rank(spark):
    # 3 docs; "rare" appears only in doc 1, "common" in all three.
    rows = [
        (1, "rare common common", "en"),
        (2, "common filler words", "en"),
        (3, "common other tokens", "en"),
    ]
    out = tfidf_keywords(_docs(spark, rows), k=2, min_len=3)
    d1 = {r["term"]: r for r in out.filter(F.col("doc_id") == 1).collect()}
    idf = lambda df: round(math.log((3 + 1) / (df + 1)) + 1.0, 6)  # noqa: E731
    assert d1["rare"]["tf"] == 1
    assert abs(d1["rare"]["score_r"] - round(1 * idf(1), 6)) < 1e-9
    assert abs(d1["common"]["score_r"] - round(2 * idf(3), 6)) < 1e-9
    # common (tf 2 · idf 1.0 = 2.0) outranks rare (tf 1 · idf 1.693)
    assert d1["common"]["score_r"] > d1["rare"]["score_r"]


def test_tfidf_keywords_k_bound_and_stopword_drop(spark):
    rows = [(1, "the the the aaa bbb ccc ddd", "en")]
    out = tfidf_keywords(_docs(spark, rows), k=3, min_len=3).collect()
    terms = {r["term"] for r in out}
    assert len(out) == 3
    assert "the" not in terms  # stopword dropped even though tf is highest
    # equal scores → term-asc tie-break picks the lexicographic head
    assert terms == {"aaa", "bbb", "ccc"}


def test_tfidf_keywords_short_tokens_dropped(spark):
    rows = [(1, "ab cd efgh", "en")]
    out = tfidf_keywords(_docs(spark, rows), k=5, min_len=3).collect()
    assert [r["term"] for r in out] == ["efgh"]


def test_corpus_profile_approx_error_bound(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r["group"]: r["n_distinct"] for r in corpus_profile(docs).collect()}
    approx = {
        r["group"]: r["n_distinct_approx"]
        for r in corpus_profile(docs, approx=True, rsd=0.02).collect()
    }
    assert set(approx) == set(exact)
    for g, n in exact.items():
        # HLL++ at rsd=0.02: allow 5 sigma (10%) — deterministic sketch,
        # so this is a regression pin, not a flaky statistical test
        assert abs(approx[g] - n) <= max(2, 0.10 * n), (g, approx[g], n)


def test_corpus_profile_approx_is_single_pass(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan_exact = corpus_profile(docs)._jdf.queryExecution().executedPlan().toString()
    plan_approx = corpus_profile(docs, approx=True)._jdf.queryExecution().executedPlan().toString()
    n_ex = plan_exact.count("Exchange")
    n_ap = plan_approx.count("Exchange")
    # exact needs the extra fingerprint-keyed expand shuffle; approx
    # folds the HLL sketch into the one group-keyed combiner pass
    assert n_ap < n_ex, (n_ap, n_ex)


def test_length_quantiles_exact_and_approx(spark):
    from srag_spark.operators.textstats import corpus_length_quantiles

    rows = [(i, " ".join(["w"] * n), "en") for i, n in enumerate([1, 2, 3, 4, 100])]
    exact = corpus_length_quantiles(_docs(spark, rows)).collect()[0]
    assert exact["n_docs"] == 5
    assert abs(exact["p50_r"] - 3.0) < 1e-9           # median of 1,2,3,4,100
    assert abs(exact["p90_r"] - 61.6) < 1e-9          # 4 + 0.6*(100-4)
    approx = corpus_length_quantiles(
        _docs(spark, rows), approx=True
    ).collect()[0]
    # GK at default accuracy on 5 rows: lands on an actual value near the rank
    assert approx["p50_approx"] in (2.0, 3.0)
    assert approx["p99_approx"] == 100.0


def test_length_quantiles_approx_close_on_real_data(spark):
    from srag_spark.operators.textstats import corpus_length_quantiles

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r["group"]: r for r in corpus_length_quantiles(docs).collect()}
    approx = {
        r["group"]: r
        for r in corpus_length_quantiles(docs, approx=True).collect()
    }
    for g in exact:
        for p in ("50", "90", "99"):
            e, a = exact[g][f"p{p}_r"], approx[g][f"p{p}_approx"]
            assert abs(a - e) <= max(2.0, 0.05 * e), (g, p, e, a)


def test_new_census_ops_are_partition_independent(spark):
    """Engine-independence pin: census, quantile (exact), and TF-IDF
    results must not change with input partitioning."""
    from srag_spark.operators.textstats import (
        corpus_length_quantiles,
        corpus_profile,
        tfidf_keywords,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (
        corpus_profile,
        corpus_length_quantiles,
        lambda d: tfidf_keywords(d, k=3),
    ):
        a = sorted(map(str, op(docs.repartition(1)).collect()))
        b = sorted(map(str, op(docs.repartition(13)).collect()))
        assert a == b


def test_pmi_pairs_hand_computed(spark):
    from srag_spark.operators.textstats import pmi_pairs

    # corpus: "new york" appears 3x and its words appear ONLY together;
    # "the cat" words also co-occur but "the" is everywhere
    docs = spark.createDataFrame(
        [
            (0, "new york new york the cat"),
            (1, "new york the dog the cat"),
            (2, "the cat the dog the bird"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["word_a"], r["word_b"]): (r["n_pair"], r["pmi_r"])
        for r in pmi_pairs(docs, k=10, min_count=2).collect()
    }
    # totals: 6 + 6 + 6 = 18 unigram positions, 15 bigram positions
    n_uni, n_big = 18.0, 15.0
    c = {"new": 3, "york": 3, "the": 5, "cat": 3, "dog": 2, "bird": 1}
    ny = out[("new", "york")]
    assert ny[0] == 3
    assert ny[1] == pytest.approx(
        math.log(3 * n_uni * n_uni / (n_big * c["new"] * c["york"])), abs=1e-6
    )
    tc = out[("the", "cat")]
    assert tc[0] == 3
    # "new york" is the tighter collocation despite equal pair count
    assert ny[1] > tc[1]
    # min_count prunes singleton pairs
    assert ("the", "bird") not in out


def test_pmi_pairs_deterministic_order_and_empty(spark):
    from srag_spark.operators.textstats import pmi_pairs

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha beta gamma delta gamma delta")],
        "doc_id long, text string",
    )
    rows = pmi_pairs(docs, k=10, min_count=2).collect()
    keys = [(r["pmi_r"], r["word_a"], r["word_b"]) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pmi_pairs(empty, k=5).count() == 0


def test_pmi_pairs_null_text_contributes_nothing(spark):
    from srag_spark.operators.textstats import pmi_pairs

    base = [(0, "new york new york"), (1, "new york new york")]
    with_null = base + [(2, None), (3, None)]
    a = pmi_pairs(
        spark.createDataFrame(base, "doc_id long, text string"), k=5, min_count=2
    ).collect()
    b = pmi_pairs(
        spark.createDataFrame(with_null, "doc_id long, text string"),
        k=5, min_count=2,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
