"""Mixture-rate derivation (operators/corpus): temperature scaling vs
a closed-form Python twin, UniMax water-filling vs a brute iterative
waterfiller, budget conservation, edge budgets, and composition with
sample_mixture."""

import math

import pytest

from srag_spark.operators.corpus import (
    mixture_group_stats,
    mixture_rates_dict,
    sample_mixture,
    temperature_mixture_rates,
    unimax_mixture_rates,
)

# (doc_id, text, lang): skewed token distribution over 4 groups
DOCS = [(f"{g}{i}", " ".join(["tok"] * (toks)), g)
        for g, n_docs, toks in
        [("en", 20, 40), ("fr", 6, 30), ("de", 3, 20), ("zh", 1, 10)]
        for i in range(n_docs)]
SIZES = {"en": 20 * 40, "fr": 6 * 30, "de": 3 * 20, "zh": 10}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def _brute_waterfill(budget, cap_per_group):
    pending = sorted((c, g) for g, c in cap_per_group.items())
    rem, alloc = budget, {}
    while pending:
        c, g = pending[0]
        if c * len(pending) <= rem:
            alloc[g] = c
            rem -= c
            pending.pop(0)
        else:
            lam = rem / len(pending)
            for c2, g2 in pending:
                alloc[g2] = min(c2, lam)
            return alloc
    return alloc  # budget >= total capacity: everyone capped


def test_group_stats(spark, docs_df):
    got = {r["lang"]: (r["n_docs"], r["n_tokens"])
           for r in mixture_group_stats(docs_df, "lang").collect()}
    assert got == {"en": (20, 800), "fr": (6, 180), "de": (3, 60),
                   "zh": (1, 10)}


def test_temperature_matches_closed_form(spark, docs_df):
    tau, budget = 3.0, 500.0
    got = {r["lang"]: r for r in temperature_mixture_rates(
        docs_df, budget, temperature=tau, group_col="lang").collect()}
    s = sum(n ** (1 / tau) for n in SIZES.values())
    total = sum(SIZES.values())
    for g, n in SIZES.items():
        q = n ** (1 / tau) / s
        assert got[g]["p_raw"] == pytest.approx(n / total, abs=2e-7)
        assert got[g]["q_target"] == pytest.approx(q, abs=2e-7)
        assert got[g]["alloc_tokens"] == pytest.approx(q * budget, abs=1e-3)
        assert got[g]["epochs"] == pytest.approx(q * budget / n, abs=2e-7)
    # allocations exhaust the budget; T→∞ flattens toward uniform
    assert sum(r["alloc_tokens"] for r in got.values()) == pytest.approx(
        budget, abs=1e-2)
    flat = {r["lang"]: r["q_target"] for r in temperature_mixture_rates(
        docs_df, budget, temperature=1e9, group_col="lang").collect()}
    assert all(abs(v - 0.25) < 1e-3 for v in flat.values())


@pytest.mark.parametrize("budget", [0.0, 100.0, 700.0, 1300.0, 10_000.0])
def test_unimax_matches_brute_waterfill(spark, docs_df, budget):
    cap = 1.5
    caps = {g: cap * n for g, n in SIZES.items()}
    want = _brute_waterfill(budget, caps)
    got = {r["lang"]: r for r in unimax_mixture_rates(
        docs_df, budget, epoch_cap=cap, group_col="lang").collect()}
    for g in SIZES:
        assert got[g]["capacity"] == caps[g]
        assert got[g]["alloc_tokens"] == pytest.approx(want[g], abs=1e-3)
        assert got[g]["epochs"] == pytest.approx(
            want[g] / SIZES[g], abs=2e-7)
    spent = sum(r["alloc_tokens"] for r in got.values())
    assert spent == pytest.approx(min(budget, sum(caps.values())), abs=1e-2)
    assert all(r["epochs"] <= cap + 1e-9 for r in got.values())


def test_unimax_prefers_uniform_over_proportional(spark, docs_df):
    # Budget 400 over capacities (1200, 270, 90, 15): zh/de cap out,
    # en and fr sit at the same water level — unlike proportional
    # sampling, en does NOT dominate.
    got = {r["lang"]: r["alloc_tokens"] for r in unimax_mixture_rates(
        docs_df, 400.0, epoch_cap=1.5, group_col="lang").collect()}
    assert got["zh"] == 15.0 and got["de"] == 90.0
    assert got["en"] == got["fr"] == pytest.approx((400 - 105) / 2, abs=1e-6)


def test_rates_dict_composes_with_sample_mixture(spark, docs_df):
    rates = unimax_mixture_rates(docs_df, 400.0, epoch_cap=1.5,
                                 group_col="lang")
    d = mixture_rates_dict(rates, "lang")
    assert d["zh"] == 1.0 and d["de"] == 1.0  # capped groups keep all
    assert 0 < d["en"] < 1 and 0 < d["fr"] < 1
    out = sample_mixture(docs_df, d, group_col="lang", seed=7)
    kept = {g: 0 for g in SIZES}
    for r in out.select("lang").collect():
        kept[r["lang"]] += 1
    assert kept["zh"] == 1 and kept["de"] == 3  # rate 1.0 keeps all
    assert kept["en"] < 20  # en downsampled (rate ≈ 0.18)


def test_empty_and_overbudget_edges(spark, docs_df):
    empty = docs_df.limit(0)
    assert temperature_mixture_rates(empty, 100.0, group_col="lang").count() == 0
    assert unimax_mixture_rates(empty, 100.0, group_col="lang").count() == 0
    over = unimax_mixture_rates(docs_df, 1e12, epoch_cap=2.0,
                                group_col="lang").collect()
    for r in over:
        assert r["alloc_tokens"] == r["capacity"]
        assert r["epochs"] == pytest.approx(2.0, abs=1e-9)


def test_epochs_dict_composes_with_repeat_epochs(spark, docs_df):
    """UniMax epochs > 1 materialize as real copies through epochs_dict
    → repeat_epochs, and every group's mean copy count tracks its
    (unclamped) epochs while mixture_rates_dict would have clamped."""
    from collections import Counter

    from srag_spark.operators.corpus import epochs_dict, repeat_epochs

    rates = unimax_mixture_rates(docs_df, 1e12, epoch_cap=2.0, group_col="lang")
    e = epochs_dict(rates, "lang")
    assert all(v == pytest.approx(2.0, abs=1e-9) for v in e.values())
    d = mixture_rates_dict(rates, "lang")
    assert all(v == 1.0 for v in d.values())  # the clamp repeat_epochs lifts

    out = repeat_epochs(docs_df, e, group_col="lang", seed=3)
    per_doc = Counter(r["doc_id"] for r in out.select("doc_id").collect())
    n_docs = docs_df.count()
    assert len(per_doc) == n_docs
    # epochs exactly 2.0: every doc gets exactly two copies, no hash draw
    assert set(per_doc.values()) == {2}
