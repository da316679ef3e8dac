"""Unigram-LM perplexity scoring (textstats.lm_perplexity) — the
CCNet-class quality signal: add-alpha smoothed unigram model over the
corpus's own top-K vocabulary, per-doc cross-entropy/perplexity.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from srag_spark.operators.textstats import lm_perplexity

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_probabilities(spark):
    """3-doc corpus small enough to verify the math by hand."""
    docs = _df(spark, [(1, "a a b"), (2, "a b c"), (3, "")])
    # counts: a=3, b=2, c=1; N=6; vocab_k=2 -> {a, b}, V=2
    # denom = 6 + 0.5*(2+1) = 7.5
    # p(a)=3.5/7.5, p(b)=2.5/7.5, p(OOV c)=0.5/7.5
    out = {r["doc_id"]: r.asDict() for r in
           lm_perplexity(docs, vocab_k=2, alpha=0.5).collect()}
    pa, pb, poov = 3.5 / 7.5, 2.5 / 7.5, 0.5 / 7.5
    h1 = -(2 * math.log2(pa) + math.log2(pb)) / 3
    h2 = -(math.log2(pa) + math.log2(pb) + math.log2(poov)) / 3
    assert out[1]["cross_entropy_r"] == pytest.approx(round(h1, 4))
    assert out[2]["cross_entropy_r"] == pytest.approx(round(h2, 4))
    assert out[1]["ppl_r"] == pytest.approx(round(2**h1, 3))
    # OOV doc is strictly higher-perplexity than the in-vocab doc
    assert out[2]["ppl_r"] > out[1]["ppl_r"]
    # zero-token doc: counted, not scored
    assert out[3]["n_tokens"] == 0
    assert out[3]["cross_entropy_r"] is None and out[3]["ppl_r"] is None


def test_vocab_cutoff_is_deterministic(spark):
    """Ties at the vocab boundary break by token asc — 'b' (count 1)
    enters a K=2 vocab over {a:2, b:1, c:1}, 'c' stays OOV."""
    docs = _df(spark, [(1, "a a b c")])
    out = lm_perplexity(docs, vocab_k=2, alpha=0.5).collect()[0]
    # denom = 4 + 0.5*3 = 5.5; p(a)=2.5/5.5 p(b)=1.5/5.5 p(c oov)=0.5/5.5
    h = -(2 * math.log2(2.5 / 5.5) + math.log2(1.5 / 5.5)
          + math.log2(0.5 / 5.5)) / 4
    assert out["cross_entropy_r"] == pytest.approx(round(h, 4))


def test_low_perplexity_head_is_the_quality_signal(spark):
    """CCNet keeps the low-perplexity head: a doc made of corpus-typical
    tokens scores lower ppl than one of rare tokens."""
    docs = _df(
        spark,
        [(i, "the table scan reads the sorted key range") for i in range(8)]
        + [(99, "zyx qwv jkl pnm zyx qwv jkl pnm")],
    )
    out = {r["doc_id"]: r["ppl_r"] for r in
           lm_perplexity(docs, vocab_k=8, alpha=0.5).collect()}
    assert out[0] < out[99]


def test_entry_matches_duckdb_oracle(spark):
    """Cross-engine check of the driver entry at sf0.001."""
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["lm_ppl"](spark, SF_DIR)
    srows = {r["doc_id"]: (r["n_tokens"], r["cross_entropy_r"], r["ppl_r"])
             for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    orows = {r[0]: tuple(r[1:]) for r in con.execute(
        "SELECT doc_id, n_tokens, cross_entropy_r, ppl_r FROM ("
        + entrymod.oracle_sql()["lm_ppl"] + ")"
    ).fetchall()}
    assert set(srows) == set(orows)
    for k in srows:
        assert srows[k][0] == orows[k][0], k
        assert srows[k][1] == pytest.approx(orows[k][1]), k
        assert srows[k][2] == pytest.approx(orows[k][2]), k
    # the small-K vocab leaves genuine OOV mass in play
    assert len({v[1] for v in srows.values()}) > 1
