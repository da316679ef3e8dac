"""DSIR importance weighting (selection.dsir_weights) — hashed
unigram+bigram log-likelihood ratio of target vs raw distributions
(Xie et al. 2023, public spec).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from srag_spark.operators.selection import dsir_weights

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _feats(text):
    w = text.split()
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _bucket(feat, hc):
    return hashlib.md5(feat.encode()).hexdigest()[:hc]


def _expected_logw(doc, target_texts, raw_texts, hc=2, alpha=1.0):
    """Reference implementation in plain Python."""
    b_space = 16 ** hc
    tc, rc = {}, {}
    for txts, acc in ((target_texts, tc), (raw_texts, rc)):
        for t in txts:
            for f in _feats(t):
                b = _bucket(f, hc)
                acc[b] = acc.get(b, 0) + 1
    td = sum(tc.values()) + alpha * b_space
    rd = sum(rc.values()) + alpha * b_space
    logw = 0.0
    for f in _feats(doc):
        b = _bucket(f, hc)
        logw += math.log((tc.get(b, 0) + alpha) / td)
        logw -= math.log((rc.get(b, 0) + alpha) / rd)
    return round(logw, 4)


def test_matches_python_reference(spark):
    raw = [(1, "the cat sat"), (2, "stocks rallied sharply today"),
           (3, "the cat purred")]
    target = [(10, "the cat sat on the mat"), (11, "the cat napped")]
    out = {r["doc_id"]: r for r in dsir_weights(
        _df(spark, raw), _df(spark, target), hash_chars=2
    ).collect()}
    raw_texts = [t for _, t in raw]
    tgt_texts = [t for _, t in target]
    for did, txt in raw:
        assert out[did]["n_feats"] == len(_feats(txt))
        assert out[did]["logw_r"] == pytest.approx(
            _expected_logw(txt, tgt_texts, raw_texts), abs=1e-4
        ), did


def test_target_like_scores_higher(spark):
    """The DSIR signal: a target-like doc outweighs an off-domain doc."""
    raw = [(1, "the cat sat on the mat"),
           (2, "quarterly earnings guidance revised downward")]
    target = [(10, "the cat sat quietly"), (11, "a cat on a mat")]
    out = {r["doc_id"]: r["logw_r"] for r in dsir_weights(
        _df(spark, raw), _df(spark, target)
    ).collect()}
    assert out[1] > out[2]


def test_empty_doc_gets_zero_weight(spark):
    raw = [(1, "the cat sat"), (2, "")]
    out = {r["doc_id"]: r for r in dsir_weights(
        _df(spark, raw), _df(spark, [(10, "the cat")])
    ).collect()}
    assert out[2]["n_feats"] == 0
    assert out[2]["logw_r"] == 0.0


def test_single_word_doc_has_no_bigrams(spark):
    out = dsir_weights(
        _df(spark, [(1, "hello")]), _df(spark, [(10, "hello world")])
    ).collect()[0]
    assert out["n_feats"] == 1


def test_partitioning_invariance(spark):
    """Weights are a pure function of content: repartitioning the raw
    pool changes nothing (the sum order sensitivity stays under the
    round-4 reporting precision)."""
    raw = [(i, f"doc number {i} talks about the cat and topic {i % 7}")
           for i in range(50)]
    target = [(100 + i, "the cat sat on the mat") for i in range(5)]
    a = {r["doc_id"]: r["logw_r"] for r in dsir_weights(
        _df(spark, raw), _df(spark, target)
    ).collect()}
    b = {r["doc_id"]: r["logw_r"] for r in dsir_weights(
        _df(spark, raw).repartition(13), _df(spark, target)
    ).collect()}
    assert a == b


def test_entry_matches_duckdb_oracle(spark):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["dsir_weights"](spark, SF_DIR)
    srows = {r["doc_id"]: (r["n_feats"], r["logw_r"]) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    orows = {r[0]: (r[1], r[2]) for r in con.execute(
        entrymod.oracle_sql()["dsir_weights"]
    ).fetchall()}
    assert set(srows) == set(orows)
    for k in srows:
        assert srows[k][0] == orows[k][0], k
        assert srows[k][1] == pytest.approx(orows[k][1], abs=1e-4), k
    # weights genuinely separate: multiple distinct values
    assert len({v[1] for v in srows.values()}) > 10
