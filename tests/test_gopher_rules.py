"""Gopher document-shape quality rules (textstats.gopher_rules) —
Rae et al. 2021 appendix A heuristics as native column expressions.
"""

from __future__ import annotations

import duckdb
import pytest

from srag_spark.operators.textstats import gopher_rules

SF_DIR = "/root/testdata/sf0.001"

# 12 words, all alphabetic, stopwords {the, of}: passes every default
# rule except the 50-word floor — tests pass min_words=10
GOOD = "the careful reader of this fine report will notice the steady progress"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    kw.setdefault("min_words", 10)
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(_df(spark, rows), **kw).collect()
    }


def test_good_doc_keeps(spark):
    out = _run(spark, [(1, GOOD)])[1]
    assert out["keep"] is True
    assert out["n_words"] == 12
    assert out["n_stopwords"] == 2
    assert out["alpha_frac_r"] == 1.0


def test_word_count_bounds(spark):
    out = _run(spark, [(1, "too few words here")])
    assert out[1]["keep"] is False  # 4 < min_words=10


def test_mean_word_length(spark):
    short = " ".join(["a"] * 20) + " the of"  # mean len ~1
    out = _run(spark, [(1, short)])[1]
    assert out["mean_word_len_r"] < 3.0 and out["keep"] is False


def test_symbol_ratio(spark):
    doc = GOOD + " # # ... # ..."
    out = _run(spark, [(1, doc)])[1]
    # 3 hashes + 2 ellipses over 17 words = 0.294 > 0.1
    assert out["symbol_ratio_r"] == pytest.approx(round(5 / 17, 4))
    assert out["keep"] is False


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join([GOOD] + ["- item number %d ok" % i for i in range(19)])
    out = _run(spark, [(1, bullets)])[1]
    assert out["bullet_frac_r"] == pytest.approx(0.95)
    assert out["keep"] is False

    ells = "\n".join([GOOD, "wait for it...", "and more..."])
    out = _run(spark, [(2, ells)])[2]
    assert out["ellipsis_frac_r"] == pytest.approx(round(2 / 3, 4))
    assert out["keep"] is False


def test_alpha_fraction_and_stopwords(spark):
    nums = GOOD + " " + " ".join(["123"] * 8)  # 8/20 words non-alpha
    out = _run(spark, [(1, nums)])[1]
    assert out["alpha_frac_r"] == pytest.approx(0.6)
    assert out["keep"] is False

    nostop = "every careful reader notices steady progress during " \
             "long winter evenings spent reading"
    out = _run(spark, [(2, nostop)])[2]
    assert out["n_stopwords"] == 0 and out["keep"] is False


def test_stopword_count_is_distinct(spark):
    doc = "the " * 30 + "fine report"  # 'the' repeated counts once
    out = _run(spark, [(1, doc)])[1]
    assert out["n_stopwords"] == 1


def test_empty_doc(spark):
    out = _run(spark, [(1, "")])[1]
    assert out["n_words"] == 0
    assert out["mean_word_len_r"] is None
    assert out["keep"] is False


def test_entry_matches_duckdb_oracle(spark):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["gopher_rules"](spark, SF_DIR)
    srows = {r["doc_id"]: tuple(r)[1:] for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    orows = {r[0]: r[1:] for r in con.execute(
        entrymod.oracle_sql()["gopher_rules"]
    ).fetchall()}
    assert set(srows) == set(orows)
    for k in srows:
        assert srows[k] == pytest.approx(orows[k]), k
    keeps = {v[-1] for v in srows.values()}
    assert keeps == {True, False}
