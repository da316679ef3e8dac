"""Composed curation pipeline: gates + exact dedup + near-dup
suppression must each demonstrably act (plans/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.plans.curation import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the hills "
    "in the morning light for a long time with many friends of the forest"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_stages(spark):
    rows = [
        (1, GOOD),                       # survives
        (2, GOOD),                       # exact dup of 1 → dropped (canonical=1)
        (3, GOOD + " extra"),            # near-dup of 1 → dropped (3 > 1)
        (4, "zzz qqq xxx"),              # fails quality gate (short, no stopwords)
        (5, "der die und das nicht ist ein zu der die und das nicht ist "
            "ein zu der die und das nicht ist ein zu der die und das "
            "nicht ist ein zu der die und das nicht ist ein zu der die "
            "und das nicht ist ein zu der die und das nicht ist ein zu "
            "der die und das nicht ist ein zu der die und das nicht ist "
            "ein zu der die und das nicht ist ein zu"),  # German → lang gate
        (6, "a completely different document about cooking pasta with "
            "tomato sauce and fresh basil leaves from the garden in the "
            "summer of that year when the harvest was plentiful and the "
            "kitchen was full of the aroma of the simmering pots"),
    ]
    out = curate_corpus(
        _df(spark, rows),
        lang_whitelist=("en",),
        min_quality=0.4,
        jaccard_tau=0.5,
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 6}


def test_curate_corpus_keeps_min_id_of_neardup_pair(spark):
    rows = [(10, GOOD), (20, GOOD + " tail")]
    out = curate_corpus(
        _df(spark, rows), lang_whitelist=("en",), min_quality=0.0
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {10}


def test_curate_corpus_output_columns(spark):
    out = curate_corpus(_df(spark, [(1, GOOD)]), lang_whitelist=("en",))
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "text",
        "pred_lang",
        "quality_r",
    ]
    row = out.collect()[0]
    assert row["pred_lang"] == "en" and row["quality_r"] > 0.4


def test_cluster_canonical_transitive_closure(spark):
    """Chain + pointer-jump shapes: canonical = min id of the whole
    connected component, even across hops; singletons absent from pairs
    are not emitted."""
    from srag_spark.operators.dedup import cluster_canonical

    pairs = spark.createDataFrame(
        [(1, 5), (3, 5),          # component {1,3,5} via hub 5
         (2, 9), (9, 11), (11, 40),   # chain {2,9,11,40}
         (7, 8)],                 # simple pair
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["canonical_id"] for r in cluster_canonical(pairs).collect()
    }
    assert got == {
        1: 1, 3: 1, 5: 1,
        2: 2, 9: 2, 11: 2, 40: 2,
        7: 7, 8: 7,
    }


def test_curate_corpus_cc_vs_greedy_on_chain_cluster(spark):
    """The shape where the two modes differ: docs 1—5—3 pairwise-similar
    through hub 5 only (1 !~ 3 directly).  Greedy drops only greater-ids
    of pairs {5}, keeping 1 AND 3; CC keeps exactly the component min 1."""
    other = (
        "the scientists measured the temperature of the ocean water near "
        "the coral reef every single day during the long expedition "
        "across the southern sea"
    )
    rows = [
        (1, GOOD),                # ~ hub via its first half
        (5, GOOD + " " + other),  # hub: shares half with 1, half with 3
        (3, other),               # ~ hub via its second half; 1 !~ 3
        (6, "a completely different document about cooking pasta with "
            "tomato sauce and fresh basil leaves from the garden in the "
            "summer of that year when the harvest was plentiful and the "
            "kitchen was full of the aroma of the simmering pots"),
    ]
    # est_jaccard (16 hashes, 8 bands — deterministic): (1,5)=0.4375,
    # (3,5)=0.5625, (1,3) not even an LSH candidate
    kw = dict(
        lang_whitelist=("en", "und"), min_quality=0.0,
        n_hashes=16, bands=8, jaccard_tau=0.4,
    )
    greedy = {
        r["doc_id"]
        for r in curate_corpus(_df(spark, rows), dedup_mode="greedy", **kw).collect()
    }
    cc = {
        r["doc_id"]
        for r in curate_corpus(_df(spark, rows), dedup_mode="cc", **kw).collect()
    }
    assert 5 not in greedy and 5 not in cc and 6 in greedy and 6 in cc
    assert 1 in greedy and 1 in cc
    # the over-keep: greedy retains 3; CC collapses the whole cluster to 1
    assert 3 in greedy and 3 not in cc


def test_curate_corpus_durable_resumes_without_recompute(spark, tmp_path):
    """Durable midpoint: crash between the survivor write and the
    near-dup stage, then restart with a POISONED input whose evaluation
    would raise — the restart must read survivors from the table (never
    re-running the gates) and produce the correct final result."""
    import pytest
    from pyspark.sql.functions import pandas_udf

    import srag_spark.plans.curation as C

    work = str(tmp_path / "curate")
    rows = [(10, GOOD), (20, GOOD + " tail"), (30, GOOD)]  # 30 exact-dups 10
    docs = _df(spark, rows)

    # first run crashes INSIDE stage 2 (after the survivor table commit)
    real_suppress = C.suppress_neardups

    def boom(*a, **k):
        raise RuntimeError("injected crash between stages")

    C.suppress_neardups = boom
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            C.curate_corpus_durable(
                spark, docs, work, lang_whitelist=("en",), min_quality=0.0
            )
    finally:
        C.suppress_neardups = real_suppress

    def _poison_fn(s):
        raise RuntimeError("stage 1 recomputed")

    poison = pandas_udf(_poison_fn, "string")
    poisoned = docs.withColumn("text", poison(F.col("text")))
    out = C.curate_corpus_durable(
        spark, poisoned, work, lang_whitelist=("en",), min_quality=0.0
    )
    assert {r["doc_id"] for r in out.collect()} == {10}
