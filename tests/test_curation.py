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
