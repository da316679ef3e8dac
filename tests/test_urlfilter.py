"""URL filtering gate (operators.urlfilter) — domain extraction, soft
word scoring, and both blocklist forms (bounded isin / broadcast-join
table).  Cross-engine parity lives in the `url_filter` oracle entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from srag_spark.operators.urlfilter import (
    DEFAULT_WORD_WEIGHTS,
    url_domain_col,
    url_filter_flags,
    url_word_score_col,
)

URLS = "doc_id long, url string"


def test_domain_extraction_and_www_strip(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.Example.COM/a/b?q=1"),
            (2, "http://sub.news-site.org:8080/x"),
            (3, "ftp://files.archive.org/pub"),
            (4, "not a url at all"),
        ],
        URLS,
    )
    got = {
        r["doc_id"]: r["d"]
        for r in df.select("doc_id", url_domain_col(F.col("url")).alias("d")).collect()
    }
    assert got == {
        1: "example.com",
        2: "sub.news-site.org",
        3: "files.archive.org",
        4: "",
    }


def test_word_score_counts_every_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "https://x.io/casino/CASINO-poker"), (2, "https://x.io/clean")],
        URLS,
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id",
            F.round(
                url_word_score_col(F.col("url"), DEFAULT_WORD_WEIGHTS), 6
            ).alias("s"),
        ).collect()
    }
    # two 'casino' hits (case-insensitive) + one 'poker'
    assert abs(got[1] - (2 * 0.8 + 0.5)) < 1e-9
    assert got[2] == 0.0


def test_blocklist_dataframe_form_matches_isin_form(spark):
    rows = [
        (1, "https://www.blocked.example.net/a"),
        (2, "https://ok.example.com/b"),
        (3, "https://tracker.ads.example/c"),
    ]
    df = spark.createDataFrame(rows, URLS)
    blocked = ["blocked.example.net", "tracker.ads.example"]
    via_list = url_filter_flags(df, blocked_domains=blocked)
    bl_df = spark.createDataFrame([(d,) for d in blocked], "domain string")
    via_table = url_filter_flags(df, blocked_domains=bl_df)
    key = lambda r: (r["doc_id"], r["domain_blocked"], r["keep"])
    assert sorted(map(key, via_list.collect())) == sorted(
        map(key, via_table.collect())
    )
    kept = {r["doc_id"] for r in via_list.collect() if r["keep"]}
    assert kept == {2}


def test_threshold_boundary_and_empty_blocklist(spark):
    df = spark.createDataFrame(
        [(1, "https://a.io/webcam"), (2, "https://a.io/poker")], URLS
    )
    out = {r["doc_id"]: r["keep"] for r in url_filter_flags(df).collect()}
    assert out == {1: False, 2: True}  # webcam hits 1.0 == threshold → drop
