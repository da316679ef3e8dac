"""preclean_web_corpus: the composed compliance + site-dedup chain."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.plans.webclean import preclean_web_corpus

CHROME = "Accept cookies to continue"
DOCS = [
    # s.test: d1/d2 share a canonical (d1 wins), d3 unique, d4 noindex,
    # d5 robots-blocked path; all carry the host chrome line
    ("d1", "https://s.test/a", f"<title>One</title>"
     f'<link rel="canonical" href="/art">'
     f"<p>{CHROME}. unique alpha text</p>"),
    ("d2", "https://s.test/b", f'<link rel="canonical" href="/art">'
     f"<p>{CHROME}. unique beta text</p>"),
    ("d3", "https://s.test/c", f"<p>{CHROME}. unique gamma text</p>"),
    ("d4", "https://s.test/d", f'<meta name="robots" content="noindex">'
     f"<p>{CHROME}. opted out</p>"),
    ("d5", "https://s.test/private/e", f"<p>{CHROME}. disallowed</p>"),
    # t.test: one doc, no robots file → all allowed, chrome below
    # min_docs there → kept
    ("d6", "https://t.test/x", f"<p>{CHROME}. lone survivor</p>"),
]
ROBOTS = [("s.test", "User-agent: *\nDisallow: /private\n")]


def test_full_chain(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, url string, text string")
    robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    clean, stats = preclean_web_corpus(docs, robots=robots)
    rows = {r["doc_id"]: r for r in clean.collect()}
    st = stats.collect()[0]
    # d2 lost the canonical group to d1; d4 noindex; d5 robots-blocked
    assert set(rows) == {"d1", "d3", "d6"}
    assert st["n_input"] == 6
    assert st["n_noindex"] == 1
    assert st["n_robots_blocked"] == 1
    assert st["n_canonical_dups"] == 1
    assert st["n_survivors"] == 3
    # the chrome census runs on SURVIVORS only: s.test keeps d1+d3, so
    # the shared line's support (2) is below min_docs and it survives —
    # dropped docs must not inflate a host's template statistics
    assert "Accept cookies" in rows["d1"]["clean_text"]
    assert rows["d1"]["title"] == "One"
    # d6 text intact
    assert "lone survivor" in rows["d6"]["clean_text"]


def test_chain_without_robots_and_chrome_strips_at_support(spark):
    # 4 surviving docs on one host sharing chrome → support 4 ≥ 3 and
    # 1000-permille → chrome drops everywhere
    docs = spark.createDataFrame(
        [
            (f"c{i}", f"https://h.test/p{i}",
             f"<p>{CHROME}. body {i} words</p>")
            for i in range(4)
        ],
        "doc_id string, url string, text string",
    )
    clean, stats = preclean_web_corpus(docs)
    rows = {r["doc_id"]: r["clean_text"] for r in clean.collect()}
    assert len(rows) == 4
    for i in range(4):
        assert "Accept cookies" not in rows[f"c{i}"]
        assert f"body {i} words" in rows[f"c{i}"]
    st = stats.collect()[0]
    assert st["n_survivors"] == 4 and st["n_robots_blocked"] == 0
