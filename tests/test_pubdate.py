"""extract_pubdate: Spark operator ≡ frozen golden spec."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.golden import extract_pubdate as golden_pubdate
from srag_spark.operators.links import extract_pubdate

CASES = [
    # og property, full timestamp → date prefix
    ('<meta property="article:published_time" '
     'content="2023-05-04T10:00:00Z">', "https://s.test/x"),
    # name= variant, uppercase key
    ('<meta name="DatePublished" content="2020-01-31">', None),
    # meta wins over time and url
    ('<meta name="date" content="2022-02-02">'
     '<time datetime="2021-01-01">t</time>', "https://s.test/2019/07/15/"),
    # first keyed meta has invalid month → meta source dead, time wins
    ('<meta name="date" content="2023-13-04">'
     '<time datetime="2021-12-31T08:00">t</time>', "https://s.test/2019/07/"),
    # keyed meta without content is skipped, later keyed meta decides
    ('<meta name="date"><meta property="datePublished" '
     'content="2018-06-09">', None),
    # time only; day 31 boundary
    ('<time datetime="1999-12-31">y2k</time>', None),
    # url fallback with and without day
    ("", "https://s.test/2019/07/15/post"),
    ("no dates here", "https://s.test/blog/2010/11/"),
    # url with invalid month does not match
    ("", "https://s.test/2019/77/15/"),
    # /YYYY/MM not followed by / or end does not match
    ("", "https://s.test/2019/075x"),
    # commented-out meta is not metadata
    ('<!-- <meta name="date" content="2001-01-01"> -->', None),
    # nothing anywhere
    ("", None),
    (None, None),
]


def test_operator_matches_golden(spark):
    rows = [(str(i), h, u) for i, (h, u) in enumerate(CASES)]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, url string"
    )
    got = {
        r["doc_id"]: (r["pub_date"], r["date_source"])
        for r in extract_pubdate(df, url_col="url").collect()
    }
    want = {
        str(i): golden_pubdate(h, u) for i, (h, u) in enumerate(CASES)
    }
    assert got == want
    # spot-pin the priority and validation facts
    assert want["0"] == ("2023-05-04", "meta")
    assert want["2"] == ("2022-02-02", "meta")
    assert want["3"] == ("2021-12-31", "time")
    assert want["4"] == ("2018-06-09", "meta")
    assert want["6"] == ("2019-07-15", "url")
    assert want["7"] == ("2010-11-01", "url")
    assert want["8"] == (None, None)
    assert want["9"] == (None, None)
    assert want["10"] == (None, None)
    assert want["12"] == (None, None)


def test_without_url_column(spark):
    df = spark.createDataFrame(
        [("a", '<time datetime="2020-02-29">x</time>')],
        "doc_id string, text string",
    )
    row = extract_pubdate(df).collect()[0]
    assert (row["pub_date"], row["date_source"]) == ("2020-02-29", "time")
