"""extract_meta: Spark operator ≡ frozen golden spec, edge cases."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.golden import extract_meta as golden_meta
from srag_spark.operators.links import extract_meta

CASES = [
    # full head: title + description + canonical + robots index-ok
    '<head><title>Page One</title>'
    '<meta name="description" content="A &amp; B  guide">'
    '<link rel="canonical" href="https://a.test/one">'
    '<meta name="robots" content="index, follow"></head>',
    # attribute order swapped; uppercase NAME; noindex in a list
    '<TITLE>Two</TITLE><meta content="swapped order" NAME="Description">'
    '<META CONTENT="nofollow, NOINDEX" name="robots">',
    # no title; first description meta empty-content (no rescue by later)
    '<meta name="description" content="">'
    '<meta name="description" content="later">'
    '<link href="/c" rel="canonical">',
    # title with nested tags + entities; canonical tag without href
    '<title><b>Bold</b>&nbsp;&amp;\n<i>ital</i></title>'
    '<link rel="canonical"><link rel="canonical" href="/never">',
    # commented-out and scripted metadata is not metadata
    '<!-- <title>ghost</title> -->'
    '<script>document.title="<title>js</title>"</script>'
    '<title>live</title>'
    '<!-- <meta name="robots" content="noindex"> -->',
    # single-quoted attributes do not participate
    "<title>sq</title><meta name='description' content='skip'>"
    "<link rel='canonical' href='/sq'>",
    # description whose content normalizes to empty → None, no rescue
    '<meta name="description" content="&nbsp;">'
    '<meta name="description" content="real text">',
    # whitespace-only title → None; robots noindex alone
    "<title>  \n </title><meta name=\"robots\" content=\"NoIndex\">",
    # rel value must EQUAL canonical (not merely contain it)
    '<link rel="canonical alternate" href="/no">'
    '<link rel="Canonical" href="/yes">',
    # empty / tag-free payloads
    "",
    "no head elements at all",
]


def test_operator_matches_golden_on_cases(spark):
    rows = [(str(i), h) for i, h in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_id"], r["title"], r["description"], r["canonical"],
         r["robots_noindex"])
        for r in extract_meta(df).collect()
    }
    want = {
        (str(i),) + golden_meta(h) for i, h in enumerate(CASES)
    }
    assert got == want
    # spot-pin the spec facts the set equality hides
    by_id = {t[0]: t[1:] for t in want}
    assert by_id["0"] == (
        "Page One", "A & B guide", "https://a.test/one", False
    )
    assert by_id["1"] == ("Two", "swapped order", None, True)
    assert by_id["2"] == (None, "later", "/c", False)
    assert by_id["3"] == ("Bold & ital", None, None, False)
    assert by_id["4"] == ("live", None, None, False)
    assert by_id["5"] == ("sq", None, None, False)
    # first non-empty-content description normalizes to empty → None,
    # and the later "real text" meta does NOT rescue it (first-wins)
    assert by_id["6"] == (None, None, None, False)
    assert by_id["7"] == (None, None, None, True)
    assert by_id["8"] == (None, None, "/yes", False)
    assert by_id["9"] == (None, None, None, False)
    assert by_id["10"] == (None, None, None, False)


def test_null_payload_row(spark):
    df = spark.createDataFrame(
        [("n", None)], "doc_id string, text string"
    )
    row = extract_meta(df).collect()[0]
    assert (row["title"], row["description"], row["canonical"]) == (
        None, None, None,
    )
    assert row["robots_noindex"] is False
