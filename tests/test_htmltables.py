"""extract_tables: Spark operator ≡ frozen golden spec."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.golden import extract_tables as golden_tables
from srag_spark.operators.htmltables import extract_tables

CASES = [
    # header row + data rows, entities, nested inline tags
    '<table><tr><th>Name</th><th>Age</th></tr>'
    '<tr><td><b>Ann</b> &amp; Bo</td><td>7</td></tr>'
    '<tr><td>Cy</td><td></td></tr></table>',
    # two tables; attributes on every tag; mixed case
    '<TABLE class="x"><TR id="r"><TD align="l">a</TD></TR></TABLE>'
    'between <table><tr><td>b</td><th>h</th></tr></table>',
    # commented-out and scripted tables are not tables
    '<!-- <table><tr><td>ghost</td></tr></table> -->'
    '<script>t="<table><tr><td>js</td></tr></table>"</script>'
    '<table><tr><td>live</td></tr></table>',
    # rows without cells, cells outside rows, multiline content
    '<table><tr></tr><td>stray</td><tr><td>line1\nline2</td></tr></table>',
    # no tables at all / empty
    "<p>plain</p>",
    "",
]


def test_operator_matches_golden(spark):
    rows = [(str(i), h) for i, h in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_id"], r["table_index"], r["row_index"], r["col_index"],
         r["is_header"], r["cell_text"])
        for r in extract_tables(df).collect()
    }
    want = {
        (str(i), t, rr, c, h, x)
        for i, html in enumerate(CASES)
        for (t, rr, c, h, x) in golden_tables(html)
    }
    assert got == want
    # spot-pin the spec facts
    assert ("0", 0, 0, 0, True, "Name") in want
    assert ("0", 0, 1, 0, False, "Ann & Bo") in want
    assert ("0", 0, 2, 1, False, "") in want          # empty cell kept
    assert ("1", 1, 0, 1, True, "h") in want          # td+th in one row
    assert ("2", 0, 0, 0, False, "live") in want      # ghosts removed
    assert not any(k[0] == "2" and k[5] in ("ghost", "js") for k in want)
    assert ("3", 0, 1, 0, False, "line1 line2") in want
    # stray cell outside a row emits nothing; empty row emits nothing
    assert not any(k[0] == "3" and k[5] == "stray" for k in want)
    assert not any(k[0] in ("4", "5") for k in want)


from srag_spark.golden import extract_headings as golden_headings
from srag_spark.operators.htmltables import extract_headings

HEADING_CASES = [
    "<h1>Top</h1><p>x</p><h2>A &amp; B</h2><h3>  </h3><h2><b>C</b></h2>",
    "<H2 class='x'>upper\nmultiline</H2><h6>deep</h6>",
    "<!-- <h1>ghost</h1> --><script>s='<h1>js</h1>'</script><h1>live</h1>",
    "<h1>open only",       # unclosed → no heading
    "<h2>wrong close</h3>", # mismatched level → no heading
    "",
]


def test_headings_match_golden(spark):
    rows = [(str(i), h) for i, h in enumerate(HEADING_CASES)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_id"], r["heading_index"], r["level"], r["text"])
        for r in extract_headings(df).collect()
    }
    want = {
        (str(i), idx, lvl, t)
        for i, h in enumerate(HEADING_CASES)
        for (idx, lvl, t) in golden_headings(h)
    }
    assert got == want
    # empty heading consumed index 2; C is index 3
    assert ("0", 3, 2, "C") in want
    assert not any(k[0] == "0" and k[1] == 2 for k in want)
    assert ("1", 0, 2, "upper multiline") in want
    assert ("2", 0, 1, "live") in want
    assert not any(k[0] in ("3", "4", "5") for k in want)


from srag_spark.golden import extract_code_blocks as golden_code
from srag_spark.operators.htmltables import extract_code_blocks

CODE_CASES = [
    # code wrapper with language class, entities, inner whitespace kept
    '<pre><code class="language-Python">def f(x):\n'
    "    return x &lt; 2</code></pre>",
    # language on the pre tag; no code wrapper
    '<pre class="language-rust">fn main() {}</pre>',
    # attrs language beats inner language
    '<pre class="language-c"><code class="language-go">x</code></pre>',
    # empty/whitespace block consumes an index, emits nothing
    "<pre>a</pre><pre>   \n </pre><pre>b</pre>",
    # commented-out pre is not a block; script pre IS (spec: only
    # comments removed)
    "<!-- <pre>ghost</pre> --><pre>live</pre>",
    # no language anywhere
    "<pre><code>plain &amp; simple</code></pre>",
    "",
]


def test_code_blocks_match_golden(spark):
    rows = [(str(i), h) for i, h in enumerate(CODE_CASES)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_id"], r["block_index"], r["language"], r["code"])
        for r in extract_code_blocks(df).collect()
    }
    want = {
        (str(i), idx, lang, code)
        for i, h in enumerate(CODE_CASES)
        for (idx, lang, code) in golden_code(h)
    }
    assert got == want
    assert ("0", 0, "python", "def f(x):\n    return x < 2") in want
    assert ("1", 0, "rust", "fn main() {}") in want
    assert ("2", 0, "c", "x") in want
    assert ("3", 0, None, "a") in want and ("3", 2, None, "b") in want
    assert not any(k[0] == "3" and k[1] == 1 for k in want)
    assert ("4", 0, None, "live") in want
    assert ("5", 0, None, "plain & simple") in want


from srag_spark.golden import extract_md_fences as golden_fences
from srag_spark.operators.htmltables import extract_md_fences

FENCE_CASES = [
    "intro\n```Python\ndef f():\n    pass\n```\nafter",
    # info string with extra tokens; language is the first
    "```c++ title=ex\nint x;\n```\n",
    # plain fence, trailing empty line INSIDE the block preserved
    "```\nline one\n\n```\n",
    # empty block consumes index 0; second block emits
    "```js\n```\n```go\nok\n```",
    # unterminated fence yields nothing; indented fence is not a fence
    "```rust\nnope",
    "  ```py\nindented\n```",
    "no fences",
    "",
]


def test_md_fences_match_golden(spark):
    rows = [(str(i), t) for i, t in enumerate(FENCE_CASES)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["doc_id"], r["block_index"], r["language"], r["code"])
        for r in extract_md_fences(df).collect()
    }
    want = {
        (str(i), idx, lang, code)
        for i, t in enumerate(FENCE_CASES)
        for (idx, lang, code) in golden_fences(t)
    }
    assert got == want
    assert ("0", 0, "python", "def f():\n    pass") in want
    assert ("1", 0, "c++", "int x;") in want
    assert ("2", 0, None, "line one\n") in want   # inner blank kept
    assert ("3", 1, "go", "ok") in want
    assert not any(k[0] == "3" and k[1] == 0 for k in want)
    assert not any(k[0] in ("4", "5", "6", "7") for k in want)
