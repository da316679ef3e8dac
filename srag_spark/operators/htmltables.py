"""HTML table extraction — tables as a (doc, table, row, col) cell relation.

Structured-data extraction for the interleaved-document pipeline: the
tabular payloads embedded in web documents, lifted into a relational
shape downstream curation can query (cell-level quality checks, header
-keyed records, table-to-text training pairs).  The reference service
stores documents and extracts no structure; frozen spec in
:func:`srag_spark.golden.extract_tables` (nested tables out of spec —
the non-greedy match closes at the first ``</table>``; colspan/rowspan
ignored — a lexical grid, not a rendered one), pinned operator≡golden
by tests/test_htmltables.py.

Scale shape: native ``regexp_extract_all`` at each nesting level with
``posexplode`` between levels — three linear explodes whose fan-out is
the document's own cell count, zero Python, zero shuffles; the cell
text normalization is the shared entity/whitespace chain.  Runs at
scan speed on the source's own partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from srag_spark.operators.links import (
    _COMMENT_PATTERN,
    _SCRIPT_STYLE_PATTERN,
    _normalize_ws,
    _unescape_col,
)

_TABLE_PATTERN = r"(?is)<table\b[^>]*>(.*?)</table\s*>"
_TR_PATTERN = r"(?is)<tr\b[^>]*>(.*?)</tr\s*>"
_CELL_PATTERN = r"(?is)<(td|th)\b[^>]*>(.*?)</\1\s*>"


def extract_tables(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "text",
) -> DataFrame:
    """``(id, table_index, row_index, col_index, is_header, cell_text)``
    per table cell, document order at every level; ``is_header`` marks
    ``<th>`` cells; cell text is tag-stripped / entity-unescaped /
    whitespace-normalized, empty cells yielding ``''`` (the grid
    position is the datum)."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(html_col), _COMMENT_PATTERN, " "),
        _SCRIPT_STYLE_PATTERN,
        " ",
    )
    t = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(cleaned, F.lit(_TABLE_PATTERN), 1)
        ).alias("table_index", "tbody"),
    )
    r = t.select(
        "id",
        "table_index",
        F.posexplode(
            F.regexp_extract_all(
                F.col("tbody"), F.lit(_TR_PATTERN), 1
            )
        ).alias("row_index", "rowhtml"),
    )
    cells = F.arrays_zip(
        F.regexp_extract_all(
            F.col("rowhtml"), F.lit(_CELL_PATTERN), 1
        ).alias("tag"),
        F.regexp_extract_all(
            F.col("rowhtml"), F.lit(_CELL_PATTERN), 2
        ).alias("inner"),
    )
    return (
        r.select(
            "id",
            "table_index",
            "row_index",
            F.posexplode(cells).alias("col_index", "c"),
        )
        .select(
            F.col("id").alias(id_col),
            "table_index",
            "row_index",
            "col_index",
            (F.lower(F.col("c.tag")) == "th").alias("is_header"),
            _normalize_ws(
                _unescape_col(
                    F.regexp_replace(F.col("c.inner"), r"<[^>]+>", " ")
                )
            ).alias("cell_text"),
        )
    )


_HEADING_PATTERN = r"(?is)<h([1-6])\b[^>]*>(.*?)</h\1\s*>"


def extract_headings(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "text",
) -> DataFrame:
    """``(id, heading_index, level, text)`` — the document's heading
    outline (h1–h6 in document order, matching closing level), the
    structural skeleton section-aware chunking and outline-conditioned
    training pairs start from.  Frozen spec in
    :func:`srag_spark.golden.extract_headings` (empty-normalizing
    headings consume an index but emit nothing — the extract_links
    skip convention), pinned equal by tests/test_htmltables.py.

    Same scale shape as the link miner: two aligned
    ``regexp_extract_all`` passes (group 1 = level digit, group 2 =
    inner HTML) + ``arrays_zip``/``posexplode`` + the shared
    strip/unescape/normalize chain — zero Python, zero shuffles."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(html_col), _COMMENT_PATTERN, " "),
        _SCRIPT_STYLE_PATTERN,
        " ",
    )
    pairs = F.arrays_zip(
        F.regexp_extract_all(cleaned, F.lit(_HEADING_PATTERN), 1).alias(
            "lvl"
        ),
        F.regexp_extract_all(cleaned, F.lit(_HEADING_PATTERN), 2).alias(
            "inner"
        ),
    )
    out = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(pairs).alias("heading_index", "h"),
    ).select(
        "id",
        "heading_index",
        F.col("h.lvl").cast("int").alias("level"),
        _normalize_ws(
            _unescape_col(
                F.regexp_replace(F.col("h.inner"), r"<[^>]+>", " ")
            )
        ).alias("text"),
    )
    return out.filter(F.col("text") != "").withColumnRenamed("id", id_col)


_PRE_PATTERN = r"(?is)<pre\b([^>]*)>(.*?)</pre\s*>"
_LANG_CLASS = r"(?i)\blanguage-([A-Za-z0-9_+#-]+)"
_ASCII_WS = r"[ \t\r\n\f\x0B]"


def extract_code_blocks(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "text",
) -> DataFrame:
    """``(id, block_index, language, code)`` — code blocks mined from
    ``<pre>`` elements (code-corpus extraction: the code/text split and
    per-language routing a pretraining mixture keys on).  Frozen spec
    in :func:`srag_spark.golden.extract_code_blocks`: one optional
    ``<code>`` wrapper stripped, entities unescaped, ASCII-trimmed at
    the ends only — inner whitespace PRESERVED verbatim (this is not
    the normalizing text chain; code layout is significant); language
    = the first ``language-X`` class token in the element, lowercased;
    empty blocks consume an ordinal but emit nothing.  Pinned
    operator≡golden by tests/test_htmltables.py.

    The link-miner scale shape: aligned ``regexp_extract_all`` passes
    + posexplode + native replaces — zero Python, zero shuffles."""
    cleaned = F.regexp_replace(F.col(html_col), _COMMENT_PATTERN, " ")
    pairs = F.arrays_zip(
        F.regexp_extract_all(cleaned, F.lit(_PRE_PATTERN), 1).alias(
            "attrs"
        ),
        F.regexp_extract_all(cleaned, F.lit(_PRE_PATTERN), 2).alias(
            "inner"
        ),
    )
    raw = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(pairs).alias("block_index", "b"),
    )
    lang = F.lower(
        F.nullif(
            F.coalesce(
                F.nullif(
                    F.regexp_extract(F.col("b.attrs"), _LANG_CLASS, 1),
                    F.lit(""),
                ),
                F.regexp_extract(F.col("b.inner"), _LANG_CLASS, 1),
            ),
            F.lit(""),
        )
    )
    code = F.regexp_replace(
        F.col("b.inner"), r"(?is)^" + _ASCII_WS + r"*<code\b[^>]*>", ""
    )
    code = F.regexp_replace(
        code, r"(?is)</code\s*>" + _ASCII_WS + r"*$", ""
    )
    code = _unescape_col(code)
    code = F.regexp_replace(
        code, r"^" + _ASCII_WS + r"+|" + _ASCII_WS + r"+$", ""
    )
    return (
        raw.select(
            F.col("id").alias(id_col),
            "block_index",
            lang.alias("language"),
            code.alias("code"),
        )
        .filter(F.col("code") != "")
    )


_MD_FENCE_PATTERN = r"(?ms)^```([^\n]*)\n(.*?)^```[ \t]*(?:\n|$)"
_MD_INFO = r"^[ \t]*([A-Za-z0-9_+#-]+)"


def extract_md_fences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, block_index, language, code)`` — fenced code blocks from
    markdown/plain-text payloads (the bounded CommonMark subset; the
    plain-text twin of :func:`extract_code_blocks`).  Frozen spec in
    :func:`srag_spark.golden.extract_md_fences`: unindented ``` fences,
    info-string first token as the lowercased language, code verbatim
    with exactly ONE newline stripped before the closing fence (an
    explicit substr, NOT a ``\\n$`` regex — Java's ``$`` also matches
    before a final newline, which would eat trailing empty lines that
    are part of the block), empty blocks consuming an ordinal.  Pinned
    operator≡golden by tests/test_htmltables.py.

    The link-miner scale shape: aligned regexp_extract_all passes +
    one posexplode, zero Python, zero shuffles."""
    pairs = F.arrays_zip(
        F.regexp_extract_all(
            F.col(text_col), F.lit(_MD_FENCE_PATTERN), 1
        ).alias("info"),
        F.regexp_extract_all(
            F.col(text_col), F.lit(_MD_FENCE_PATTERN), 2
        ).alias("body"),
    )
    raw = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(pairs).alias("block_index", "b"),
    )
    body = F.col("b.body")
    code = F.when(
        body.endswith("\n"), body.substr(F.lit(1), F.length(body) - 1)
    ).otherwise(body)
    lang = F.lower(
        F.nullif(F.regexp_extract(F.col("b.info"), _MD_INFO, 1), F.lit(""))
    )
    return (
        raw.select(
            F.col("id").alias(id_col),
            "block_index",
            lang.alias("language"),
            code.alias("code"),
        )
        .filter(F.col("code") != "")
    )
