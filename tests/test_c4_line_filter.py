"""C4 line-level cleaning (textstats.c4_line_filter) — Raffel et al.
2020 §2.2: drop lines without terminal punctuation / under 5 words /
carrying blocklist markers; keep the page iff >= 3 lines survive.
"""

from __future__ import annotations

import duckdb

from srag_spark.operators.textstats import (
    C4_MIN_KEPT_LINES,
    c4_line_filter,
)

SF_DIR = "/root/testdata/sf0.001"

GOOD1 = "the quick brown fox jumps over the lazy dog today."
GOOD2 = "a perfectly fine second sentence appears right here now!"
GOOD3 = 'she said "hello there my good friend"'
SHORT = "too short line."
NO_PUNCT = "this line has plenty of words but never terminates properly"
BLOCKED = "this page uses javascript for dynamic menu rendering today."
CURLY = "function f() { return 1; } and some more words here today."


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows):
    return {
        r["doc_id"]: r.asDict()
        for r in c4_line_filter(_df(spark, rows)).collect()
    }


def test_line_rules(spark):
    """Each rule drops exactly its target line; survivors keep order."""
    text = "\n".join([GOOD1, SHORT, NO_PUNCT, BLOCKED, CURLY, GOOD2])
    out = _run(spark, [(1, text)])[1]
    assert out["n_lines"] == 6
    assert out["n_kept"] == 2
    assert out["text_kept"] == GOOD1 + "\n" + GOOD2
    # 2 survivors < C4_MIN_KEPT_LINES=3: the page itself is dropped
    assert out["page_kept"] is False


def test_page_keep_threshold(spark):
    """A page survives iff >= C4_MIN_KEPT_LINES lines survive."""
    kept = _run(spark, [(1, "\n".join([GOOD1, GOOD2, GOOD3]))])[1]
    assert kept["n_kept"] == C4_MIN_KEPT_LINES and kept["page_kept"] is True
    dropped = _run(spark, [(2, "\n".join([GOOD1, GOOD2, SHORT]))])[2]
    assert dropped["n_kept"] == 2 and dropped["page_kept"] is False


def test_terminal_quote_counts(spark):
    """C4 counts a closing double-quote as terminal punctuation."""
    out = _run(spark, [(1, GOOD3)])[1]
    assert out["n_kept"] == 1


def test_whitespace_and_case(spark):
    """Word counting collapses runs of whitespace; the blocklist match
    is case-insensitive (C4 lowercases before matching)."""
    padded = "  five   words  exactly  here  now.  "
    out = _run(spark, [(1, padded), (2, "Lorem IPSUM dolor sit amet today.")])
    assert out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 0


def test_entry_matches_duckdb_oracle(spark):
    """Cross-engine check of the driver entry at sf0.001 (plants page
    structure by doc_id residue — identically in both engines)."""
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["c4_line_filter"](spark, SF_DIR)
    srows = {
        r["doc_id"]: (r["text_kept"], r["n_lines"], r["n_kept"], r["page_kept"])
        for r in sdf.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    orows = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            "SELECT doc_id, text_kept, n_lines, n_kept, page_kept FROM ("
            + entrymod.oracle_sql()["c4_line_filter"] + ")"
        ).fetchall()
    }
    assert srows == orows
    # the plants exercise both outcomes
    assert any(v[3] for v in srows.values())
    assert any(not v[3] for v in srows.values())
