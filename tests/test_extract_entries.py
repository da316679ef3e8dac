"""Driver-entry twins of the north-rule HTML/PDF extraction paths.

The hash-exact oracle gate (tools/check_oracle.py / the driver's
CORRECTNESS run) is the primary check for `extract_html_spans` and
`extract_pdf_spans`; these tests pin the spec-level invariants the hash
alone doesn't explain when it breaks: boilerplate never leaks, failure
docs keep their surviving spans, and the constructed boundaries land on
the frozen constants.
"""

import sys
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_html_entry_boilerplate_never_leaks(spark):
    rows = entrymod.q_extract_html_spans(spark, SF_DIR).collect()
    assert rows, "entry produced no spans"
    for r in rows:
        assert r["kind"] == "html"
        assert r["media_ref"] is None
        words = set(r["text"].split())
        # nav/anchor boilerplate, script content, comment words, and the
        # short-block filler are all dropped by the frozen spec (none of
        # these is in the corpus's 31-word synthetic vocabulary, so a hit
        # can only be a leak)
        assert not words & {"careers", "never_appears", "hidden", "tiny"}
    # entity unescape: every kept main block starts with the literal Q&A
    mains = [r for r in rows if r["seq"] == 0 and r["text"].startswith("Q&A ")]
    assert mains, "no kept main blocks — min-words boundary miscalibrated"


def test_html_entry_min_words_and_density_boundaries(spark):
    docs = entrymod._lex_docs(spark, SF_DIR).select(
        "did", F.size("w").alias("n")
    )
    out = entrymod.q_extract_html_spans(spark, SF_DIR)
    counts = {
        r["doc_id"]: r["c"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    for r in docs.collect():
        did, n = r["did"], r["n"]
        expect = (1 if (n // 2) + 1 >= 8 else 0) + (1 if did % 2 == 0 else 0)
        assert counts.get(str(did), 0) == expect, (did, n)


def test_pdf_entry_failure_docs_keep_media_span(spark):
    out = entrymod.q_extract_pdf_spans(spark, SF_DIR)
    per_doc = {
        r["doc_id"]: r["c"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("c")).collect()
    }
    bad = [d for d in per_doc if int(d) % 53 == 0]
    good = [d for d in per_doc if int(d) % 53 != 0]
    assert bad and good
    for d in bad:
        assert per_doc[d] == 1  # media anchor only — pdf span failed whole
    for d in good:
        assert per_doc[d] == 5  # media + 4 reading-order paragraphs

    media = out.filter(F.col("kind") == "media").limit(1).collect()[0]
    assert media["seq"] == 0 and media["media_ref"].startswith("pdfblob://")


def test_pdf_entry_reading_order_from_scrambled_lines(spark):
    # paragraph seq 3 is the right column: R1 + R0 (x tiebreak) + R2 —
    # six words with the construction's reversed (w2, w1) pair in the
    # middle, impossible to produce without the (page, column, y, x) sort
    out = entrymod.q_extract_pdf_spans(spark, SF_DIR)
    w = entrymod._lex_docs(spark, SF_DIR).select("doc_id", "w")
    joined = (
        out.filter(F.col("seq") == 3)
        .join(w, "doc_id")
        .select("text", "w")
        .limit(20)
        .collect()
    )
    assert joined
    for r in joined:
        ww = r["w"]
        expect = " ".join([ww[6], ww[7], ww[1], ww[0], ww[8], ww[9]])
        assert r["text"] == expect
