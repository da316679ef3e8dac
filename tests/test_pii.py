"""PII redaction (operators/pii.py).

Reference context: the reference stores raw user transcripts
(srag-domain Transcript, srag-domain/src/main/scala/domain/model);
an engine feeding that corpus into training needs a scrub stage —
CCNet/RefinedWeb-class email/IP/phone redaction.  Checks the staged
ordering semantics (each detector runs on the previous stage's
output) and cross-checks the planted-corpus entry against its DuckDB
oracle at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

from srag_spark.operators.pii import PII_PATTERNS, scrub_pii

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scrubbed(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@sub.example.co.uk today"),
            (2, "server 192.168.0.1 and backup 10.0.0.254 are up"),
            (3, "call +44 (20) 7946-0991 or 555-123-4567 now"),
            (4, "no personal data here at all"),
            (5, "bob@x.io from 8.8.8.8 phoned +1 650 253 0000"),
            (6, "overcapture: 999.999.999.999 is still redacted"),
        ],
        ["doc_id", "text"],
    )
    return {r["doc_id"]: r.asDict() for r in scrub_pii(docs).collect()}


def test_each_class_detected(scrubbed):
    assert scrubbed[1]["n_email"] == 1 and "<EMAIL>" in scrubbed[1]["text_redacted"]
    assert scrubbed[2]["n_ipv4"] == 2
    assert scrubbed[2]["text_redacted"].count("<IP>") == 2
    assert scrubbed[3]["n_phone"] == 2
    assert scrubbed[5]["n_email"] == 1
    assert scrubbed[5]["n_ipv4"] == 1
    assert scrubbed[5]["n_phone"] == 1


def test_no_pii_row_untouched(scrubbed):
    assert scrubbed[4]["has_pii"] is False
    assert scrubbed[4]["text_redacted"] == "no personal data here at all"
    assert (
        scrubbed[4]["n_email"] == scrubbed[4]["n_ipv4"] == scrubbed[4]["n_phone"] == 0
    )


def test_ipv4_overcapture_is_deliberate(scrubbed):
    # octet ranges are not validated — recall over precision for a scrub
    assert scrubbed[6]["n_ipv4"] == 1


def test_staged_ordering_no_double_count(spark):
    """Digits inside an email must be redacted by the email stage and
    never recounted as a phone; an IP must not be recounted either."""
    docs = spark.createDataFrame(
        [(1, "reach 12345678901@digits.example.org soon")], ["doc_id", "text"]
    )
    row = scrub_pii(docs).collect()[0]
    assert row["n_email"] == 1
    assert row["n_phone"] == 0
    assert row["text_redacted"] == "reach <EMAIL> soon"


def test_null_text_yields_false_verdict(spark):
    """NULL text must produce has_pii=false / zero counts, not NULL —
    a downstream keep-filter on ~has_pii silently drops NULL verdicts."""
    docs = spark.createDataFrame(
        [(1, None), (2, "a@b.co")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in scrub_pii(docs).collect()}
    assert rows[1]["has_pii"] is False
    assert rows[1]["n_email"] == rows[1]["n_ipv4"] == rows[1]["n_phone"] == 0
    assert rows[1]["text_redacted"] is None
    assert rows[2]["has_pii"] is True


def test_patterns_are_re2_safe():
    """The DuckDB oracle runs the same patterns under RE2 — no
    lookaround or backreferences allowed."""
    for _, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat


def test_entry_matches_duckdb_oracle(spark):
    """Full cross-engine check of the driver entry at sf0.001: Java
    regex (Spark) and RE2 (DuckDB) must pick identical spans on the
    planted corpus."""
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()["text_pii_scrub"](spark, SF_DIR)
    srows = {
        r["doc_id"]: (
            r["text_redacted"],
            r["n_email"],
            r["n_ipv4"],
            r["n_phone"],
            r["has_pii"],
        )
        for r in sdf.collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    orows = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            "SELECT doc_id, text_redacted, n_email, n_ipv4, n_phone, has_pii "
            f"FROM ({entrymod.oracle_sql()['text_pii_scrub']})"
        ).fetchall()
    }
    assert srows == orows
    assert any(v[4] for v in srows.values())  # plants actually fired
