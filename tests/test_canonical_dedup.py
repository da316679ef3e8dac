"""canonical_dedup: keep-first per declared canonical URL."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.operators.links import canonical_dedup


def _flags(df):
    return {
        r["doc_id"]: (r["canonical_group"], r["canonical_keep"])
        for r in df.collect()
    }


def test_keep_first_per_group_and_null_passthrough(spark):
    rows = [
        ("a", "https://x.test/1"),
        ("b", "https://x.test/1"),   # same group as a → dropped
        ("c", "https://x.test/2"),   # singleton group → kept
        ("d", None),                 # undeclared → kept, no group
        ("e", ""),                   # empty == undeclared → kept
        ("10", "https://x.test/1"),  # "10" < "a" lexicographically → wins
    ]
    df = spark.createDataFrame(rows, "doc_id string, canonical string")
    got = _flags(canonical_dedup(df))
    assert got == {
        "a": ("https://x.test/1", False),
        "b": ("https://x.test/1", False),
        "10": ("https://x.test/1", True),
        "c": ("https://x.test/2", True),
        "d": (None, True),
        "e": (None, True),
    }


def test_order_col_overrides_id_order(spark):
    rows = [
        ("a", "u", 5),
        ("b", "u", 1),  # lowest rank wins despite higher id
        ("c", "u", 1),  # rank tie → id tie-break: b wins
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, canonical string, rank int"
    )
    got = _flags(canonical_dedup(df, order_col="rank"))
    assert [got[k][1] for k in ("a", "b", "c")] == [False, True, False]
