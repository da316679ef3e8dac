"""host_boilerplate_flags: per-host template-line verdicts."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.operators.dedup import host_boilerplate_flags

# host A: 4 docs, "Cookie notice" on all 4 (frac 1.0 → boilerplate),
# "Promo week" on 2/4 (frac .5 at permille 500 → boilerplate at the
# boundary; min_docs=3 blocks it → kept), unique lines kept.
# host B: 2 docs sharing "Cookie notice" — support 2 < min_docs → kept
# (the same text IS boilerplate on A and NOT on B: host-scoped).
ROWS = [
    ("a1", "A", "Cookie notice. Promo week. alpha one"),
    ("a2", "A", "Cookie notice. Promo week. alpha two"),
    ("a3", "A", "Cookie notice. alpha three"),
    ("a4", "A", "Cookie notice. alpha four"),
    ("b1", "B", "Cookie notice. beta one"),
    ("b2", "B", "Cookie notice. beta two"),
]


def _keeps(df):
    return {
        (r["doc_id"], r["pos"]): (r["line"], r["keep"])
        for r in df.collect()
    }


def test_host_scoped_verdicts(spark):
    df = spark.createDataFrame(ROWS, "doc_id string, host string, text string")
    got = _keeps(host_boilerplate_flags(df))
    # all four copies of host-A chrome drop (no keep-first survivor)
    for d in ("a1", "a2", "a3", "a4"):
        assert got[(d, 0)] == ("Cookie notice", False)
    # same line on host B is below min_docs → kept there
    assert got[("b1", 0)] == ("Cookie notice", True)
    assert got[("b2", 0)] == ("Cookie notice", True)
    # 2/4 support fails min_docs=3 despite meeting the 500-permille bar
    assert got[("a1", 1)] == ("Promo week", True)
    assert got[("a2", 1)] == ("Promo week", True)
    # unique content always keeps
    assert got[("a1", 2)] == ("alpha one", True)
    assert got[("b2", 1)] == ("beta two", True)


def test_permille_boundary_is_integer_exact(spark):
    df = spark.createDataFrame(ROWS, "doc_id string, host string, text string")
    # min_docs=2: "Promo week" support 2, host docs 4 → 2*1000 >= 500*4
    # holds with equality — the integer compare includes the boundary
    got = _keeps(host_boilerplate_flags(df, min_docs=2))
    assert got[("a1", 1)][1] is False
    # at 501 permille the same line survives: 2000 < 501*4
    got2 = _keeps(host_boilerplate_flags(df, min_docs=2, frac_permille=501))
    assert got2[("a1", 1)][1] is True


def test_normalized_matching_and_within_doc_repeat(spark):
    rows = [
        ("c1", "C", "Sign  UP now!. body one. sign up NOW"),
        ("c2", "C", "sign up now. body two"),
        ("c3", "C", "SIGN UP NOW. body three"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    got = _keeps(host_boilerplate_flags(df))
    # normalization folds case/punct/whitespace; c1's within-doc repeat
    # counts once for support (3 distinct docs of 3 → boilerplate),
    # and BOTH its copies drop
    assert got[("c1", 0)][1] is False
    assert got[("c1", 2)][1] is False
    assert got[("c2", 0)][1] is False
    assert got[("c3", 0)][1] is False
    assert got[("c1", 1)] == ("body one", True)
