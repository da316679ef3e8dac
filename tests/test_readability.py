"""readability / flesch_cols: exact-integer Flesch reading ease."""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.operators.textstats import readability


def _py_flesch(text):
    words = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
    w = len(words)
    s = max(len(re.findall(r"[.!?]+", text)), 1)
    y = sum(max(len(re.findall(r"[aeiouy]+", t)), 1) for t in words)
    if w == 0:
        return (0, s, 0, None)
    return (w, s, y, 206835 - (1015 * w) // s - (84600 * y) // w)


CASES = [
    "The cat sat on the mat. It was flat.",
    "Incomprehensibilities notwithstanding, the multisyllabic "
    "verbiage perseverates unrelentingly!",
    "One two three",          # no terminator → sentences floored at 1
    "Hmm... right?! Sure.",   # runs of terminators count once each
    "tsk tsk zzz",            # vowel-less words floor at 1 syllable
    "",                       # empty → NULL score
    "!!!",                    # terminators but no words → NULL score
]


def test_matches_python_twin(spark):
    rows = [(str(i), t) for i, t in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"],
            r["flesch_milli"],
        )
        for r in readability(df).collect()
    }
    for i, t in enumerate(CASES):
        assert got[str(i)] == _py_flesch(t), (i, t)
    # simple prose scores far above the polysyllabic wall of text
    assert got["0"][3] > 90000 > got["1"][3]
    # the exact integer values are frozen (engine-independence pin)
    assert got["0"] == (9, 2, 9, 117668)
    assert got["4"] == (3, 1, 3, 119190)
