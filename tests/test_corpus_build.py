"""Composed training-corpus build (plans/corpus_build.py): curation →
decontamination → mixture → packing as one plan, plus the durable
stage-resumable form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from srag_spark.operators.corpus import pack_sequences
from srag_spark.plans.corpus_build import (
    BUILD_COLUMNS,
    build_training_corpus,
    build_training_corpus_durable,
)

DOC_A = (
    "the quick brown fox jumps over the lazy dog and runs to the hills "
    "in the morning light for a long time with many friends of the forest"
)
DOC_B = (
    "a completely different document about cooking pasta with tomato "
    "sauce and fresh basil leaves from the garden in the summer of that "
    "year when the harvest was plentiful in the warm kitchen"
)
DOC_C = (
    "the harvest festival brought the whole village to the square where "
    "the children played and the elders told stories of the old days in "
    "the light of the great bonfire near the river"
)
# eval doc sharing a 5-gram with DOC_B only
EVAL_DOC = "notes about cooking pasta with tomato sauce for the benchmark"

RATES = {"en": 1.0, "und": 1.0}


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, docs, **kw):
    ev = _df(spark, [(900, EVAL_DOC)])
    args = dict(
        rates=RATES,
        budget=16,
        lang_whitelist=("en", "und"),
        min_quality=0.0,
        decontam_n=5,
    )
    args.update(kw)
    return build_training_corpus(docs, ev, **args)


def test_build_training_corpus_composition(spark):
    """Each stage demonstrably acts in the composition: the exact dup is
    deduped, the eval-overlapping doc is scrubbed, survivors carry
    mixture weights, and the packing equals pack_sequences run on the
    surviving set alone."""
    docs = _df(
        spark,
        [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_A)],  # 4 exact-dups 1
    )
    out = _build(spark, docs)
    assert list(out.columns) == list(BUILD_COLUMNS)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {1, 3}  # 4 deduped, 2 contaminated
    assert all(r["weight"] == pytest.approx(1.0) for r in rows)
    assert all(r["pred_lang"] == "en" for r in rows)

    # packing of the composition == pack_sequences over the survivors
    survivors = _df(spark, [(1, DOC_A), (3, DOC_C)])
    exp = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in pack_sequences(survivors, budget=16).collect()
    }
    got = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in rows
    }
    assert got == exp
    # window coverage: each doc's packed segments sum to its token count
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], [0, r["n_tokens"]])
        per_doc[r["doc_id"]][0] += r["pack_end"] - r["pack_start"]
    for covered, n_tokens in per_doc.values():
        assert covered == n_tokens


def test_build_training_corpus_mixture_rate_drops_group(spark):
    """rate 0 for a group removes it; surviving group keeps weight 1/rate."""
    docs = _df(spark, [(1, DOC_A), (2, DOC_C)])
    out = _build(spark, docs, rates={"en": 0.0}, default_rate=0.0)
    assert out.count() == 0
    out2 = _build(spark, docs, rates={"en": 0.5})
    for r in out2.collect():
        assert r["weight"] == pytest.approx(2.0)


def test_build_training_corpus_durable_stage_resume(spark, tmp_path):
    """Crash after the 'clean' stage (stop_after), then resume with a
    POISONED input whose evaluation would raise — the restart skips the
    finished curation/decontamination stages (markers + tables) and the
    final packed table equals the one-shot in-memory build."""
    from pyspark.sql.functions import pandas_udf

    work = str(tmp_path / "build")
    docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_A)])
    ev = _df(spark, [(900, EVAL_DOC)])
    common = dict(
        rates=RATES, budget=16, lang_whitelist=("en", "und"),
        min_quality=0.0, decontam_n=5, n_buckets=4,
    )

    partial = build_training_corpus_durable(
        spark, docs, ev, work, stop_after="clean", **common
    )
    assert {r["doc_id"] for r in partial.collect()} == {1, 3}

    def _poison_fn(s):
        raise RuntimeError("stage 1/2 recomputed")

    poison = pandas_udf(_poison_fn, "string")
    poisoned = docs.withColumn("text", poison(F.col("text")))
    out = build_training_corpus_durable(
        spark, poisoned, ev, work, **common
    )
    got = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"], r["weight"])
        for r in out.collect()
    }
    exp = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"], r["weight"])
        for r in _build(spark, docs).collect()
    }
    assert got == exp

    # re-running the finished pipeline is a pure table read (idempotent)
    again = build_training_corpus_durable(spark, poisoned, ev, work, **common)
    assert again.count() == len(exp)


DOC_PII = (
    "the committee report was sent to alice@example.org from host "
    "10.1.2.3 with a callback at +1 (555) 010-4477 about the village "
    "harvest records and the festival plans for the coming season"
)


def test_build_pii_scrub_changes_token_counts(spark):
    """pii_scrub=True redacts between decontamination and packing:
    the PII doc's n_tokens shrinks (multi-token phone/email collapse to
    single class tokens) while PII-free docs are byte-identical."""
    docs = _df(spark, [(1, DOC_A), (5, DOC_PII)])
    raw = {r["doc_id"]: r["n_tokens"] for r in _build(spark, docs).collect()}
    red = {
        r["doc_id"]: r["n_tokens"]
        for r in _build(spark, docs, pii_scrub=True).collect()
    }
    assert red[1] == raw[1]  # untouched doc: identical token count
    # "+1 (555) 010-4477" (3 tokens) -> "<PHONE>" (1): counts shrink
    assert red[5] < raw[5]


def test_build_pii_scrub_matches_manual_composition(spark):
    """The flag is exactly scrub-then-sample-then-pack: the output
    equals curating+cleaning manually, scrubbing, and packing."""
    from srag_spark.operators.pii import scrub_pii
    from srag_spark.operators.corpus import pack_sequences

    docs = _df(spark, [(1, DOC_A), (3, DOC_C), (5, DOC_PII)])
    out = _build(spark, docs, pii_scrub=True)

    scrubbed = scrub_pii(docs).select(
        "doc_id", F.col("text_redacted").alias("text")
    )
    exp = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in pack_sequences(scrubbed, budget=16).collect()
    }
    got = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in out.collect()
    }
    assert got == exp


def test_build_durable_pii_clean_table_is_redacted(spark, tmp_path):
    """With pii_scrub=True the committed 'clean' stage artifact holds
    redacted text — a resumed run or downstream consumer of the durable
    table never sees raw PII."""
    work = str(tmp_path / "build_pii")
    docs = _df(spark, [(1, DOC_A), (5, DOC_PII)])
    ev = _df(spark, [(900, EVAL_DOC)])
    clean = build_training_corpus_durable(
        spark, docs, ev, work, rates=RATES, budget=16,
        lang_whitelist=("en", "und"), min_quality=0.0, decontam_n=5,
        n_buckets=4, pii_scrub=True, stop_after="clean",
    )
    texts = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert "<EMAIL>" in texts[5] and "<IP>" in texts[5] and "<PHONE>" in texts[5]
    assert "alice@example.org" not in texts[5]
    assert "10.1.2.3" not in texts[5]
    assert texts[1] == DOC_A


def test_build_mixture_spec_matches_manual_rates(spark):
    """rates=("unimax", B, cap) equals deriving the dict on the clean
    survivor set by hand and passing it explicitly."""
    from srag_spark.operators.corpus import derive_mixture_rates

    docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_A)])
    spec = ("unimax", 25.0, 1.0)
    # clean survivor set is {1, 3} (4 deduped, 2 contaminated), all 'en'
    survivors = spark.createDataFrame(
        [(1, DOC_A, "en"), (3, DOC_C, "en")],
        "doc_id long, text string, pred_lang string",
    )
    d = derive_mixture_rates(survivors, spec, group_col="pred_lang")
    assert 0.0 < d["en"] < 1.0  # budget below group capacity

    def key(rows):
        return {
            (r["doc_id"], r["pack_id"]): (
                r["pack_start"], r["pack_end"], r["weight"])
            for r in rows
        }

    got = key(_build(spark, docs, rates=spec).collect())
    exp = key(_build(spark, docs, rates=d).collect())
    assert got == exp


def test_build_durable_mixture_spec_matches_inmemory(spark, tmp_path):
    """The durable form derives spec rates on the committed clean table
    and reproduces the in-memory spec build exactly."""
    work = str(tmp_path / "build_spec")
    docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C), (4, DOC_A)])
    ev = _df(spark, [(900, EVAL_DOC)])
    spec = ("temperature", 40.0, 2.0)
    out = build_training_corpus_durable(
        spark, docs, ev, work, rates=spec, budget=16,
        lang_whitelist=("en", "und"), min_quality=0.0, decontam_n=5,
        n_buckets=4,
    )
    got = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"], r["weight"])
        for r in out.collect()
    }
    exp = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"], r["weight"])
        for r in _build(spark, docs, rates=spec).collect()
    }
    assert got == exp


def test_build_decontam_scrub_keeps_docs_and_cuts_spans(spark):
    """decontam_mode='scrub' retains the contaminated doc with its
    leaked region excised; the composition equals scrubbing manually
    and packing the survivors."""
    from srag_spark.operators.corpus import pack_sequences, scrub_contamination

    docs = _df(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_C)])
    ev = _df(spark, [(900, EVAL_DOC)])
    out = _build(spark, docs, decontam_mode="scrub")
    ids = {r["doc_id"] for r in out.collect()}
    assert 2 in ids  # retained under scrub (dropped under 'drop')

    scrubbed = scrub_contamination(docs, ev, n=5).select("doc_id", "text")
    srows = {r["doc_id"]: r["text"] for r in scrubbed.collect()}
    assert srows[1] == DOC_A and srows[3] == DOC_C  # clean docs intact
    assert "cooking pasta with tomato" not in srows[2]
    assert "harvest was plentiful" in srows[2]  # unleaked tail survives

    exp = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in pack_sequences(
            spark.createDataFrame(
                [(k, v) for k, v in srows.items()], "doc_id long, text string"
            ),
            budget=16,
        ).collect()
    }
    got = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in out.collect()
    }
    assert got == exp


def test_scrub_contamination_matches_brute(spark):
    """Span cut equals the brute-force interval union over matching
    window positions."""
    import hashlib

    from srag_spark.operators.corpus import scrub_contamination

    n = 3
    train = [(1, "a b c d e f g"), (2, "x y z a b c"), (3, "p q r s")]
    evald = [(9, "a b c")]
    got = {r["doc_id"]: r for r in scrub_contamination(
        _df(spark, train), _df(spark, evald), n=n).collect()}

    eh = {hashlib.md5(b"a b c").hexdigest()}
    for d, t in train:
        tk = t.split()
        cov = set()
        for p in range(max(0, len(tk) - n + 1)):
            h = hashlib.md5(" ".join(tk[p:p + n]).encode()).hexdigest()
            if h in eh:
                cov.update(range(p, p + n))
        kept = [w for i, w in enumerate(tk) if i not in cov]
        assert got[d]["text"] == " ".join(kept)
        assert got[d]["n_tokens"] == len(tk)
        assert got[d]["n_removed"] == len(cov)


def test_build_exact_substr_stage(spark):
    """exact_substr_n cuts a license block repeated across surviving
    docs from every occurrence but the corpus-wide first, and the
    composition equals stripping manually and packing."""
    from srag_spark.operators.corpus import pack_sequences
    from srag_spark.operators.substrings import strip_duplicate_spans

    block = "licensed under the creative commons attribution share alike terms"
    doc_d = (
        "meanwhile the observatory recorded unusual readings from the "
        "northern ridge where the winter survey team had mapped deep ice"
    )
    docs = _df(
        spark,
        [(1, DOC_A + " " + block), (3, DOC_C + " " + block), (5, block + " " + doc_d)],
    )
    n = 6
    out = _build(spark, docs, rates=RATES, exact_substr_n=n)
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 5}

    survivors = _df(
        spark,
        [(1, DOC_A + " " + block), (3, DOC_C + " " + block), (5, block + " " + doc_d)],
    )
    stripped = {r["doc_id"]: r for r in
                strip_duplicate_spans(survivors, n=n).collect()}
    # doc 1 holds the (1, pos)-first occurrence: intact; 3 and 5 lose it
    assert stripped[1]["n_removed"] == 0
    assert stripped[3]["n_removed"] > 0 and block not in stripped[3]["text"]
    assert stripped[5]["n_removed"] > 0 and block not in stripped[5]["text"]

    exp = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in pack_sequences(
            spark.createDataFrame(
                [(k, v["text"]) for k, v in stripped.items()],
                "doc_id long, text string",
            ),
            budget=16,
        ).collect()
    }
    got = {
        (r["doc_id"], r["pack_id"]): (r["pack_start"], r["pack_end"])
        for r in out.collect()
    }
    assert got == exp


def test_build_url_gate_front(spark):
    """url_col gates the build before curation: a doc on a blocked
    domain (or with a scored URL) never reaches the output even though
    its text would survive every later stage, and the gated build
    equals building on the manually pre-filtered input."""
    rows = [
        (1, DOC_A, "https://www.good.example.com/a"),
        (3, DOC_C, "https://blocked.example.net/fine/path"),
        (5, DOC_B, "https://ok.example.org/casino/poker-night"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = _build(
        spark,
        docs,
        url_col="url",
        url_blocklist=["blocked.example.net"],
    )
    assert {r["doc_id"] for r in out.collect()} == {1}

    manual = docs.filter(F.col("doc_id") == 1)
    exp = _build(spark, manual, url_col="url", url_blocklist=["blocked.example.net"])
    key = lambda r: tuple(r[c] for c in BUILD_COLUMNS)
    assert sorted(map(key, out.collect())) == sorted(map(key, exp.collect()))


def test_build_durable_url_gate(spark, tmp_path):
    rows = [
        (1, DOC_A, "https://www.good.example.com/a"),
        (3, DOC_C, "https://blocked.example.net/fine/path"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    ev = _df(spark, [(900, EVAL_DOC)])
    out = build_training_corpus_durable(
        spark,
        docs,
        ev,
        rates=RATES,
        budget=16,
        work_dir=str(tmp_path / "w"),
        lang_whitelist=("en", "und"),
        min_quality=0.0,
        decontam_n=5,
        url_col="url",
        url_blocklist=["blocked.example.net"],
        n_buckets=4,
    )
    assert {r["doc_id"] for r in out.collect()} == {1}
