"""Tokenized-dataset build: corpus.materialize_packs (subword-space
packing + sequence materialization) and the composed
plans/pretraining.build_tokenized_dataset (train → encode → pack →
shard)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from srag_spark.operators.bpe import apply_bpe, encode_word, train_bpe
from srag_spark.operators.corpus import materialize_packs, pack_sequences

SF_DIR = "/root/testdata/sf0.001"


def _tokdocs(spark):
    rows = [
        (0, ["a", "b", "c"]),
        (1, []),  # zero tokens → contributes nothing
        (2, ["d", "e", "f", "g", "h", "i", "j"]),
        (3, ["k", "l", "m", "n", "o"]),
        (4, ["p"]),
        (5, [f"q{i}" for i in range(12)]),  # straddles several windows
        (6, ["r", "s"]),
    ]
    return rows, spark.createDataFrame(
        rows, "doc_id long, bpe_tokens array<string>"
    )


def _stream(rows):
    out = []
    for _, toks in sorted(rows):
        out += toks
    return out


def test_materialize_packs_equals_python_cut(spark):
    """Packs tile the doc_id-ordered token stream: pack w holds
    stream[w*B:(w+1)*B] exactly — every pack full except the last."""
    rows, df = _tokdocs(spark)
    B = 4
    got = {
        r["pack_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in materialize_packs(df, B).collect()
    }
    stream = _stream(rows)
    want = {
        w: stream[w * B : (w + 1) * B]
        for w in range((len(stream) + B - 1) // B)
    }
    assert set(got) == set(want)
    for w, toks in want.items():
        assert got[w] == (toks, len(toks))
    full = [w for w in want if len(want[w]) == B]
    assert len(full) == len(want) - (1 if len(stream) % B else 0)


def test_materialize_packs_partition_independent_and_empty(spark):
    rows, df = _tokdocs(spark)
    a = {
        r["pack_id"]: list(r["tokens"])
        for r in materialize_packs(df, 5, n_partitions=2).collect()
    }
    b = {
        r["pack_id"]: list(r["tokens"])
        for r in materialize_packs(
            df.repartition(7), 5, n_partitions=11
        ).collect()
    }
    assert a == b and a
    assert materialize_packs(df.limit(0), 5).count() == 0


def test_materialize_packs_doc_spans(spark):
    """doc_spans are contiguous, tile each pack exactly, reproduce the
    tokens by doc, and agree with pack_sequences' assignment rows."""
    rows, df = _tokdocs(spark)
    B = 4
    out = sorted(
        materialize_packs(df, B, with_spans=True).collect(),
        key=lambda r: r["pack_id"],
    )
    toks_by_doc = dict(rows)
    consumed: dict = {}
    assignments = set()
    for r in out:
        spans = [tuple(s) for s in r["doc_spans"]]
        # contiguous tiling of [0, n_tokens)
        assert spans[0][1] == 0 and spans[-1][2] == r["n_tokens"]
        for (_, _, e0), (_, s1, _) in zip(spans, spans[1:]):
            assert e0 == s1
        for d, s, e in spans:
            got = list(r["tokens"])[s:e]
            off = consumed.get(d, 0)
            assert got == toks_by_doc[d][off : off + (e - s)]
            consumed[d] = off + (e - s)
            assignments.add((d, r["pack_id"], s, e))
    # every doc fully consumed, in order
    assert consumed == {d: len(t) for d, t in rows if t}
    # spans ≡ pack_sequences' (pack_start, pack_end) assignment rows
    want = {
        (r["doc_id"], r["pack_id"], r["pack_start"], r["pack_end"])
        for r in pack_sequences(
            df.withColumn("n", F.size("bpe_tokens")), B, count_col="n"
        ).collect()
    }
    assert assignments == want


def test_pack_sequences_count_col_matches_text_path(spark):
    """count_col packing over precomputed whitespace counts ≡ the text
    path — the subword generalization changes the denomination, not the
    window arithmetic."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    via_text = pack_sequences(docs, budget=64)
    counted = docs.select(
        "doc_id",
        F.size(F.array_remove(F.split("text", r"\s+"), "")).alias("n"),
    )
    via_count = pack_sequences(counted, budget=64, count_col="n")
    key = ["doc_id", "n_tokens", "pack_id", "pack_start", "pack_end"]
    assert sorted(map(tuple, via_text.select(*key).collect())) == sorted(
        map(tuple, via_count.select(*key).collect())
    )


def test_build_tokenized_dataset_end_to_end(spark, tmp_path):
    """Composed plan: merges trained on the corpus, packs reproduce the
    per-doc encode stream, shards round-trip with a correct manifest."""
    from srag_spark.plans.pretraining import build_tokenized_dataset

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    out = build_tokenized_dataset(
        docs, budget=32, n_merges=24, path=str(tmp_path / "ds"), n_shards=4
    )
    packs, merges, manifest = out["packs"], out["merges"], out["manifest"]
    assert len(merges) <= 24 and merges

    # packs tile the stream the frozen-merge encoder produces
    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in apply_bpe(docs, merges).select("doc_id", "bpe_tokens").collect()
    }
    stream = []
    for d in sorted(enc):
        stream += enc[d]
    got = {r["pack_id"]: list(r["tokens"]) for r in packs.collect()}
    for w, toks in got.items():
        assert toks == stream[w * 32 : (w + 1) * 32]
    assert sum(len(t) for t in got.values()) == len(stream)
    packs.unpersist()

    # shards: manifest counts match, reload reproduces every pack
    assert sum(manifest["counts"].values()) == len(got)
    back = spark.read.parquet(str(tmp_path / "ds"))
    # write_shards' layout keys rows as doc_id (its documented contract)
    assert {
        r["doc_id"]: list(r["tokens"]) for r in back.collect()
    } == got
    assert json.load(open(tmp_path / "ds" / "_shards.json"))


def test_build_tokenized_dataset_frozen_merges_deterministic(spark):
    """A frozen merge artifact makes the build a pure function of the
    corpus: two runs at different parallelism produce identical packs,
    and encode_word agrees with the distributed encoder."""
    from srag_spark.plans.pretraining import build_tokenized_dataset

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    merges = train_bpe(docs, n_merges=16)
    a = build_tokenized_dataset(docs, budget=16, merges=merges)
    b = build_tokenized_dataset(
        docs.repartition(9), budget=16, merges=merges
    )
    ga = {r["pack_id"]: list(r["tokens"]) for r in a["packs"].collect()}
    gb = {r["pack_id"]: list(r["tokens"]) for r in b["packs"].collect()}
    assert ga == gb and ga
    a["packs"].unpersist(), b["packs"].unpersist()

    from srag_spark.operators.dedup import words_col

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    one = docs.select(F.explode(words_col(F.col("text"))).alias("w")).first()
    if one:
        got = apply_bpe(
            spark.createDataFrame([(0, one["w"])], "doc_id long, text string"),
            merges,
        ).first()
        assert list(got["bpe_tokens"]) == encode_word(one["w"], ranks)
