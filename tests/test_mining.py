"""Retrieval-training-set mining (operators/mining.py): ICT window
arithmetic (contiguity, multiset preservation, eligibility, seed
sensitivity, partition independence), hard-negative invariants
(positive/self exclusion, margin gate, exclusion set, LSH ⊆ brute),
and the driver entries against their DuckDB oracles."""

from __future__ import annotations

import re

import duckdb
import pytest

from pyspark.sql import functions as F

from srag_spark.operators.mining import ict_pairs, mine_hard_negatives

SF_DIR = "/root/testdata/sf0.001"


def _norm_words(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if w]


def test_ict_query_is_contiguous_window(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = {r["doc_id"]: r for r in ict_pairs(docs, 8, 16).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert pairs
    for doc_id, r in list(pairs.items())[:25]:
        words = _norm_words(texts[doc_id])
        qw = r["query"].split(" ")
        pw = r["passage"].split(" ") if r["passage"] else []
        assert len(qw) == 8
        assert words[r["pick"] * 8 : r["pick"] * 8 + 8] == qw
        assert sorted(qw + pw) == sorted(words)
        assert 0 <= r["pick"] < len(words) // 8


def test_ict_eligibility_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "only five words right here now"),  # 6 words < 16: skipped
         (2, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    out = ict_pairs(docs, query_words=8, min_words=16).collect()
    assert [r["doc_id"] for r in out] == [2]
    with pytest.raises(ValueError):
        ict_pairs(docs, query_words=0)
    with pytest.raises(ValueError):
        ict_pairs(docs, query_words=8, min_words=10)


def test_ict_seed_and_partition_independence(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    a = {(r["doc_id"], r["pick"]) for r in ict_pairs(docs, 8, 16, seed=0).collect()}
    b = {(r["doc_id"], r["pick"]) for r in ict_pairs(docs, 8, 16, seed=7).collect()}
    assert {d for d, _ in a} == {d for d, _ in b}  # same eligibility
    assert a != b  # picks move with the seed
    one = {
        tuple(r)
        for r in ict_pairs(docs.repartition(1), 8, 16, seed=0).collect()
    }
    many = {
        tuple(r)
        for r in ict_pairs(docs.repartition(13), 8, 16, seed=0).collect()
    }
    assert one == many


def _pairs(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        (F.col("vec_id") + 1).alias("pos_id"),
    )


def test_hard_negatives_invariants(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = mine_hard_negatives(emb, _pairs(emb), k_neg=5).collect()
    assert len(out) == 25
    for r in out:
        assert r["neg_id"] != r["pos_id"]
        assert r["score_r"] < r["pos_score_r"]  # margin=0, strict
        assert 1 <= r["rank"] <= 5
    # per query: ranks contiguous and scores non-increasing
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, 6))
        scores = [r["score_r"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_hard_negatives_margin_gate(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    loose = mine_hard_negatives(emb, _pairs(emb), k_neg=5, margin=0.0)
    tight = mine_hard_negatives(emb, _pairs(emb), k_neg=5, margin=0.5)
    lmax = loose.groupBy("query_id").agg(F.max("score_r").alias("m")).collect()
    tmax = {r["query_id"]: r["m"] for r in
            tight.groupBy("query_id").agg(F.max("score_r").alias("m")).collect()}
    pos = {r["query_id"]: r["pos_score_r"] for r in loose.collect()}
    for r in lmax:
        qid = r["query_id"]
        if qid in tmax:
            assert tmax[qid] < round(pos[qid] - 0.5, 6)


def test_hard_negatives_exclusion_set(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = mine_hard_negatives(emb, _pairs(emb), k_neg=3)
    banned = base.filter(F.col("rank") == 1).select(
        "query_id", F.col("neg_id").alias("vec_id")
    )
    out = mine_hard_negatives(emb, _pairs(emb), k_neg=3, exclude=banned)
    banned_set = {(r["query_id"], r["vec_id"]) for r in banned.collect()}
    for r in out.collect():
        assert (r["query_id"], r["neg_id"]) not in banned_set
    # the old rank-2 negative is the new rank-1
    old = {(r["query_id"], r["rank"]): r["neg_id"] for r in base.collect()}
    new = {(r["query_id"], r["rank"]): r["neg_id"] for r in out.collect()}
    for (qid, rank), neg in new.items():
        if (qid, rank + 1) in old:
            assert old[(qid, rank + 1)] == neg


def test_hard_negatives_lsh_subset_of_brute(spark):
    """Every LSH-mined negative must appear in the brute candidate
    ordering with the same score (the LSH path only PRUNES candidates,
    never invents or rescores them)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = mine_hard_negatives(emb, _pairs(emb), k_neg=500)
    lsh = mine_hard_negatives(
        emb, _pairs(emb), k_neg=5, method="lsh", dim=64, n_planes=8, probes=2
    )
    bscores = {(r["query_id"], r["neg_id"]): r["score_r"] for r in brute.collect()}
    rows = lsh.collect()
    assert rows  # 8 planes over 500 vecs: candidates exist
    for r in rows:
        assert bscores[(r["query_id"], r["neg_id"])] == r["score_r"]
    with pytest.raises(ValueError, match="dim"):
        mine_hard_negatives(emb, _pairs(emb), method="lsh")
    with pytest.raises(ValueError, match="unknown method"):
        mine_hard_negatives(emb, _pairs(emb), method="exact")


def test_driver_entries_match_oracle(spark):
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    for name in ("train_ict_pairs", "train_hard_negatives"):
        sdf = entrymod.queries()[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        orows = [tuple(r) for r in con.execute(entrymod.oracle_sql()[name]).fetchall()]
        assert srows == orows, name
        assert srows


def test_paraphrase_pairs_window_and_exclusions(spark):
    """Pairs land strictly inside [tau_lo, tau_hi); exact-identical
    normalized texts never pair regardless of the window; the pair set
    is the banded candidate set filtered (subset of the dedup pairs)."""
    from srag_spark.operators.dedup import minhash_dedup_pairs
    from srag_spark.operators.mining import paraphrase_pairs

    import __spark_entry__ as entrymod

    docs = entrymod._augmented_docs(spark, SF_DIR)
    out = paraphrase_pairs(docs, tau_lo=0.3, tau_hi=1.0).collect()
    assert out
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(docs).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert 0.3 <= r["est_jaccard"] < 1.0
        assert full[(r["doc_a"], r["doc_b"])] == r["est_jaccard"]
        assert _norm_words(texts[r["doc_a"]]) != _norm_words(texts[r["doc_b"]])
    # widening the ceiling past 1.0 admits est==1.0 pairs ONLY when
    # their texts differ (signature saturation, not identity)
    wide = paraphrase_pairs(docs, tau_lo=0.3, tau_hi=1.01).collect()
    for r in wide:
        if r["est_jaccard"] == 1.0:
            assert _norm_words(texts[r["doc_a"]]) != _norm_words(texts[r["doc_b"]])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        paraphrase_pairs(docs, tau_lo=0.9, tau_hi=0.5)


def test_paraphrase_entry_matches_oracle(spark):
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    sdf = entrymod.queries()["train_paraphrase_pairs"](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    orows = [
        tuple(r)
        for r in con.execute(
            entrymod.oracle_sql()["train_paraphrase_pairs"]
        ).fetchall()
    ]
    assert srows == orows and srows


def _bt_sets(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = emb.filter(F.col("vec_id") < 50)
    tgt = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 120))
    return emb, src, tgt


def test_bitext_margin_matches_python_twin(spark):
    """The integer micro-unit margin must equal a pure-python replay of
    the Artetxe-Schwenk ratio over the same quantized scores."""
    from srag_spark.operators.mining import mine_bitext

    _, src, tgt = _bt_sets(spark)
    got = {
        (r["src_id"], r["tgt_id"]): (r["score_r"], r["margin_r"])
        for r in mine_bitext(src, tgt, k=4, threshold=1.0, mutual=False).collect()
    }
    S = {r["vec_id"]: r["embedding"] for r in src.collect()}
    T = {r["vec_id"]: r["embedding"] for r in tgt.collect()}
    su = {
        (a, b): round(sum(float(x) * float(y) for x, y in zip(va, vb)) * 1e6)
        for a, va in S.items()
        for b, vb in T.items()
    }
    fa = {
        a: sorted(((su[(a, b)], b) for b in T), key=lambda t: (-t[0], t[1]))[:4]
        for a in S
    }
    ba = {
        b: sorted(((su[(a, b)], a) for a in S), key=lambda t: (-t[0], t[1]))[:4]
        for b in T
    }
    best = {}
    for a in S:
        fs, fc = sum(v for v, _ in fa[a]), len(fa[a])
        cands = []
        for b in T:
            bs, bc = sum(v for v, _ in ba[b]), len(ba[b])
            den = fs * bc + bs * fc
            if den == 0:
                continue
            cands.append((round(2 * fc * bc * su[(a, b)] / den, 6), b))
        m, b = max(cands, key=lambda t: (t[0], -t[1]))
        # max with tie on margin → smaller tgt_id; emulate rank order
        ties = [bb for mm, bb in cands if mm == m]
        b = min(ties)
        if m >= 1.0:
            best[(a, b)] = (su[(a, b)] / 1e6, m)
    assert got == best


def test_bitext_mutual_subset_and_uniqueness(spark):
    from srag_spark.operators.mining import mine_bitext

    _, src, tgt = _bt_sets(spark)
    fwd = mine_bitext(src, tgt, k=4, threshold=1.0, mutual=False).collect()
    mut = mine_bitext(src, tgt, k=4, threshold=1.0, mutual=True).collect()
    fwd_pairs = {(r["src_id"], r["tgt_id"]) for r in fwd}
    mut_pairs = {(r["src_id"], r["tgt_id"]) for r in mut}
    assert mut_pairs and mut_pairs <= fwd_pairs
    assert len(fwd_pairs) == len({a for a, _ in fwd_pairs})  # one per src
    # threshold monotone: raising it can only shrink the pair set
    hi = {
        (r["src_id"], r["tgt_id"])
        for r in mine_bitext(src, tgt, k=4, threshold=1.2, mutual=False).collect()
    }
    assert hi <= fwd_pairs
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mine_bitext(src, tgt, k=0)


def test_bitext_entry_matches_oracle(spark):
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    sdf = entrymod.queries()["train_bitext_pairs"](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    orows = [
        tuple(r)
        for r in con.execute(entrymod.oracle_sql()["train_bitext_pairs"]).fetchall()
    ]
    assert srows == orows and srows


# ---------------------------------------------------------------------------
# plans/mining.build_retrieval_trainset — the composed trainset build
# ---------------------------------------------------------------------------
def test_trainset_build_shape_and_order(spark):
    from srag_spark.plans.mining import build_retrieval_trainset

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    out = build_retrieval_trainset(docs, k_neg=4)
    rows = out.collect()
    assert rows
    for r in rows:
        assert len(r["neg_ids"]) == len(r["neg_texts"]) == len(r["neg_scores"])
        assert len(r["neg_ids"]) <= 4
        assert r["doc_id"] not in r["neg_ids"]  # gold never a negative
        assert r["neg_scores"] == sorted(r["neg_scores"], reverse=True)
    out.unpersist()


def test_trainset_negatives_match_operator(spark):
    """The composed plan's negatives equal mine_hard_negatives run
    directly on the same embedded pairs — composition adds assembly,
    never different verdicts."""
    from srag_spark.functions.embedding import embed_udf
    from srag_spark.operators.mining import ict_pairs, mine_hard_negatives
    from srag_spark.plans.mining import build_retrieval_trainset

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    out = {r["doc_id"]: r for r in build_retrieval_trainset(docs, k_neg=3).collect()}

    pairs = ict_pairs(docs)
    emb = pairs.select(
        "doc_id",
        embed_udf(F.col("query")).alias("qvec"),
        embed_udf(F.col("passage")).alias("pvec"),
    ).persist()
    corpus = emb.select(F.col("doc_id").alias("vec_id"), F.col("pvec").alias("embedding"))
    queries = emb.select(
        F.col("doc_id").alias("query_id"), "qvec", F.col("doc_id").alias("pos_id")
    )
    want: dict = {}
    for r in mine_hard_negatives(corpus, queries, k_neg=3).collect():
        want.setdefault(r["query_id"], []).append((r["rank"], r["neg_id"]))
    emb.unpersist()
    for qid, lst in want.items():
        assert [n for _, n in sorted(lst)] == list(out[qid]["neg_ids"]), qid
    # docs that mined zero negatives keep empty arrays
    for qid, r in out.items():
        if qid not in want:
            assert list(r["neg_ids"]) == []


def test_trainset_injected_embedder_and_empty_negatives(spark):
    import numpy as np

    from srag_spark.plans.mining import build_retrieval_trainset

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    # a huge margin filters every candidate: pairs survive with empty arrays
    out = build_retrieval_trainset(docs, k_neg=3, margin=2.0)
    rows = out.collect()
    assert rows and all(list(r["neg_ids"]) == [] for r in rows)
    out.unpersist()

    def const_embed(texts):
        return [
            np.full(8, 0.5, dtype=np.float32)
            if t
            else np.zeros(8, dtype=np.float32)
            for t in texts
        ]

    out2 = build_retrieval_trainset(docs, k_neg=2, embed_fn=const_embed)
    # constant embeddings: every pair scores 2.0 == pos score → the
    # strict margin gate drops everything; rows still come back
    rows2 = out2.collect()
    assert rows2 and all(list(r["neg_ids"]) == [] for r in rows2)
    out2.unpersist()
