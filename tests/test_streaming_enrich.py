"""Streaming dimension enrichment: per-epoch latest-snapshot joins."""

from __future__ import annotations

import glob

from srag_spark.sources.tables import upsert_by_key
from srag_spark.streaming.enrich import enrich_batch, start_enrichment_stream

DIM_SCHEMA = "doc_id string, lang string, source string"
EV_SCHEMA = "event_id long, doc_id string, action string"


def _dim(spark, path, rows):
    upsert_by_key(
        spark,
        path,
        spark.createDataFrame(rows, DIM_SCHEMA),
        ["doc_id"],
        n_buckets=4,
    )


def test_enrich_batch_left_join_and_dedup(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    _dim(spark, dim_path, [("d1", "en", "s1"), ("d2", "fr", "s2")])

    batch = spark.createDataFrame(
        [(1, "d1", "view"), (2, "d3", "view")], EV_SCHEMA
    )
    out = {r["event_id"]: (r["lang"], r["source"])
           for r in enrich_batch(spark, batch, dim_path, on="doc_id").collect()}
    assert out == {1: ("en", "s1"), 2: (None, None)}  # left join survives

    # dim_cols prunes; enrichment never fans out on (impossible) dup keys
    pruned = enrich_batch(
        spark, batch, dim_path, on="doc_id", dim_cols=["lang"]
    )
    assert set(pruned.columns) == {"event_id", "doc_id", "action", "lang"}
    assert pruned.count() == 2


def test_enrichment_stream_sees_dim_updates_between_epochs(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    _dim(spark, dim_path, [("d1", "en", "s1")])

    # epoch 1: one file, joined against dim v1
    spark.createDataFrame([(1, "d1", "view")], EV_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    stream = spark.readStream.schema(EV_SCHEMA).parquet(in_dir)
    q = start_enrichment_stream(
        stream, dim_path, out_dir, ckpt, on="doc_id", trigger_once=True
    )
    q.awaitTermination(120)

    # dim updates BETWEEN epochs; epoch 2 must see the new value
    _dim(spark, dim_path, [("d1", "de", "s1b")])
    spark.createDataFrame([(2, "d1", "click")], EV_SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    stream2 = spark.readStream.schema(EV_SCHEMA).parquet(in_dir)
    q2 = start_enrichment_stream(
        stream2, dim_path, out_dir, ckpt, on="doc_id", trigger_once=True
    )
    q2.awaitTermination(120)

    rows = {
        r["event_id"]: r["lang"]
        for d in glob.glob(f"{out_dir}/epoch=*")
        for r in spark.read.parquet(d).collect()
    }
    assert rows == {1: "en", 2: "de"}  # each epoch saw its then-current dim
