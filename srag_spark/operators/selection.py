"""Data selection via importance resampling (DSIR, Xie et al. 2023 —
public spec): score every raw document by how much more likely its
hashed n-gram features are under a TARGET corpus distribution than
under the RAW corpus distribution, so a curation pipeline can resample
the raw pool toward the target domain (the standard recipe for steering
a 100 TB crawl toward a high-quality seed corpus).

Features are unigrams + bigrams of the frozen corpus lexer
(dedup.words_col), hashed into ``16**hash_chars`` buckets by md5 hex
prefix — the same engine-agnostic idiom the rest of the repo uses, so
the DuckDB oracle reproduces every bucket and every weight exactly.
Bucket distributions use add-``alpha`` smoothing over the full bucket
space.

Scale shape (the lm_perplexity/BM25-df pattern): the two bucket-count
passes are map-side-combinable groupBys whose results are bounded by
the BUCKET SPACE (16^hash_chars rows, never corpus size); the
log-ratio table is a bounded full-outer join broadcast to the scoring
pass; the scoring pass is one linear explode + broadcast join + per-doc
groupBy.  Nothing quadratic, nothing driver-side beyond two scalar
totals, and the exploded feature stream is recomputed, never persisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from srag_spark.operators.dedup import words_col


def dsir_features_col(text_col) -> "F.Column":
    """Unigram + bigram features of a text, as ``array<string>``
    (native HOFs, no UDF).  Bigrams are space-joined adjacent word
    pairs of the frozen lexer; texts under 2 words contribute only
    their unigrams."""
    w = words_col(text_col)
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def dsir_bucket_col(feat_col, hash_chars: int) -> "F.Column":
    """Feature -> hashed bucket: the first ``hash_chars`` hex digits of
    md5(feature) — 16^hash_chars buckets, identical in DuckDB."""
    return F.substring(F.md5(feat_col), 1, hash_chars)


def _bucket_counts(docs: DataFrame, text_col: str, hash_chars: int) -> DataFrame:
    """(bucket, c): corpus feature counts per hashed bucket — one
    explode + one map-side-combinable groupBy, output bounded by the
    bucket space."""
    return (
        docs.select(
            F.explode(dsir_features_col(F.col(text_col))).alias("feat")
        )
        .select(dsir_bucket_col(F.col("feat"), hash_chars).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    hash_chars: int = 3,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, logw_r): per-document DSIR log importance
    weight — sum over the doc's hashed n-gram features of
    ``ln p_target(bucket) - ln p_raw(bucket)``, where both bucket
    distributions are add-``alpha`` smoothed over the full
    16^hash_chars bucket space.  ``docs`` is the raw pool being scored
    (it also defines the raw distribution — the DSIR setup); ``target``
    is the seed corpus whose distribution the resampler steers toward.

    High ``logw_r`` = target-like; the resampling step is a separate,
    composable concern (feed the weights to a Gumbel top-k or a
    threshold keep — :func:`srag_spark.operators.corpus.sample_mixture`
    handles deterministic rate-based keeps).  Feature-less docs carry
    the empty-product weight ``logw_r = 0``.

    Reference parity: no reference counterpart — an original
    implementation of the public DSIR recipe (hashed bag-of-ngrams
    importance weights), added for the training-data pipeline family.
    """
    t_counts = _bucket_counts(target, text_col, hash_chars)
    r_counts = _bucket_counts(docs, text_col, hash_chars)

    b_space = float(16 ** hash_chars)
    n_t = t_counts.agg(F.sum("c")).collect()[0][0] or 0
    n_r = r_counts.agg(F.sum("c")).collect()[0][0] or 0
    t_denom = float(n_t) + alpha * b_space
    r_denom = float(n_r) + alpha * b_space

    lam = (
        t_counts.withColumnRenamed("c", "ct")
        .join(r_counts.withColumnRenamed("c", "cr"), "bucket", "full")
        .select(
            "bucket",
            (
                F.log((F.coalesce("ct", F.lit(0)) + alpha) / F.lit(t_denom))
                - F.log((F.coalesce("cr", F.lit(0)) + alpha) / F.lit(r_denom))
            ).alias("lam"),
        )
    )
    # buckets untouched by either corpus (possible when scoring a frame
    # that is not the raw-distribution frame)
    import math

    lam0 = math.log(alpha / t_denom) - math.log(alpha / r_denom)

    scored = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(dsir_features_col(F.col(text_col))).alias("feat"),
        )
        .withColumn("bucket", dsir_bucket_col(F.col("feat"), hash_chars))
        .join(F.broadcast(lam), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("feat").alias("n_feats"),
            F.sum(
                F.when(F.col("feat").isNotNull(),
                       F.coalesce("lam", F.lit(lam0)))
            ).alias("logw"),
        )
        .select(
            "doc_id",
            F.col("n_feats").cast("bigint").alias("n_feats"),
            F.round(F.coalesce("logw", F.lit(0.0)), 4).alias("logw_r"),
        )
    )
    return scored
