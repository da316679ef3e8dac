"""URL-based document filtering — the first gate a web-crawl pipeline
applies, before reading any page content (RefinedWeb §3.1 "URL
filtering", CCNet, C4 all run a form of it).

Two public-recipe components, both row-local native column work:

* a **domain blocklist**: exact match of the URL's registered host
  against a curated list (RefinedWeb aggregates ~4.6M adult/fraud
  domains).  A bounded in-plan list compiles to ``isin``; a blocklist
  TABLE joins as a broadcast left join on the domain key (4.6M short
  strings ≈ 10^2 MB — still broadcast-size; past that, switch the flag
  join to a shuffle semi-join on ``domain``, stated here so the 100 TB
  reader knows the cliff).

* a **soft word score**: a weighted vocabulary of fragments
  (``casino``, ``webcam``, …) counted in the normalized URL; the doc
  drops when the weighted sum reaches a threshold.  Counting uses the
  ``(len(url) − len(replace(url, w, ''))) / len(w)`` identity so the
  DuckDB oracle reproduces every count byte-for-byte with no regex
  dialect in play.

No reference counterpart (the reference ingests curated uploads, not a
crawl); public-recipe citations only.  Everything here whole-stage-
codegens; the only possible shuffle is the optional blocklist-table
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default soft-scoring vocabulary — a deliberately tiny, documentation-
#: grade stand-in for RefinedWeb's weighted word list (theirs is curated
#: and much larger); swap via ``word_weights=``.
DEFAULT_WORD_WEIGHTS = {
    "casino": 0.8,
    "poker": 0.5,
    "webcam": 1.0,
    "escort": 1.0,
    "xxx": 1.0,
    "free-download": 0.4,
}


def url_domain_col(url_col) -> "F.Column":
    """Lowercased host part of a URL (``scheme://host[:port]/...``),
    with a leading ``www.`` stripped — the blocklist join key."""
    host = F.regexp_extract(
        F.lower(url_col), r"^[a-z][a-z0-9+.\-]*://([^/:?#]+)", 1
    )
    return F.regexp_replace(host, r"^www\.", "")


def url_word_score_col(url_col, word_weights: dict[str, float]) -> "F.Column":
    """Weighted fragment-occurrence score over the lowercased URL.
    Occurrences are plain substring counts via the length/replace
    identity — engine-agnostic, no regex."""
    u = F.lower(url_col)
    score = F.lit(0.0)
    for w in sorted(word_weights):
        frag = F.lit(w.lower())
        n = (F.length(u) - F.length(F.replace(u, frag))) / F.lit(float(len(w)))
        score = score + F.lit(float(word_weights[w])) * n
    return score


def url_filter_flags(
    docs: DataFrame,
    blocked_domains=(),
    word_weights: dict[str, float] | None = None,
    threshold: float = 1.0,
    url_col: str = "url",
) -> DataFrame:
    """Input columns + ``(domain, domain_blocked, url_score_r, keep)``.

    ``keep`` = the domain is not on the blocklist AND the soft word
    score stays below ``threshold``.  ``blocked_domains`` is either a
    bounded Python iterable (compiled to ``isin`` — zero joins) or a
    one-column DataFrame ``(domain)`` (broadcast left join — the 4.6M-
    domain shape).  Scores round to 6 for cross-engine hashing."""
    weights = DEFAULT_WORD_WEIGHTS if word_weights is None else word_weights
    out = docs.withColumn("domain", url_domain_col(F.col(url_col)))
    if isinstance(blocked_domains, DataFrame):
        bl = blocked_domains.select(
            F.col(blocked_domains.columns[0]).alias("domain")
        ).withColumn("_blk", F.lit(True))
        out = out.join(F.broadcast(bl), "domain", "left").withColumn(
            "domain_blocked", F.coalesce(F.col("_blk"), F.lit(False))
        ).drop("_blk")
    else:
        doms = sorted({d.lower() for d in blocked_domains})
        out = out.withColumn(
            "domain_blocked",
            F.col("domain").isin(doms) if doms else F.lit(False),
        )
    out = out.withColumn(
        "url_score_r", F.round(url_word_score_col(F.col(url_col), weights), 6)
    )
    return out.withColumn(
        "keep",
        ~F.col("domain_blocked") & (F.col("url_score_r") < F.lit(float(threshold))),
    )
