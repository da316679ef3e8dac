"""Composed web-corpus preclean — the compliance + site-dedup front end.

Chains the round-5 web-curation operators in the order a crawl
pipeline applies them, BEFORE content-level curation
(plans/curation.py) ever sees a byte:

  1. head metadata (links.extract_meta) → drop robots-noindex docs
     (the publisher page-level opt-out);
  2. optional robots.txt gate (operators/robots) → drop URLs the
     host's crawl rules disallow for our agent (the site-level
     opt-out);
  3. canonical-URL dedup (links.canonical_dedup) → collapse docs whose
     heads declare the same rel=canonical target (resolved against the
     page's own host) — exact, publisher-declared, cheaper than any
     content similarity;
  4. per-host template-line strip (dedup.host_boilerplate_flags) →
     remove site chrome from the survivors' text, rebuilding each doc
     from its kept lines.

Every stage is the already-tested operator; this plan only wires them
(single responsibility — the stages stay individually oracle-checked
on the driver board).  Scale shape: stages 1-3 are row-local or
groupBy-min + join-back; stage 4 is the two-census + equi-join shape;
nothing here adds a window or an unbounded collect.

Returns (clean_docs, stats) where stats is a 1-row census frame —
computed with ONE aggregate over the tagged union, not four count()
actions (each count would rerun the upstream chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from srag_spark.operators.dedup import host_boilerplate_flags
from srag_spark.operators.links import (
    canonical_dedup,
    extract_meta,
    host_of,
    resolve_href_col,
)
from srag_spark.operators.robots import robots_gate, robots_rules


def preclean_web_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "text",
    robots: DataFrame | None = None,
    agent: str = "sragbot",
    boilerplate_min_docs: int = 3,
    boilerplate_frac_permille: int = 500,
) -> tuple[DataFrame, DataFrame]:
    """Run the preclean chain; see the module docstring for the stages.

    ``robots``, when given, is a ``(host, robots_txt)`` frame; hosts
    without a file (or ``robots=None``) allow everything.  The chrome
    strip operates on ``html_col`` AS GIVEN under the line_dedup_flags
    line convention — feed it extracted text for content-level chrome
    removal, or raw HTML to catch byte-identical template markup (a
    line only counts as chrome when its normalized form repeats across
    the host's surviving docs).  The returned
    ``clean`` frame carries the input id/url plus ``clean_text`` (the
    chrome-stripped reassembly) and the head-metadata columns; ``stats``
    is one row: input / noindex-dropped / robots-dropped /
    canonical-dropped / surviving doc counts.
    """
    scheme = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1), F.lit("")),
        F.lit("https"),
    )
    host = host_of(F.col(url_col))
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    meta = extract_meta(docs, id_col=id_col, html_col=html_col)
    base = docs.join(meta, id_col).select(
        F.col(id_col),
        F.col(url_col),
        F.col(html_col),
        F.col("title"),
        F.col("description"),
        F.col("robots_noindex"),
        scheme.alias("_scheme"),
        host.alias("host"),
        path.alias("_path"),
        resolve_href_col(F.col("canonical"), scheme, host).alias(
            "_canon_url"
        ),
    )
    # stage verdicts are carried as columns so the census is ONE pass
    after_noindex = base.withColumn("_keep_noindex", ~F.col("robots_noindex"))
    if robots is not None:
        rules = robots_rules(robots, agent)
        gated = robots_gate(
            after_noindex, rules, id_col=id_col, host_col="host",
            path_col="_path",
        ).withColumnRenamed("allowed", "_keep_robots")
    else:
        gated = after_noindex.withColumn("_keep_robots", F.lit(True))
    # canonical dedup runs over the docs still alive after the two
    # compliance gates (a dropped doc must not win a canonical group)
    alive = gated.filter(F.col("_keep_noindex") & F.col("_keep_robots"))
    deduped = canonical_dedup(
        alive, id_col=id_col, url_col="_canon_url"
    ).withColumnRenamed("canonical_keep", "_keep_canonical")
    survivors = deduped.filter(F.col("_keep_canonical"))
    flags = host_boilerplate_flags(
        survivors,
        host_col="host",
        text_col=html_col,
        id_col=id_col,
        min_docs=boilerplate_min_docs,
        frac_permille=boilerplate_frac_permille,
    )
    rebuilt = (
        flags.filter(F.col("keep"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ).getField("line"),
                ". ",
            ).alias("clean_text")
        )
        .withColumnRenamed("doc_id", id_col)
    )
    clean = survivors.join(rebuilt, id_col, "left").select(
        id_col,
        url_col,
        "host",
        "title",
        "description",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
    stats = gated.join(
        deduped.select(id_col, "_keep_canonical"), id_col, "left"
    ).agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum((~F.col("_keep_noindex")).cast("long")).alias("n_noindex"),
        F.sum(
            (F.col("_keep_noindex") & ~F.col("_keep_robots")).cast("long")
        ).alias("n_robots_blocked"),
        F.sum(
            F.coalesce(~F.col("_keep_canonical"), F.lit(False)).cast(
                "long"
            )
        ).alias("n_canonical_dups"),
        F.sum(
            F.coalesce(F.col("_keep_canonical"), F.lit(False)).cast("long")
        ).alias("n_survivors"),
    )
    return clean, stats
