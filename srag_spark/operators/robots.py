"""robots.txt crawl-compliance gate — per-host rule parsing + URL verdicts.

The compliance complement of the head-metadata opt-out
(``links.extract_meta``'s robots_noindex): robots.txt is the
publisher's CRAWL-time contract, and a compliant corpus build filters
fetched URLs against it before anything else touches them.  The
reference service stores documents and has no crawl layer; these
operators follow the frozen bounded-RFC-9309 spec in
:func:`srag_spark.golden.parse_robots` / ``robots_allowed`` (literal
path prefixes, most-specific agent group, longest-match with
allow-wins-ties), pinned operator≡golden by tests/test_robots.py.

Scale shape: robots files are small (the de-facto cap is 500 KiB) so
the per-host line window in :func:`robots_rules` sorts only one file's
lines per host — bounded, never a skew hazard; the rule table it emits
is bounded by hosts × rules-per-host.  :func:`robots_gate` joins URLs
to rules on the host equi-key (AQE-splittable when one host dominates
the URL stream), filters to prefix matches, and reduces to the winning
rule with ONE map-side-combinable groupBy-max over
``struct(prefix_len, allow)`` — the longest-match/allow-ties rule IS
the struct ordering, so no window over a URL's candidate set exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_rules(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """``(host, allow, prefix, plen)`` — the rules of ``robots`` that
    apply to ``agent``, per host (the distributed twin of
    :func:`srag_spark.golden.parse_robots`).

    Frozen semantics: ``#`` comments stripped, ``key: value`` on the
    first colon, adjacent ``user-agent`` lines share a group, a group
    applies when it names the agent case-insensitively — and if any
    group does, wildcard-only groups are ignored (most-specific group);
    empty-valued allow/disallow lines are ignored.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.split(F.col("raw"), "#", 2)[0]).alias("clean"),
    )
    # other-key lines (Sitemap:, Crawl-delay:, ...) stay in the stream
    # here: they carry no rules but BREAK user-agent adjacency (golden's
    # last_was_ua reset), so they must be visible to the lag below
    parsed = lines.filter(F.col("clean").contains(":")).select(
        "host",
        "ln",
        F.lower(
            F.trim(F.substring_index(F.col("clean"), ":", 1))
        ).alias("key"),
        F.trim(
            F.expr("substring(clean, instr(clean, ':') + 1)")
        ).alias("value"),
    )
    w = Window.partitionBy("host").orderBy("ln")
    grouped = parsed.withColumn(
        "is_ua", F.col("key") == "user-agent"
    ).withColumn(
        # a user-agent line whose previous significant line was not a
        # user-agent line OPENS a group; the running count of openers
        # is the group id.  The window sorts one robots file's lines
        # per host — bounded by the file size, never a skew hazard.
        "gid",
        F.sum(
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("int")
        ).over(w),
    )
    agents = grouped.filter(F.col("is_ua")).select(
        "host", "gid", F.lower(F.col("value")).alias("ua")
    )
    flags = agents.groupBy("host", "gid").agg(
        F.max((F.col("ua") == agent.lower()).cast("int")).alias("specific"),
        F.max((F.col("ua") == "*").cast("int")).alias("wild"),
    )
    host_specific = flags.groupBy("host").agg(
        F.max("specific").alias("has_specific")
    )
    applying = (
        flags.join(host_specific, "host")
        .filter(
            (F.col("specific") == 1)
            | ((F.col("wild") == 1) & (F.col("has_specific") == 0))
        )
        .select("host", "gid")
    )
    return (
        grouped.filter(
            F.col("key").isin("allow", "disallow") & (F.col("value") != "")
        )
        .join(applying, ["host", "gid"])
        .select(
            "host",
            (F.col("key") == "allow").alias("allow"),
            F.col("value").alias("prefix"),
            F.length("value").alias("plen"),
        )
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """``urls`` plus an ``allowed`` verdict per row — longest-prefix
    match over :func:`robots_rules` output, allow winning equal-length
    ties, no matching rule (or no rules for the host) → allowed.

    The verdict is ``max(struct(plen, allow))`` over the matching
    rules — the RFC precedence IS the struct ordering — computed with
    one map-side-combinable groupBy, never a per-URL window; the
    urls×rules join is a host equi-join bounded by rules-per-host.
    """
    matched = (
        urls.select(
            F.col(id_col).alias("_id"),
            F.col(host_col).alias("host"),
            F.col(path_col).alias("path"),
        )
        .join(rules, "host")
        .filter(F.col("path").startswith(F.col("prefix")))
        .groupBy("_id")
        .agg(F.max(F.struct("plen", "allow")).alias("_best"))
        .select("_id", F.col("_best.allow").alias("_aw"))
    )
    return (
        urls.join(
            matched, urls[id_col] == matched["_id"], "left"
        )
        .withColumn("allowed", F.coalesce(F.col("_aw"), F.lit(True)))
        .drop("_id", "_aw")
    )
