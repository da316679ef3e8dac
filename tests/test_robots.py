"""robots_rules / robots_gate: Spark ≡ frozen golden RFC-9309 subset."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from srag_spark.golden import parse_robots, robots_allowed
from srag_spark.operators.robots import robots_gate, robots_rules

ROBOTS = {
    # wildcard group, allow overrides inside disallowed subtree, tie
    "a.test": (
        "# site rules\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/pub\n"
        "Disallow: /dup\n"
        "Allow: /dup\n"
    ),
    # specific group silences the wildcard group entirely
    "b.test": (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: SragBot\nDisallow: /only\n"
    ),
    # adjacent user-agent lines share a group; Sitemap breaks adjacency
    "c.test": (
        "User-agent: other\n"
        "User-agent: sragbot\n"
        "Disallow: /shared\n"
        "Sitemap: https://c.test/s.xml\n"
        "User-agent: third\n"
        "Disallow: /thirdonly\n"
    ),
    # empty disallow ignored; comments and inline comments stripped
    "d.test": (
        "User-agent: sragbot # our bot\n"
        "Disallow:\n"
        "Disallow: /x # keep out\n"
    ),
    # no rules at all
    "e.test": "Sitemap: https://e.test/s.xml\n",
}

PATHS = [
    "/private/x", "/private/pub/y", "/dup/t", "/open", "/",
    "/only/z", "/shared/q", "/thirdonly/r", "/x/y",
]

AGENT = "sragbot"


def test_rules_match_golden(spark):
    df = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    )
    got = {
        (r["host"], r["allow"], r["prefix"])
        for r in robots_rules(df, AGENT).collect()
    }
    want = {
        (h, allow, prefix)
        for h, txt in ROBOTS.items()
        for (allow, prefix) in parse_robots(txt, AGENT)
    }
    assert got == want
    # spot-pin: specific group silences wildcard on b.test
    assert ("b.test", False, "/only") in want
    assert ("b.test", False, "/") not in want
    # adjacency: sragbot shares other's group on c.test, not third's
    assert ("c.test", False, "/shared") in want
    assert ("c.test", False, "/thirdonly") not in want
    # empty disallow ignored, inline comment stripped
    assert ("d.test", False, "/x") in want
    assert not any(h == "e.test" for h, _, _ in want)


def test_gate_matches_golden_verdicts(spark):
    robots_df = spark.createDataFrame(
        list(ROBOTS.items()), "host string, robots_txt string"
    )
    rules = robots_rules(robots_df, AGENT)
    urls = spark.createDataFrame(
        [
            (f"{h}:{p}", h, p)
            for h in list(ROBOTS) + ["nofile.test"]
            for p in PATHS
        ],
        "doc_id string, host string, path string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_gate(urls, rules).collect()
    }
    for h in list(ROBOTS) + ["nofile.test"]:
        parsed = parse_robots(ROBOTS.get(h, ""), AGENT)
        for p in PATHS:
            assert got[f"{h}:{p}"] == robots_allowed(parsed, p), (h, p)
    # spot-pin the precedence facts
    assert got["a.test:/private/x"] is False
    assert got["a.test:/private/pub/y"] is True   # longer allow wins
    assert got["a.test:/dup/t"] is True           # tie → allow
    assert got["b.test:/open"] is True            # wildcard silenced
    assert got["b.test:/only/z"] is False
    assert got["nofile.test:/"] is True           # no robots → allowed
