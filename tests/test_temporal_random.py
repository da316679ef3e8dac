"""Randomized cross-checks for operators/temporal.py against
independent references: pandas ``merge_asof`` for the as-of join and a
brute-force nested loop for the interval join."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
import pytest

from srag_spark.operators.temporal import asof_join, interval_join

BASE = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def random_sides(spark):
    rng = random.Random(123)
    # duplicate (user, ts) pairs on the right exercise the dedup rule
    left = [
        (i, rng.randrange(8), BASE + timedelta(seconds=rng.randrange(0, 86400, 60)))
        for i in range(300)
    ]
    right = [
        (1000 + i, rng.randrange(8), BASE + timedelta(seconds=rng.randrange(0, 86400, 120)))
        for i in range(200)
    ]
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [(u, t, i) for i, u, t in right],
        "user_id long, ts timestamp, click_id long",
    )
    return left, right, ldf, rdf


def _pandas_asof(left, right, tolerance_s=None):
    lp = pd.DataFrame(left, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        [(u, t, i) for i, u, t in right],
        columns=["user_id", "ts", "click_id"],
    )
    # the operator's frozen dedup rule: per (user, instant), max payload
    rp = (
        rp.groupby(["user_id", "ts"], as_index=False)["click_id"]
        .max()
        .sort_values("ts")
    )
    kw = {}
    if tolerance_s is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance_s)
    m = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward",
        allow_exact_matches=True, **kw,
    )
    out = {}
    for r in m.itertuples():
        out[r.event_id] = None if pd.isna(r.click_id) else int(r.click_id)
    return out


@pytest.mark.parametrize("tolerance_s", [None, 3600])
def test_asof_matches_pandas_merge_asof(spark, random_sides, tolerance_s):
    left, right, ldf, rdf = random_sides
    expected = _pandas_asof(left, right, tolerance_s)
    got = {
        r["event_id"]: r["click_id_r"]
        for r in asof_join(ldf, rdf, tolerance_s=tolerance_s).collect()
    }
    assert got == expected
    # lag sanity on the matched subset
    for r in asof_join(ldf, rdf, tolerance_s=tolerance_s).collect():
        if r["click_id_r"] is not None:
            assert r["asof_lag_s"] >= 0
            if tolerance_s is not None:
                assert r["asof_lag_s"] <= tolerance_s


def test_interval_join_matches_bruteforce(spark):
    rng = random.Random(99)
    pts = [
        (i, rng.randrange(6), BASE + timedelta(seconds=rng.randrange(86400)))
        for i in range(250)
    ]
    base_s = int(BASE.timestamp())
    ivs = []
    for j in range(60):
        s = base_s + rng.randrange(0, 86400, 30)
        ivs.append((j, rng.randrange(6), s, s + rng.randrange(0, 14400, 30)))
    expected = sorted(
        (p[0], iv[0])
        for p in pts
        for iv in ivs
        if p[1] == iv[1] and iv[2] <= p[2].timestamp() < iv[3]
    )
    pdf = spark.createDataFrame(pts, "event_id long, user_id long, ts timestamp")
    idf = spark.createDataFrame(
        ivs, "iv_id long, user_id long, start_s long, end_s long"
    )
    for cell in (300, 3600, 86400):
        got = sorted(
            (r["event_id"], r["iv_id"])
            for r in interval_join(pdf, idf, cell_s=cell).collect()
        )
        assert got == expected, f"cell_s={cell}"
