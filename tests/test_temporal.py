"""Tests for operators/temporal.py — as-of join + interval join."""

from __future__ import annotations

from datetime import datetime

import pytest

from srag_spark.operators.temporal import (
    asof_join,
    interval_join,
    rollup,
    rollup_up,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00"), 5.0),   # after two clicks
            (2, 10, _ts("2024-01-01 09:00:00"), 2.0),   # exactly AT a click
            (3, 10, _ts("2024-01-01 08:00:00"), 1.0),   # before any click
            (4, 20, _ts("2024-01-01 12:00:00"), 9.0),   # user with no clicks
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00"), 100),
            (10, _ts("2024-01-01 09:30:00"), 101),
            (10, _ts("2024-01-01 09:00:00"), 99),  # tie at 09:00 → max id 100
            (30, _ts("2024-01-01 01:00:00"), 300),  # user absent from left
        ],
        "user_id long, ts timestamp, click_id long",
    )
    return left, right


def test_asof_backward_inclusive(spark, sides):
    left, right = sides
    out = {r["event_id"]: r for r in asof_join(left, right).collect()}
    assert len(out) == 4
    # latest click at or before 10:00 is 09:30 (id 101), lag 1800s
    assert out[1]["click_id_r"] == 101 and out[1]["asof_lag_s"] == 1800
    # inclusive at the same instant; tie deduped to the max payload (100)
    assert out[2]["click_id_r"] == 100 and out[2]["asof_lag_s"] == 0
    # nothing at or before 08:00
    assert out[3]["click_id_r"] is None and out[3]["asof_lag_s"] is None
    # keyless user
    assert out[4]["click_id_r"] is None
    # left columns survive untouched
    assert out[1]["value"] == 5.0 and out[1]["user_id"] == 10


def test_asof_tolerance(spark, sides):
    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, tolerance_s=900).collect()
    }
    # 1800s-stale match discarded by a 900s tolerance
    assert out[1]["click_id_r"] is None and out[1]["asof_lag_s"] is None
    # 0s-stale match survives
    assert out[2]["click_id_r"] == 100


def test_asof_partitioning_independent(spark, sides):
    left, right = sides
    a = sorted(map(tuple, asof_join(left, right).collect()))
    b = sorted(
        map(
            tuple,
            asof_join(left.repartition(7), right.repartition(5)).collect(),
        )
    )
    assert a == b


@pytest.fixture(scope="module")
def interval_sides(spark):
    pts = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 02:00:00")),  # at a start boundary
            (2, 10, _ts("2024-01-01 04:00:00")),  # at an end boundary
            (3, 10, _ts("2024-01-01 03:30:00")),  # inside, two overlaps
            (4, 20, _ts("2024-01-01 03:00:00")),  # right key, no interval
        ],
        "event_id long, user_id long, ts timestamp",
    )
    base = int(_ts("2024-01-01 00:00:00").timestamp())
    iv = spark.createDataFrame(
        [
            (10, 0, base + 2 * 3600, base + 4 * 3600),  # [02:00, 04:00)
            (10, 1, base + 3 * 3600, base + 5 * 3600),  # [03:00, 05:00)
            (10, 2, base + 9 * 3600, base + 9 * 3600),  # empty → drops
            (30, 3, base, base + 24 * 3600),            # other key
        ],
        "user_id long, slot long, start_s long, end_s long",
    )
    return pts, iv


def test_interval_join_boundaries_and_overlap(spark, interval_sides):
    pts, iv = interval_sides
    rows = interval_join(pts, iv).collect()
    got = sorted((r["event_id"], r["slot"]) for r in rows)
    # 1: start-inclusive hit on slot 0 only; 2: end-exclusive miss on
    # slot 0 but inside slot 1; 3: inside both; 4: no interval for key
    assert got == [(1, 0), (2, 1), (3, 0), (3, 1)]
    by = {(r["event_id"], r["slot"]): r for r in rows}
    assert by[(1, 0)]["start_s"] == iv.collect()[0]["start_s"]


def test_interval_join_multicell_and_partitioning(spark, interval_sides):
    pts, iv = interval_sides
    # a small cell size forces intervals to span many cells: same result
    a = sorted(
        (r["event_id"], r["slot"])
        for r in interval_join(pts, iv, cell_s=300).collect()
    )
    b = sorted(
        (r["event_id"], r["slot"])
        for r in interval_join(
            pts.repartition(5), iv.repartition(3), cell_s=7200
        ).collect()
    )
    assert a == b == [(1, 0), (2, 1), (3, 0), (3, 1)]


def test_rollup_cascade_equals_direct(spark):
    """day-from-hour (and month-from-day-from-hour) must equal the
    direct aggregation from raw — the cascade's associativity."""
    import random

    rng = random.Random(7)
    rows = [
        (
            i,
            _ts("2024-01-01 00:00:00").replace(
                day=1 + rng.randrange(28),
                hour=rng.randrange(24),
                minute=rng.randrange(60),
            ),
            ["a", "b"][i % 2],
            round(rng.uniform(-100, 100), 6),
        )
        for i in range(400)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    hour = rollup(ev, "hour")
    day_cascade = rollup_up(hour, "day")
    day_direct = rollup(ev, "day")
    month_cascade = rollup_up(day_cascade, "month")
    month_direct = rollup(ev, "month")

    def key(df):
        return sorted(
            (
                r["bucket"],
                r["event_type"],
                r["n_events"],
                str(r["sum_value"]),
                round(r["min_value"], 9),
                round(r["max_value"], 9),
            )
            for r in df.collect()
        )

    assert key(day_cascade) == key(day_direct)
    assert key(month_cascade) == key(month_direct)
    # sanity: the cascade actually coarsens
    assert hour.count() > day_direct.count() > month_direct.count()


def test_funnel_orders_chain_and_window(spark):
    from srag_spark.operators.temporal import funnel

    def ev(u, e, s):
        return (u, e, datetime(2024, 1, 1, 0, 0, s))

    rows = [
        # u1: full ordered chain
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # u2: click BEFORE view → chain stops at view
        ev(2, "click", 0), ev(2, "view", 10),
        # u3: view+click, purchase before click → stops at click
        ev(3, "view", 0), ev(3, "purchase", 5), ev(3, "click", 10),
        # u4: never views (click+purchase only) → not in the funnel at all
        ev(4, "click", 0), ev(4, "purchase", 1),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {r["step"]: r for r in funnel(events).collect()}
    assert out["view"]["n_users"] == 3          # u1, u2, u3
    assert out["click"]["n_users"] == 2         # u1, u3 (u2's click precedes)
    assert out["purchase"]["n_users"] == 1      # u1 only
    assert abs(out["purchase"]["conv_from_first_r"] - round(1 / 3, 6)) < 1e-9

    # within_s: u1's purchase at +20s falls outside a 15s window
    w = {r["step"]: r["n_users"] for r in funnel(events, within_s=15).collect()}
    assert w.get("purchase", 0) == 0 or "purchase" not in w


def test_funnel_equal_timestamps_count(spark):
    from srag_spark.operators.temporal import funnel

    t0 = datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [(1, "view", t0), (1, "click", t0), (1, "purchase", t0)],
        "user_id long, event_type string, ts timestamp",
    )
    # ties at the same instant satisfy the at-or-after chain
    out = {r["step"]: r["n_users"] for r in funnel(events).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_cohort_retention_matrix(spark):
    from srag_spark.operators.temporal import cohort_retention

    day = 86400

    def ev(u, e, d):
        return (u, e, datetime(2024, 1, 1) + __import__("datetime").timedelta(days=d))

    rows = [
        # cohort week 0: u1 (active wk0 + wk1), u2 (wk0 only)
        ev(1, "signup", 0), ev(1, "view", 1), ev(1, "click", 8),
        ev(2, "signup", 2), ev(2, "view", 3),
        # u3 signs up in week 1, active week 2
        ev(3, "signup", 7), ev(3, "view", 15),
        # u4 never signs up: excluded entirely
        ev(4, "view", 0),
        # u5: activity BEFORE signup must not count as negative offset
        ev(5, "view", 0), ev(5, "signup", 8),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        (r["cohort_period"], r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention_r"]
        )
        for r in cohort_retention(events, period_days=7).collect()
    }
    periods = sorted({c for c, _ in out})
    w0, w1 = periods[0], periods[0] + 1
    # periods are epoch-aligned weeks (floor(epoch/604800)), so Jan 4
    # 2024 starts a new period: u1's day-8 click and u2's day-3 view
    # both land at offset 1 of the first cohort
    assert out[(w0, 0)] == (2, 2, 1.0)
    assert out[(w0, 1)] == (2, 2, 1.0)
    # second cohort: u3 (offsets 0 and 1), u5 (offset 0 only; its
    # pre-signup view is excluded rather than counted at offset -1)
    assert out[(w1, 0)] == (2, 2, 1.0)
    assert out[(w1, 1)] == (1, 2, 0.5)
    assert not any(off < 0 for _, off in out)
