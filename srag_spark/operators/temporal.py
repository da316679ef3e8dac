"""Temporal joins Spark lacks as built-ins: as-of join + interval join.

Two classic event-table operators (SURVEY §8 additions family; the
reference's ingest has no temporal-join surface — these serve the
events/sessionization side the way the dedup family serves documents):

* :func:`asof_join` — for every left row, the single right row with the
  greatest ``right_time <= left_time`` for the same key (backward,
  inclusive — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics,
  Flink's temporal table join).  Spark has no native as-of; the naive
  formulations are a per-left-row subquery (quadratic) or an inequality
  theta-join (BroadcastNestedLoop — a scale-killer).  Implemented as
  the canonical distributed form: tag and UNION the two sides, hash-
  shuffle once on the key, and carry the last right payload forward
  with one ``last(ignorenulls)`` running window per key — linear, one
  shuffle, no join at all.  A hot key concentrates its sort in one
  task; the named mitigation at extreme key skew is time-slicing the
  key and carrying one boundary row per slice (the two-phase trick
  pack_sequences uses), documented rather than defaulted because the
  slice pass costs a second shuffle every run.

* :func:`interval_join` — (point, interval) pairs where
  ``start <= t < end`` per key.  The naive inequality join is again
  BroadcastNestedLoop; implemented as the standard GRID join: quantize
  time into ``cell_s`` buckets, explode each interval to the cells it
  covers, equi-join points (one cell each) on (keys, cell), then apply
  the exact containment predicate.  Explode factor is bounded by
  ``ceil(duration / cell_s)`` — pick ``cell_s`` near the median
  interval length.  Each (point, interval) pair can meet in at most
  one cell (the point's), so no dedup pass is needed.

* :func:`rollup` / :func:`rollup_up` — the TimescaleDB continuous-
  aggregate (hypertable rollup) pattern: associative partials at the
  finest resolution, every coarser level re-aggregated from the
  previous level's bounded partial table, the raw relation scanned
  exactly once.

The join operators' driver entries are oracle-checked against
genuinely INDEPENDENT DuckDB formulations (native ``ASOF JOIN``; an
IEJoin inequality join), and the rollup entry's oracle aggregates the
raw rows directly (day-from-hour must equal day-from-raw) — semantics
are cross-validated, not mirrored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    suffix: str = "_r",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: each left row picks the right row
    with the greatest ``right_time <= left_time`` for its key.

    Frozen semantics:

    * inclusive — a right row AT the left row's instant matches;
    * right rows sharing ``(key, right_time)`` are pre-deduplicated to
      the one with the greatest payload struct (columns in the order
      they appear in ``right``) — the deterministic "latest wins" rule
      both engines can state;
    * unmatched left rows survive with NULL right columns (left join);
    * ``tolerance_s`` (optional, seconds): a match older than the
      tolerance is discarded — the left row stays, right columns NULL
      (pandas ``merge_asof(tolerance=...)``).

    Output: every left column, each right payload column renamed with
    ``suffix`` (the key and time columns are not duplicated), plus
    ``asof_lag_s`` — whole seconds from match to left row (``floor``,
    NULL when unmatched).

    Plan: union + per-key running ``last(ignorenulls)`` window — one
    hash shuffle, zero joins (module docstring).
    """
    payload_cols = [c for c in right.columns if c not in (on, right_time)]
    r_us = F.unix_micros(F.col(right_time).cast("timestamp"))
    rt = (
        right.groupBy(
            F.col(on).alias("_k"), r_us.alias("_t")
        )
        .agg(F.max(F.struct(*payload_cols)).alias("_rrow"))
        .select("_k", "_t", F.lit(0).alias("_side"), "_rrow")
    )
    l_us = F.unix_micros(F.col(left_time).cast("timestamp"))
    lt = left.select(
        F.col(on).alias("_k"),
        l_us.alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_rrow"].dataType).alias("_rrow"),
        F.struct(*left.columns).alias("_lrow"),
    )
    u = lt.unionByName(rt.withColumn("_lrow", F.lit(None).cast(lt.schema["_lrow"].dataType)))
    # right rows sort BEFORE left rows at the same instant → inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_row = F.last("_rrow", ignorenulls=True).over(w)
    carry_t = F.last(
        F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True
    ).over(w)
    matched = (
        u.withColumn("_m", carry_row)
        .withColumn("_mt", carry_t)
        .filter(F.col("_side") == 1)
    )
    if tolerance_s is not None:
        in_tol = (F.col("_t") - F.col("_mt")) <= int(tolerance_s) * 1_000_000
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m"))
        ).withColumn("_mt", F.when(in_tol, F.col("_mt")))
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload_cols
    ]
    out_cols.append(
        F.floor((F.col("_t") - F.col("_mt")) / 1_000_000)
        .cast("long")
        .alias("asof_lag_s")
    )
    return matched.select(*out_cols)


ROLLUP_AGGS = ("n_events", "sum_value", "min_value", "max_value")


def rollup(
    events: DataFrame,
    granularity: str = "hour",
    time_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Base-level rollup partials: per (``date_trunc(granularity)``,
    keys) — ``(bucket, *keys, n_events, sum_value, min_value,
    max_value)``.  The TimescaleDB continuous-aggregate / hypertable
    rollup pattern: the partials are ASSOCIATIVE (count/sum/min/max;
    ``sum_value`` is exact ``decimal(18,6)`` so re-aggregation is
    order-independent — a double sum would drift by summation-order
    ulps across levels and engines), so coarser resolutions roll up
    from finer ones via :func:`rollup_up` without touching raw rows
    again.  One map-side-combinable groupBy.
    """
    return events.groupBy(
        F.date_trunc(granularity, F.col(time_col).cast("timestamp")).alias(
            "bucket"
        ),
        *keys,
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_value"),
        F.min(F.col(value_col)).alias("min_value"),
        F.max(F.col(value_col)).alias("max_value"),
    )


def rollup_up(
    partials: DataFrame,
    granularity: str = "day",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Re-aggregate finer rollup partials (:func:`rollup` output shape)
    to a coarser ``granularity`` WITHOUT re-reading raw events — the
    cascade step of a continuous-aggregate hierarchy (minute → hour →
    day → month).  At 100 TB the raw relation is scanned exactly once
    for the finest level; every coarser level aggregates the previous
    level's bounded partial table.  Correctness rests on the partials'
    associativity, pinned by the oracle entry (day-from-hour must equal
    day-from-raw) and tests."""
    return partials.groupBy(
        F.date_trunc(granularity, F.col("bucket")).alias("bucket"), *keys
    ).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value").cast("decimal(18,6)").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str = "ts",
    start_col: str = "start_s",
    end_col: str = "end_s",
    keys: tuple[str, ...] = ("user_id",),
    cell_s: int = 3600,
) -> DataFrame:
    """Grid-bucketed interval containment join: every (point, interval)
    pair with matching ``keys`` and ``start_s <= t < end_s``.

    Frozen semantics: ``start_s``/``end_s`` are epoch SECONDS (bigint);
    containment compares at microsecond precision (start inclusive, end
    exclusive); empty or inverted intervals (``end_s <= start_s``)
    match nothing; a point inside two overlapping intervals emits two
    rows.  Output: all point columns + all interval columns (shared key
    columns not duplicated).

    Plan: one explode bounded by ``ceil(duration / cell_s)`` cells per
    interval, one equi-join on (keys, cell), exact predicate after —
    never a nested-loop (module docstring).
    """
    cell_us = int(cell_s) * 1_000_000
    p_us = F.unix_micros(F.col(point_time).cast("timestamp"))
    pts = points.withColumn("_us", p_us).withColumn(
        "_cell", F.floor(F.col("_us") / cell_us)
    )
    s_us = F.col(start_col).cast("long") * 1_000_000
    e_us = F.col(end_col).cast("long") * 1_000_000
    iv = (
        intervals.filter(e_us > s_us)
        .withColumn(
            "_cell",
            F.explode(
                F.sequence(
                    F.floor(s_us / cell_us), F.floor((e_us - 1) / cell_us)
                )
            ),
        )
    )
    key_list = list(keys) + ["_cell"]
    joined = pts.join(iv, key_list).filter(
        (F.col("_us") >= s_us) & (F.col("_us") < e_us)
    )
    out = [c for c in points.columns] + [
        c for c in intervals.columns if c not in points.columns
    ]
    return joined.select(*out)


def funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_s: float | None = None,
) -> DataFrame:
    """Ordered-funnel analysis (the MATCH_RECOGNIZE-class sequential
    pattern): for each user, step k counts only if an event of
    ``steps[k]`` occurs AT OR AFTER the user's matched step-(k-1) event
    — the earliest valid chain is taken (first step-1 event, then the
    first step-2 event from there, ...).  ``within_s`` additionally
    bounds the whole chain to ``steps[0]``'s timestamp + the window.
    Output: one row per step — ``(step_index, step, n_users,
    conv_from_first_r)`` where the rate is against step 1's cohort.

    Scale shape: the classic cascaded conditional-min — one
    (user-keyed, map-side-combinable) groupBy per step over the
    step-filtered event stream, each joined user-to-user onto the
    previous step's bounded per-user relation (AQE broadcasts it when
    small).  No per-user event collection, no windows over raw events,
    nothing quadratic in events; passes = len(steps), each linear.
    The final census is a groupBy over the per-user chain relation
    (bounded by users, not events)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    u, t = F.col(user_col), F.col(ts_col)
    base = events.select(
        u.alias("_u"), F.col(type_col).alias("_e"), t.alias("_t")
    ).filter(F.col("_e").isin(*steps))

    chain = (
        base.filter(F.col("_e") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_t1"))
    )
    reached = [chain]
    prev_ts = "_t1"
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            base.filter(F.col("_e") == step)
            .join(reached[-1], "_u")
            .filter(F.col("_t") >= F.col(prev_ts))
        )
        if within_s is not None:
            nxt = nxt.filter(
                F.col("_t") <= F.col("_t1") + F.expr(f"INTERVAL {within_s} SECONDS")
            )
        nxt = nxt.groupBy("_u", *[f"_t{i}" for i in range(1, k)]).agg(
            F.min("_t").alias(f"_t{k}")
        )
        reached.append(nxt)
        prev_ts = f"_t{k}"

    # one engine-side census over the union of the per-step user
    # relations (each bounded by users) — a single action for the
    # caller, no driver-side counts
    tagged = [
        r.select(
            F.lit(i + 1).alias("step_index"),
            F.lit(steps[i]).alias("step"),
            F.col("_u"),
        )
        for i, r in enumerate(reached)
    ]
    allr = tagged[0]
    for tg in tagged[1:]:
        allr = allr.unionByName(tg)
    per_step = allr.groupBy("step_index", "step").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    # k result rows: the empty-frame global window is bounded by design
    first = F.max(
        F.when(F.col("step_index") == 1, F.col("n_users"))
    ).over(Window.partitionBy())
    return per_step.select(
        "step_index",
        "step",
        "n_users",
        F.round(F.col("n_users") / first, 6).alias("conv_from_first_r"),
    ).orderBy("step_index")


def cohort_retention(
    events: DataFrame,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    period_days: int = 7,
    max_periods: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period (e.g.
    week) of their FIRST ``cohort_event``; a cohort member counts as
    retained in period offset k if they have ANY event in the k-th
    period after their cohort period.  Output: one row per
    ``(cohort_period, period_offset)`` — ``(cohort_period,
    period_offset, n_active, cohort_size, retention_r)``.  Offset 0 is
    the cohort period itself; negative offsets (activity before
    signup) are excluded.

    Scale shape: the cohort relation is one user-keyed combinable
    groupBy (min ts of the cohort event); activity is a distinct over
    (user, period) — bounded by users × periods, far below raw events;
    the join onto cohorts is user-keyed (cohorts are one row per user,
    AQE-broadcast when small) and the final census is a tiny-key
    groupBy over (cohort, offset).  No windows over raw events,
    nothing quadratic."""
    u, t = F.col(user_col), F.col(ts_col)
    period = (F.unix_timestamp(t) / F.lit(86400 * period_days)).cast("long")
    cohorts = (
        events.filter(F.col(type_col) == cohort_event)
        .select(u.alias("_u"), period.alias("_cp"))
        .groupBy("_u")
        .agg(F.min("_cp").alias("cohort_period"))
    )
    activity = events.select(u.alias("_u"), period.alias("_p")).distinct()
    joined = activity.join(cohorts, "_u").select(
        "_u",
        "cohort_period",
        (F.col("_p") - F.col("cohort_period")).cast("int").alias("period_offset"),
    ).filter(F.col("period_offset") >= 0)
    if max_periods is not None:
        joined = joined.filter(F.col("period_offset") < max_periods)
    sizes = cohorts.groupBy("cohort_period").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        joined.groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention_r"
            ),
        )
        .orderBy("cohort_period", "period_offset")
    )
