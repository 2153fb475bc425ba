"""Event-sequence analytics: ordered funnels + cohort retention.

The two workhorse product-analytics queries over an event stream,
expressed as pure DataFrame plans (no UDF, no per-user sorting into
Python):

* `funnel`: how far does each user get through an ORDERED step
  sequence — stage i counts only if it happens strictly after the
  user's stage i-1 time (the semantics SQL window engines implement
  as "windowFunnel"). k-1 chained (join + min-aggregation) rounds,
  each keyed by user — at 10^12 events every round is one key-grouped
  shuffle of per-user scalars, never a per-user event sort.
* `cohort_retention`: users grouped by first-activity period, counted
  in each later period — two key-grouped aggregations and one join.

The reference repo has no event analytics; this extends the engine's
events surface (tumbling windows, sessionization) with the funnel /
retention pair every analytics engine ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(user, stages_reached, t_1..t_k) for users who completed at
    least stage 1. stage_ts[i] = MIN ts of steps[i] STRICTLY after
    stage_ts[i-1]; stages_reached = number of non-null stage times.
    Strict ordering means same-timestamp step pairs do not chain —
    deterministic and replayable in SQL."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    u = F.col(user_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(F.col(ts_col)).alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .select(u.alias("user"), F.col(ts_col).alias("_ts"))
            .join(cur.select("user", F.col(f"t_{i - 1}").alias("_prev")),
                  "user")
            .where(F.col("_ts") > F.col("_prev"))
            .groupBy("user")
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
        cur = cur.join(nxt, "user", "left")
    reached = None
    for i in range(1, len(steps) + 1):
        term = F.col(f"t_{i}").isNotNull().cast("int")
        reached = term if reached is None else reached + term
    return cur.select(
        "user",
        reached.alias("stages_reached"),
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): cohort = the user's
    first-activity week (date_trunc, Monday-aligned in both Spark and
    DuckDB), counted distinct in every week they return. Two
    key-grouped aggregations + one join — the cohort table carries one
    row per user, the activity table one row per (user, week)."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = (
        events.groupBy(F.col(user_col).alias("user"))
        .agg(F.min(wk).alias("cohort_week"))
    )
    activity = events.select(
        F.col(user_col).alias("user"), wk.alias("wk")
    ).distinct()
    return (
        activity.join(first, "user")
        .select(
            "user",
            "cohort_week",
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user").alias("n_users"))
    )


def forward_fill_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-entity daily resample with forward fill — the standard
    gap-filling pass that turns an irregular event stream into the
    dense daily series dashboards, cohort models, and feature stores
    expect. Semantics (all deterministic): each entity's daily value
    is its LAST event of the day (by ts, ties by id); the grid spans
    that entity's own [first_day, last_day]; days without events
    carry the previous observed value forward (`observed` = false).

    Distributed shape: one row_number window picks the day-closing
    event, one groupBy finds the per-entity bounds, sequence+explode
    builds the grid (entity-local — no global calendar join), one
    left join re-attaches observations, and the fill is a
    last-ignorenulls running window — every stage is partitioned by
    the entity key, so the work and memory per task is bounded by one
    entity's day span, never the corpus. Returns
    (user_col, day, value, observed)."""
    from pyspark.sql.window import Window

    day = F.to_date(F.col(ts_col))
    w_close = Window.partitionBy(user_col, "day").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    per_day = (
        events.withColumn("day", day)
        .withColumn("_r", F.row_number().over(w_close))
        .where(F.col("_r") == 1)
        .select(user_col, "day", F.col(value_col).alias("_v"))
    )
    bounds = per_day.groupBy(user_col).agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    grid = bounds.select(
        user_col,
        F.explode(
            F.sequence(
                F.col("_d0"), F.col("_d1"), F.expr("interval 1 day")
            )
        ).alias("day"),
    )
    w_fill = (
        Window.partitionBy(user_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_day, [user_col, "day"], "left")
        .select(
            user_col,
            "day",
            F.last("_v", ignorenulls=True).over(w_fill).alias("value"),
            F.col("_v").isNotNull().alias("observed"),
        )
    )
