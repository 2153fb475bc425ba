"""Funnel + cohort retention (operators/events.py)."""

import pytest

from aml_entity_resolution_assignment_spark.operators.events import (
    cohort_retention,
    funnel,
)

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, f"2024-01-{d:02d} {h:02d}:00:00", t) for u, d, h, t in rows],
        "user_id long, ts string, event_type string",
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "event_type")


def test_funnel_ordering_semantics(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        (1, 1, 9, "view"), (1, 1, 10, "click"), (1, 2, 8, "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, 1, 10, "click"), (2, 1, 12, "view"),
        # u3 view+click same timestamp: strict ordering -> stage 1 only
        (3, 1, 9, "view"), (3, 1, 9, "click"),
        # u4 purchase only: no stage 1 -> absent
        (4, 1, 9, "purchase"),
        # u5 full funnel with decoys and repeats
        (5, 1, 8, "view"), (5, 1, 9, "error"), (5, 1, 10, "click"),
        (5, 1, 11, "click"), (5, 1, 12, "purchase"), (5, 1, 7, "purchase"),
    ]
    got = {
        r["user"]: r["stages_reached"]
        for r in funnel(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 5: 3}
    with pytest.raises(ValueError):
        funnel(_ev(spark, rows), [])


def test_funnel_min_after_prev(spark):
    # the SECOND click (after view) chains, not the earlier one
    rows = [(1, 1, 5, "click"), (1, 1, 8, "view"), (1, 1, 9, "click"),
            (1, 1, 6, "purchase"), (1, 1, 20, "purchase")]
    r = funnel(_ev(spark, rows), ["view", "click", "purchase"]).collect()[0]
    assert r["stages_reached"] == 3
    assert str(r["t_2"]).startswith("2024-01-01 09")
    assert str(r["t_3"]).startswith("2024-01-01 20")


def test_cohort_retention(spark):
    rows = [
        # u1 first week of Jan (Mon 2024-01-01), returns wk+1 and wk+3
        (1, 2, 9, "view"), (1, 9, 9, "view"), (1, 23, 9, "view"),
        # u2 same cohort, never returns
        (2, 3, 9, "click"),
        # u3 cohort wk of Jan 8, returns wk+1
        (3, 10, 9, "view"), (3, 16, 9, "view"), (3, 17, 9, "view"),
    ]
    got = {
        (str(r["cohort_week"])[:10], r["week_offset"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


# ----------------------------------------------------- daily gap fill


def test_forward_fill_daily_semantics(spark):
    import datetime as dt

    from aml_entity_resolution_assignment_spark.operators.events import (
        forward_fill_daily,
    )

    T = dt.datetime
    rows = [
        # user 1: two events day1 (last wins), gap day2-3, event day4
        (1, 1, T(2024, 1, 1, 9), 10.0),
        (2, 1, T(2024, 1, 1, 18), 11.0),
        (3, 1, T(2024, 1, 4, 12), 44.0),
        # user 2: single day
        (4, 2, T(2024, 2, 7, 1), 7.0),
        # tie on ts within a day -> higher event_id closes the day
        (5, 3, T(2024, 3, 1, 12), 1.0),
        (6, 3, T(2024, 3, 1, 12), 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], str(r["day"])): (r["value"], r["observed"])
        for r in forward_fill_daily(df).collect()
    }
    assert got[(1, "2024-01-01")] == (11.0, True)   # last event of day
    assert got[(1, "2024-01-02")] == (11.0, False)  # carried forward
    assert got[(1, "2024-01-03")] == (11.0, False)
    assert got[(1, "2024-01-04")] == (44.0, True)
    assert got[(2, "2024-02-07")] == (7.0, True)
    assert got[(3, "2024-03-01")] == (2.0, True)    # id tie-break
    assert len(got) == 6  # grids are entity-local, no global calendar


def test_forward_fill_daily_partitioning_invariant(spark):
    import datetime as dt

    from aml_entity_resolution_assignment_spark.operators.events import (
        forward_fill_daily,
    )

    T = dt.datetime
    rows = [
        (i, i % 5, T(2024, 1, 1 + (i * 3) % 20, i % 24), float(i))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    a = {
        tuple(r)
        for r in forward_fill_daily(df.repartition(1)).collect()
    }
    b = {
        tuple(r)
        for r in forward_fill_daily(df.repartition(8)).collect()
    }
    assert a == b and len(a) > 60  # gaps were filled
