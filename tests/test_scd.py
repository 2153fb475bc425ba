"""SCD type-2 interval builder (operators/scd.py)."""

import datetime as dt

import pytest

from aml_entity_resolution_assignment_spark.operators.scd import (
    scd2_intervals,
)


def _t(h):
    return dt.datetime(2026, 1, 1, h)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "k long, attr string, ts timestamp, id long"
    )
    return scd2_intervals(df, "k", "attr", "ts", "id").collect()


def test_runs_collapse_and_intervals_chain(spark):
    rows = [
        (1, "a", _t(1), 1),
        (1, "a", _t(2), 2),
        (1, "b", _t(3), 3),
        (1, "a", _t(4), 4),  # back to 'a' -> NEW interval, not merged
    ]
    out = sorted(_run(spark, rows), key=lambda r: r["valid_from"])
    assert [(r["attr"], r["n_events"]) for r in out] == [
        ("a", 2), ("b", 1), ("a", 1),
    ]
    assert out[0]["valid_from"] == _t(1)
    assert out[0]["valid_to"] == _t(3)  # closed by 'b'
    assert out[1]["valid_to"] == _t(4)
    assert out[2]["valid_to"] is None and out[2]["is_current"]
    assert not out[0]["is_current"] and not out[1]["is_current"]


def test_null_attr_opens_and_closes_intervals(spark):
    rows = [
        (1, "a", _t(1), 1),
        (1, None, _t(2), 2),
        (1, None, _t(3), 3),
        (1, "a", _t(4), 4),
    ]
    out = sorted(_run(spark, rows), key=lambda r: r["valid_from"])
    assert [(r["attr"], r["n_events"]) for r in out] == [
        ("a", 1), (None, 2), ("a", 1),
    ]


def test_keys_are_independent(spark):
    rows = [
        (1, "a", _t(1), 1),
        (2, "a", _t(2), 2),  # different key: no interaction
        (1, "a", _t(3), 3),
    ]
    out = _run(spark, rows)
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    assert len(by_key[1]) == 1 and by_key[1][0]["n_events"] == 2
    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"]


def test_equal_timestamps_tiebreak_deterministic(spark):
    rows = [
        (1, "a", _t(1), 2),
        (1, "b", _t(1), 1),  # same ts: id order decides (b first)
    ]
    out = sorted(_run(spark, rows), key=lambda r: r["id"] if "id" in r else 0)
    attrs = sorted((r["attr"], r["is_current"]) for r in out)
    assert attrs == [("a", True), ("b", False)]


def test_partitioning_invariant(spark):
    rows = [
        (k, ["x", "y"][(i // 3) % 2], _t(1) + dt.timedelta(minutes=i), i)
        for k in range(5)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "k long, attr string, ts timestamp, id long"
    )
    a = sorted(map(tuple, scd2_intervals(df.repartition(1), "k", "attr", "ts", "id").collect()))
    b = sorted(map(tuple, scd2_intervals(df.repartition(9), "k", "attr", "ts", "id").collect()))
    assert a == b


def test_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(1, "a", _t(1), 1)], "k long, attr string, ts timestamp, id long"
    )
    plan = (
        scd2_intervals(df, "k", "attr", "ts", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
