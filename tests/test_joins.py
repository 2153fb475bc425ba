"""as-of join and range join: correctness vs pandas.merge_asof / a
brute-force interval join, plus physical-plan sanity (no nested-loop)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.joins import (
    as_of_join,
    edit_distance_self_join,
    range_join_points_intervals,
)


@pytest.mark.parametrize("seed", [3, 11])
def test_as_of_join_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    n_l, n_r = 120, 80
    keys = rng.integers(0, 5, n_l)
    lts = rng.integers(0, 1000, n_l)
    left = pd.DataFrame(
        {"k": keys, "ts": lts.astype("datetime64[s]"), "lv": np.arange(n_l)}
    )
    rk = rng.integers(0, 5, n_r)
    rts = rng.integers(0, 1000, n_r)
    right = (
        pd.DataFrame(
            {"k": rk, "ts": rts.astype("datetime64[s]"), "rv": rng.integers(0, 1000, n_r)}
        )
        .drop_duplicates(["k", "ts"])  # unique right keys: no tie ambiguity
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts", by="k", direction="backward",
    ).sort_values("lv")

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        as_of_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="ts")
        .toPandas()
        .sort_values("lv")
    )
    assert list(got["lv"]) == list(want["lv"])
    g = got["r_rv"].fillna(-1).astype(int).tolist()
    w = want["rv"].fillna(-1).astype(int).tolist()
    assert g == w


def test_as_of_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100.0, "a"), (1, 500.0, "b")], "k long, ts double, tag string"
    )
    right = spark.createDataFrame(
        [(1, 90.0, 7.0)], "k long, ts double, rv double"
    )
    out = {
        r["tag"]: r["r_rv"]
        for r in as_of_join(left, right, on=["k"], tolerance=50).collect()
    }
    assert out["a"] == 7.0  # 10s back, inside tolerance
    assert out["b"] is None  # 410s back, outside


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(5)
    pts = [(int(i), float(v)) for i, v in enumerate(rng.uniform(0, 1000, 150))]
    ivs = []
    for i in range(40):
        s = float(rng.uniform(0, 950))
        ivs.append((int(i), s, s + float(rng.uniform(0, 120))))
    p = spark.createDataFrame(pts, "pid long, x double")
    iv = spark.createDataFrame(ivs, "iid long, s double, e double")
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points_intervals(
            p, iv, "x", "s", "e", bucket_width=75.0
        ).collect()
    }
    want = {
        (pid, iid)
        for pid, x in pts
        for iid, s, e in ivs
        if s <= x <= e
    }
    assert got == want and len(want) > 0


def test_range_join_no_nested_loop_in_plan(spark):
    p = spark.range(10).select(F.col("id").alias("pid"), (F.col("id") * 7.0).alias("x"))
    iv = spark.range(5).select(
        F.col("id").alias("iid"), (F.col("id") * 10.0).alias("s"),
        (F.col("id") * 10.0 + 15).alias("e"),
    )
    plan = range_join_points_intervals(p, iv, "x", "s", "e")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------- edit join

def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


@pytest.mark.parametrize("max_dist", [0, 1, 2, 3])
def test_edit_join_matches_bruteforce(spark, max_dist):
    """PassJoin == exact all-pairs Levenshtein, including empty strings,
    strings shorter than d+1 (zero-length segments), and exact dups."""
    import itertools
    import random

    rng = random.Random(42)
    strs = []
    for _ in range(120):
        base = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        strs.append(base)
        mut = list(base)
        for _ in range(rng.randint(0, 3)):
            op = rng.choice("ids")
            if op == "i":
                mut.insert(rng.randint(0, len(mut)), rng.choice("abcd"))
            elif mut:
                p = rng.randint(0, len(mut) - 1)
                if op == "d":
                    del mut[p]
                else:
                    mut[p] = rng.choice("abcd")
        strs.append("".join(mut))
    rows = [(i, s) for i, s in enumerate(strs)]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "id", "s", max_dist).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= max_dist
    }
    assert got == want and len(want) > 0


def test_edit_join_no_cartesian_in_plan(spark):
    df = spark.range(50).select(
        F.col("id").cast("int").alias("id"),
        F.concat(F.lit("doc"), F.col("id")).alias("s"),
    )
    plan = (
        edit_distance_self_join(df, "id", "s", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_edit_join_null_and_unicode(spark):
    rows = [(0, None), (1, "héllo"), (2, "hello"), (3, "héllo!")]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "id", "s", 1).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 1)}
