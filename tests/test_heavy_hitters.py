"""heavy_hitters (operators/sketches.py): Misra-Gries candidate pass +
exact recount — output must be byte-identical to the naive exact plan."""

import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.sketches import (
    _misra_gries_partition,
    heavy_hitters,
)


def test_mg_kernel_guarantee():
    # any item with freq > n/(k+1) must survive k-counter MG:
    # n=180, k=4 -> bound 36; 'a' (50) is guaranteed, 'b' (30) is not
    stream = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(100)]
    out = _misra_gries_partition(iter(stream), k=4)
    assert "a" in out
    assert len(out) <= 4
    # worst adversarial order for 'a': its copies first, decrements last
    out2 = _misra_gries_partition(
        iter([f"y{i}" for i in range(100)] + ["a"] * 50), k=4
    )
    assert "a" in out2


def test_mg_kernel_skips_none():
    out = _misra_gries_partition(iter(["a", None, "a", None]), k=2)
    assert out == ["a"]


def _naive(df, col, phi):
    n = df.where(F.col(col).isNotNull()).count()
    import math

    thr = math.ceil(phi * n)
    return {
        (str(r["item"]), r["cnt"])
        for r in df.where(F.col(col).isNotNull())
        .groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= thr)
        .collect()
    }


def test_matches_naive_on_skewed_data(spark):
    rows = (
        [("hot",)] * 400
        + [("warm",)] * 120
        + [(f"cold{i}",) for i in range(480)]
    )
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = {
        (r["item"], r["cnt"])
        for r in heavy_hitters(df, "item", phi=0.1).collect()
    }
    assert got == _naive(df, "item", 0.1)
    assert ("hot", 400) in got and ("warm", 120) in got


def test_threshold_boundary_is_exact(spark):
    # 100 rows, phi=0.1 -> threshold exactly 10: a 10-count item is IN,
    # a 9-count item is OUT
    rows = [("ten",)] * 10 + [("nine",)] * 9 + [(f"z{i}",) for i in range(81)]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    got = {r["item"] for r in heavy_hitters(df, "item", phi=0.1).collect()}
    assert "ten" in got and "nine" not in got


def test_nulls_excluded_from_stream_and_total(spark):
    rows = [("a",)] * 5 + [(None,)] * 95
    df = spark.createDataFrame(rows, "item string")
    got = heavy_hitters(df, "item", phi=0.5).collect()
    # N = 5 non-null items; 'a' has all 5 >= ceil(0.5*5)
    assert [(r["item"], r["cnt"]) for r in got] == [("a", 5)]


def test_partitioning_invariance(spark):
    rows = [(f"u{i % 37}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "item string")
    a = sorted(map(tuple, heavy_hitters(df.repartition(1), "item", 0.02).collect()))
    b = sorted(map(tuple, heavy_hitters(df.repartition(16), "item", 0.02).collect()))
    assert a == b and len(a) == 37  # uniform 37 items all above 2%


def test_candidate_volume_is_bounded(spark):
    # the MG pass must emit <= k rows per partition regardless of
    # vocabulary size — the whole point vs groupBy-count
    rows = [(f"v{i}",) for i in range(5000)] + [("hh",)] * 600
    df = spark.createDataFrame(rows, "item string").repartition(4)
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        _misra_gries_partition as mg,
    )

    k = 10  # ceil(1/0.1)
    # kernel-level: one partition's summary is <= k
    assert len(mg(iter([f"v{i}" for i in range(1000)]), k)) <= k
    got = heavy_hitters(df, "item", phi=0.1, k=k).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [("hh", 600)]


def test_bad_phi_raises(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", phi=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", phi=1.5)


def test_undersized_k_raises(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", phi=0.1, k=5)  # needs >= 10
