"""HyperLogLog sketch: accuracy envelope, exact mergeability, and the
small-range linear-counting correction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


@pytest.mark.parametrize("n", [50, 1000, 20000])
def test_hll_accuracy_envelope(spark, n):
    df = spark.range(n).select(F.concat(F.lit("item-"), F.col("id")).alias("v"))
    est = hll_distinct(df, "v").first()["estimate"]
    # 512 registers -> ~4.6% standard error; allow 4 sigma
    assert abs(est - n) / n < 0.2, est


def test_hll_merge_is_exact(spark):
    a = spark.range(0, 5000).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    b = spark.range(2500, 8000).select(F.concat(F.lit("x"), F.col("id")).alias("v"))
    merged = (
        hll_registers(a, "v")
        .unionByName(hll_registers(b, "v"))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    e_merge = hll_estimate(merged).first()["estimate"]
    e_union = hll_distinct(a.unionByName(b), "v").first()["estimate"]
    assert e_merge == e_union  # register-wise max is lossless


def test_hll_sketch_is_bounded_and_duplicate_blind(spark):
    df = spark.range(100000).select((F.col("id") % 40).cast("string").alias("v"))
    regs = hll_registers(df, "v")
    assert regs.count() <= 40  # at most one register per distinct value
    est = hll_distinct(df, "v").first()["estimate"]
    assert abs(est - 40) / 40 < 0.25  # linear-counting regime
