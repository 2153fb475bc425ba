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


def test_cm_sketch_never_underestimates_and_merges(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.range(30000).select(
        (F.floor(F.pow(F.rand(7), 3) * 200)).cast("int").cast("string").alias("v")
    )
    items = df.select("v").distinct()
    exact = {r["v"]: r["c"] for r in df.groupBy("v").agg(F.count("*").alias("c")).collect()}
    est = {
        r["item"]: r["estimate"]
        for r in cm_estimate(cm_sketch(df, "v"), items, "v").collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # overestimate-only bound
    # merge by sum == sketch of the union
    a = df.where(F.col("v").cast("int") % 2 == 0)
    b = df.where(F.col("v").cast("int") % 2 == 1)
    merged = (
        cm_sketch(a, "v")
        .unionByName(cm_sketch(b, "v"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    e1 = {
        r["item"]: r["estimate"]
        for r in cm_estimate(merged, items, "v").collect()
    }
    assert e1 == est


def test_cm_absent_item_estimates_bounded(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.range(1000).select(F.concat(F.lit("p"), F.col("id")).alias("v"))
    sk = cm_sketch(df, "v")
    ghosts = spark.createDataFrame([("never-seen-1",), ("never-seen-2",)], "v string")
    est = {r["item"]: r["estimate"] for r in cm_estimate(sk, ghosts, "v").collect()}
    # min over rows caps the collision overcount well below N
    assert all(v <= 1000 * 0.05 for v in est.values()), est


def test_histogram_quantiles_vs_numpy(spark):
    import numpy as np
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    rng = np.random.RandomState(7)
    vals = rng.gamma(4.0, 25.0, 5000)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    sk = histogram_sketch(df, "x", 0.0, 400.0, bins=400)
    got = {
        r["q"]: r["value"]
        for r in histogram_quantiles(sk, [0.1, 0.5, 0.9], 0.0, 400.0, 400).collect()
    }
    for q in (0.1, 0.5, 0.9):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= 2.0, (q, got[q], exact)  # ~2 bucket widths


def test_histogram_sketch_bounded_merge_and_clamp(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )
    from pyspark.sql import functions as F

    a = spark.range(0, 500).select(F.col("id").cast("double").alias("x"))
    b = spark.range(500, 1000).select(F.col("id").cast("double").alias("x"))
    whole = histogram_sketch(a.union(b), "x", 0.0, 1000.0, bins=100)
    merged = (
        histogram_sketch(a, "x", 0.0, 1000.0, bins=100)
        .unionByName(histogram_sketch(b, "x", 0.0, 1000.0, bins=100))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    key = lambda df: {r["bucket"]: r["cnt"] for r in df.collect()}  # noqa: E731
    assert key(whole) == key(merged)
    assert whole.count() <= 100
    # out-of-range values clamp into edge buckets, never dropped
    c = spark.createDataFrame([(-50.0,), (5000.0,)], "x double")
    got = key(histogram_sketch(c, "x", 0.0, 1000.0, bins=100))
    assert got == {0: 1, 99: 1}
    # quantiles from the merged sketch match the whole-data sketch
    qa = histogram_quantiles(whole, [0.25, 0.75], 0.0, 1000.0, 100).collect()
    qb = histogram_quantiles(merged, [0.25, 0.75], 0.0, 1000.0, 100).collect()
    assert {(r["q"], r["value"]) for r in qa} == {(r["q"], r["value"]) for r in qb}


def test_histogram_rejects_bad_params(spark):
    import pytest as _pytest
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        histogram_sketch,
    )

    with _pytest.raises(ValueError):
        histogram_sketch(spark.range(3).selectExpr("cast(id as double) x"), "x", 5.0, 5.0)


# ------------------------------------------------------------------ bloom


def _bloom_ref_probes(v: str, m: int, k: int):
    import hashlib

    out = []
    for j in range(k):
        h = int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:15], 16) % m
        out.append((h >> 6, h & 63))
    return out


def test_bloom_no_false_negatives_and_deterministic_fps(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    m, k = 512, 3
    inserted = [f"key-{i}" for i in range(60)]
    others = [f"other-{i}" for i in range(200)]
    ins_df = spark.createDataFrame([(v,) for v in inserted], "v string")
    bloom = bloom_build(ins_df, "v", m=m, k=k)
    probe_df = spark.createDataFrame(
        [(v,) for v in inserted + others], "v string"
    )
    got = {
        r["value"]: r["maybe_member"]
        for r in bloom_contains(probe_df, "v", bloom, m=m, k=k).collect()
    }
    # no false negatives
    assert all(got[v] for v in inserted)
    # false positives match the pure-python recomputation exactly
    words = {}
    for v in inserted:
        for w, b in _bloom_ref_probes(v, m, k):
            words[w] = words.get(w, 0) | (1 << b)
    for v in others:
        want = all(
            (words.get(w, 0) >> b) & 1 for w, b in _bloom_ref_probes(v, m, k)
        )
        assert got[v] == want, v
    # with m=512 over 260 probes some false positives should exist —
    # otherwise the FP branch above tested nothing
    assert any(got[v] for v in others)
    # filter is bounded
    assert bloom.count() <= m // 64


def test_bloom_mergeable(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        bloom_build,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(40)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(40)], "v string")
    whole = bloom_build(a.unionByName(b), "v", m=512, k=3)
    merged = (
        bloom_build(a, "v", m=512, k=3)
        .unionByName(bloom_build(b, "v", m=512, k=3))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    key = lambda df: {  # noqa: E731
        (r["word_idx"], r["bits"]) for r in df.collect()
    }
    assert key(whole) == key(merged)


def test_bloom_rejects_bad_m(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        bloom_build,
    )

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(spark.range(1).selectExpr("cast(id as string) v"),
                    "v", m=100)


# ---------------------------------------------------------------- profile


def test_profile_columns(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 7.5), (4, None, 5.0)],
        "id long, s string, v double",
    )
    got = {r["column"]: r for r in profile_columns(df, ["id", "s", "v"]).collect()}
    assert set(got) == {"id", "s", "v"}
    for c in got:
        assert got[c]["n_rows"] == 4
    assert got["s"]["n_nulls"] == 1 and got["v"]["n_nulls"] == 1
    assert got["id"]["n_nulls"] == 0
    assert got["id"]["min_str"] == "1" and got["id"]["max_str"] == "4"
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["v"]["min_str"] == "5.0" and got["v"]["max_str"] == "7.5"
    # HLL on tiny cardinalities is the linear-counting branch: exact-ish
    assert abs(got["s"]["n_distinct_est"] - 2) < 0.1
    assert abs(got["id"]["n_distinct_est"] - 4) < 0.2


# ---------------------------------------------------------- grouped HLL


def test_hll_grouped_matches_global_per_group(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        hll_distinct,
        hll_estimate_by,
        hll_registers_by,
    )

    rows = [(f"g{i % 3}", f"u{i % 50}-{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, "g string, u string")
    grouped = {
        r["g"]: (r["n_registers_set"], r["estimate"])
        for r in hll_estimate_by(
            hll_registers_by(df, "u", ["g"]), ["g"]
        ).collect()
    }
    for g in ("g0", "g1", "g2"):
        solo = hll_distinct(df.where(F.col("g") == g), "u").collect()[0]
        assert grouped[g] == (
            solo["n_registers_set"],
            solo["estimate"],
        ), g


def test_hll_grouped_merge_equals_whole_range(spark):
    """Union+max over per-day sketches == the sketch of the union —
    the rollup property that makes per-segment sketches composable."""
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )

    rows = [(i % 7, f"user{i % 211}") for i in range(2000)]
    df = spark.createDataFrame(rows, "day int, u string")
    daily = hll_registers_by(df, "u", ["day"])
    merged = daily.groupBy("register").agg(
        F.max("max_rho").alias("max_rho")
    )
    whole = hll_registers(df, "u")
    a = hll_estimate(merged).collect()[0]
    b = hll_estimate(whole).collect()[0]
    assert (a["n_registers_set"], a["estimate"]) == (
        b["n_registers_set"],
        b["estimate"],
    )
    # grouped estimator runs off the same rows
    assert hll_estimate_by(daily, ["day"]).count() == 7


def test_hll_set_estimates_inclusion_exclusion(spark):
    from aml_entity_resolution_assignment_spark.operators.sketches import (
        hll_distinct,
        hll_registers,
        hll_set_estimates,
    )

    # A = 0..399, B = 200..599 -> true |A∩B| = 200, |A∪B| = 600
    a = spark.createDataFrame([(f"u{i}",) for i in range(400)], "u string")
    b = spark.createDataFrame(
        [(f"u{i}",) for i in range(200, 600)], "u string"
    )
    row = hll_set_estimates(
        hll_registers(a, "u"), hll_registers(b, "u")
    ).collect()[0]
    # identities: est_a/est_b equal the one-shot estimates; the union
    # merge is lossless so est_union equals the union's own sketch
    ea = hll_distinct(a, "u").collect()[0]["estimate"]
    eu = hll_distinct(a.unionByName(b).distinct(), "u").collect()[0][
        "estimate"
    ]
    assert row["est_a"] == ea and abs(row["est_union"] - eu) < 1e-9
    assert row["est_intersection"] == row["est_a"] + row["est_b"] - row[
        "est_union"
    ]
    # estimates land near truth (p=9 -> ~5% rse; allow 3 sigma)
    assert abs(row["est_union"] - 600) / 600 < 0.2
    assert abs(row["est_intersection"] - 200) / 200 < 0.5
