"""Single-pass data-quality checks."""

import pytest

from aml_entity_resolution_assignment_spark.operators.checks import (
    Check,
    quality_checks,
)


def test_metrics_and_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "b", None)],
        "id long, s string, v double",
    )
    out = quality_checks(
        df,
        [
            Check("completeness", "s", lo=0.9),        # 0.75 -> fail
            Check("completeness", "id", lo=1.0),       # 1.0 -> pass
            Check("uniqueness", "id", lo=1.0),          # 4/4 -> pass
            Check("uniqueness", "s", lo=1.0),           # 3 distinct/4 -> fail
            Check("min", "v", lo=0.0),                  # 10 -> pass
            Check("max", "v", hi=25.0),                 # 30 -> fail
            Check("mean", "v", lo=15.0, hi=25.0),       # 20 -> pass
        ],
    ).collect()
    got = {(r["check"], r["column"]): (r["metric"], r["passed"]) for r in out}
    assert got[("completeness", "s")] == (0.75, False)
    assert got[("completeness", "id")] == (1.0, True)
    assert got[("uniqueness", "id")] == (1.0, True)
    assert got[("uniqueness", "s")][1] is False
    assert got[("min", "v")] == (10.0, True)
    assert got[("max", "v")] == (30.0, False)
    assert got[("mean", "v")] == (20.0, True)
    # single aggregation pass: row order preserved
    assert [r["check"] for r in out][:2] == ["completeness", "completeness"]


def test_all_null_column_fails_not_errors(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = quality_checks(df, [Check("mean", "v", lo=0.0)]).collect()
    assert out[0]["metric"] is None and out[0]["passed"] is False


def test_bad_kind_and_empty():
    with pytest.raises(ValueError):
        Check("median", "x")
    with pytest.raises(ValueError):
        quality_checks(None, [])


class TestCorpusRollup:
    def test_levels_and_flags(self, spark):
        from aml_entity_resolution_assignment_spark.operators.checks import (
            corpus_rollup,
        )

        df = spark.createDataFrame(
            [
                ("en", "a b c"),        # 3 tokens
                ("en", "d e"),          # 2 tokens
                ("de", "x y z w"),      # 4 tokens
                ("de", ""),             # 0 tokens
            ],
            "lang string, text string",
        )
        rows = {
            (r["lang"], r["g_lang"]): r.asDict()
            for r in corpus_rollup(df, ["lang"]).collect()
        }
        en = rows[("en", 0)]
        assert en["n_docs"] == 2 and en["total_tokens"] == 5
        assert en["avg_tokens"] == 2.5
        de = rows[("de", 0)]
        assert de["n_docs"] == 2 and de["total_tokens"] == 4
        total = rows[(None, 1)]
        assert total["n_docs"] == 4 and total["total_tokens"] == 9
        assert total["avg_tokens"] == 2.25

    def test_null_dim_distinguished_from_subtotal(self, spark):
        from aml_entity_resolution_assignment_spark.operators.checks import (
            corpus_rollup,
        )

        df = spark.createDataFrame(
            [("en", "a"), (None, "b b")], "lang string, text string"
        )
        rows = {
            (r["lang"], r["g_lang"]): r for r in
            corpus_rollup(df, ["lang"]).collect()
        }
        # a real NULL lang group (g_lang=0) AND the grand total
        # (g_lang=1) both exist and differ
        assert rows[(None, 0)]["n_docs"] == 1
        assert rows[(None, 1)]["n_docs"] == 2

    def test_single_shuffle_plan(self, spark):
        from aml_entity_resolution_assignment_spark.operators.checks import (
            corpus_rollup,
        )

        df = spark.range(100).selectExpr(
            "cast(id % 3 as string) as lang", "'w w w' as text"
        )
        plan = corpus_rollup(df, ["lang"])._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1, plan
        assert "Expand" in plan


class TestSkewReport:
    def test_heavy_key_and_salt(self, spark):
        from aml_entity_resolution_assignment_spark.operators.checks import (
            skew_report,
        )

        # key 7 appears 30x, key 8 appears 10x, keys 0-5 once each
        rows = [(7,)] * 30 + [(8,)] * 10 + [(k,) for k in range(6)]
        df = spark.createDataFrame(rows, "k long")
        out = {
            r["rank"]: r.asDict()
            for r in skew_report(
                df, "k", top_k=3, target_rows_per_task=10
            ).collect()
        }
        assert len(out) == 3
        r1 = out[1]
        assert r1["key"] == 7 and r1["cnt"] == 30
        assert r1["salt_factor"] == 3  # ceil(30/10)
        assert r1["total_rows"] == 46 and r1["n_keys"] == 8
        assert r1["max_cnt"] == 30
        assert out[2]["key"] == 8 and out[2]["salt_factor"] == 1
        # rank 3 is the smallest of the tied count-1 keys
        assert out[3]["key"] == 0 and out[3]["cnt"] == 1

    def test_null_key_counted(self, spark):
        from aml_entity_resolution_assignment_spark.operators.checks import (
            skew_report,
        )

        df = spark.createDataFrame(
            [(None,)] * 5 + [(1,)], "k string"
        )
        out = skew_report(df, "k", top_k=2).collect()
        assert out[0]["key"] is None and out[0]["cnt"] == 5
        assert out[0]["n_keys"] == 2

    def test_topk_plan_has_no_full_sort(self, spark):
        from aml_entity_resolution_assignment_spark.operators.checks import (
            skew_report,
        )

        df = spark.range(1000).selectExpr("id % 13 as k")
        plan = (
            skew_report(df, "k", top_k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan, plan
