"""Snapshot diff + SCD2 history (operators/snapshots.py)."""

from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.snapshots import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
    snapshot_diff,
)

SCHEMA = "url string, text string, lang string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_snapshot_diff_classification(spark):
    old = _df(
        spark,
        [
            ("u1", "same", "en"),
            ("u2", "before", "en"),
            ("u3", "gone", "de"),
            ("u5", None, "en"),  # NULL content
        ],
    )
    new = _df(
        spark,
        [
            ("u1", "same", "en"),       # unchanged -> absent
            ("u2", "after", "en"),      # update
            ("u4", "fresh", "es"),      # insert
            ("u5", None, "en"),         # NULL == NULL -> unchanged
        ],
    )
    got = {
        r["url"]: (r["change_type"], r["text"])
        for r in snapshot_diff(old, new, ["url"], ["text", "lang"]).collect()
    }
    assert got == {
        "u2": ("update", "after"),
        "u3": ("delete", "gone"),
        "u4": ("insert", "fresh"),
    }


def test_snapshot_diff_null_vs_empty_and_shift(spark):
    # (NULL, 'a') must differ from ('a', NULL) and from ('', 'a')
    old = _df(spark, [("u", None, "a")])
    for text, lang in [("a", None), ("", "a")]:
        new = _df(spark, [("u", text, lang)])
        d = snapshot_diff(old, new, ["url"], ["text", "lang"]).collect()
        assert [r["change_type"] for r in d] == ["update"]


def test_scd2_lifecycle(spark):
    t1, t2, t3 = "2024-01-01", "2024-02-01", "2024-03-01"
    s1 = _df(spark, [("u1", "v1", "en"), ("u2", "w1", "en")])
    h = scd2_init(s1, ["url"], ["text", "lang"], t1)
    # t2: u1 updates, u2 deleted, u3 inserted
    s2 = _df(spark, [("u1", "v2", "en"), ("u3", "x1", "de")])
    h = scd2_apply(h, s2, ["url"], ["text", "lang"], t2)
    rows = {
        (r["url"], str(r["valid_from"])[:10]): (
            r["text"],
            str(r["valid_to"])[:10] if r["valid_to"] else None,
        )
        for r in h.collect()
    }
    assert rows == {
        ("u1", t1): ("v1", t2),
        ("u1", t2): ("v2", None),
        ("u2", t1): ("w1", t2),
        ("u3", t2): ("x1", None),
    }
    # as-of reconstruction
    asof1 = {
        r["url"]: r["text"] for r in scd2_as_of(h, "2024-01-15").collect()
    }
    assert asof1 == {"u1": "v1", "u2": "w1"}
    asof2 = {
        r["url"]: r["text"] for r in scd2_as_of(h, "2024-02-15").collect()
    }
    assert asof2 == {"u1": "v2", "u3": "x1"}
    # idempotent refresh: applying the same snapshot again changes nothing
    h2 = scd2_apply(h, s2, ["url"], ["text", "lang"], t3)
    assert sorted(map(tuple, h2.collect())) == sorted(map(tuple, h.collect()))


def test_scd2_reinsert_after_delete(spark):
    t1, t2, t3 = "2024-01-01", "2024-02-01", "2024-03-01"
    h = scd2_init(_df(spark, [("u", "a", "en")]), ["url"], ["text", "lang"], t1)
    h = scd2_apply(h, _df(spark, []), ["url"], ["text", "lang"], t2)
    h = scd2_apply(h, _df(spark, [("u", "b", "en")]), ["url"], ["text", "lang"], t3)
    rows = sorted(
        (str(r["valid_from"])[:10], r["text"],
         str(r["valid_to"])[:10] if r["valid_to"] else None)
        for r in h.collect()
    )
    assert rows == [(t1, "a", t2), (t3, "b", None)]


class TestRecrawlSchedule:
    def _hist(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "url string, unix long"
        ).select("url", F.timestamp_seconds("unix").alias("version_ts"))

    def test_gap_clamp_and_never_changed(self, spark):
        from aml_entity_resolution_assignment_spark.operators.snapshots import (
            recrawl_schedule,
        )

        day = 86400
        rows = (
            # u1: 3 versions, 10-day gaps -> gap 10d, interval 5d
            [("u1", 0), ("u1", 10 * day), ("u1", 20 * day)]
            # u2: 2 versions 12h apart -> gap 0.5d, min-clamped to 1d
            + [("u2", 0), ("u2", day // 2)]
            # u3: never changed -> max_days
            + [("u3", 0)]
        )
        out = {
            r["url"]: r.asDict()
            for r in recrawl_schedule(
                self._hist(spark, rows), oversample=2.0
            ).collect()
        }
        u1 = out["u1"]
        assert u1["n_versions"] == 3
        assert u1["span_days"] == 20.0 and u1["change_gap_days"] == 10.0
        assert u1["interval_days"] == 5.0
        assert u1["next_fetch_unix"] == 20 * day + 5 * day
        u2 = out["u2"]
        assert u2["interval_days"] == 1.0  # min clamp
        u3 = out["u3"]
        assert u3["n_versions"] == 1
        assert u3["change_gap_days"] is None
        assert u3["interval_days"] == 365.0
        assert u3["next_fetch_unix"] == 365 * day

    def test_single_shuffle_no_window(self, spark):
        from aml_entity_resolution_assignment_spark.operators.snapshots import (
            recrawl_schedule,
        )

        df = self._hist(spark, [("u", k * 1000) for k in range(10)])
        plan = (
            recrawl_schedule(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1, plan
        assert "Window" not in plan and "Join" not in plan
