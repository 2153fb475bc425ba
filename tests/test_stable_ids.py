"""stable_entity_ids (operators/cluster.py): max-overlap mutual-best
carry of previous-run entity ids onto this run's clusters."""

from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.cluster import (
    stable_entity_ids,
)


def _run(spark, cur_rows, prev_rows):
    cur = spark.createDataFrame(cur_rows, "url string, cluster string")
    prev = spark.createDataFrame(prev_rows, "url string, entity_id string")
    out = stable_entity_ids(cur, prev)
    return {r["url"]: (r["cluster"], r["entity_id"], r["carried"])
            for r in out.collect()}


def test_simple_carry(spark):
    got = _run(
        spark,
        [("a", "c1"), ("b", "c1"), ("c", "c2")],
        [("a", "E1"), ("b", "E1"), ("c", "E2")],
    )
    assert got == {
        "a": ("c1", "E1", True),
        "b": ("c1", "E1", True),
        "c": ("c2", "E2", True),
    }


def test_split_keeps_id_on_biggest_fragment(spark):
    # E1 had {a,b,c}; this run splits it c1={a,b}, c2={c}
    got = _run(
        spark,
        [("a", "c1"), ("b", "c1"), ("c", "c2")],
        [("a", "E1"), ("b", "E1"), ("c", "E1")],
    )
    assert got["a"] == ("c1", "E1", True)
    assert got["c"] == ("c2", "new:c2", False)


def test_merge_takes_largest_overlap_id(spark):
    # c1 merges E1 (2 records) and E2 (1 record) -> inherits E1
    got = _run(
        spark,
        [("a", "c1"), ("b", "c1"), ("c", "c1")],
        [("a", "E1"), ("b", "E1"), ("c", "E2")],
    )
    assert got["a"] == ("c1", "E1", True)


def test_tie_breaks_on_id_ascending(spark):
    # equal overlap: E1 vs E2 both 1 record -> min entity id wins
    got = _run(
        spark,
        [("a", "c1"), ("b", "c1")],
        [("a", "E2"), ("b", "E1")],
    )
    assert got["a"][1] == "E1"


def test_id_never_assigned_twice(spark):
    # E1 splits across c1 (2) and c2 (2, tie) -> only one cluster may
    # carry E1; the other mints a fresh id
    got = _run(
        spark,
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2")],
        [("a", "E1"), ("b", "E1"), ("c", "E1"), ("d", "E1")],
    )
    ids = [got[k][1] for k in ("a", "c")]
    assert ids[0] != ids[1]
    assert sorted(ids)[0] == "E1"  # tie -> min cluster label carries


def test_new_records_join_carried_cluster(spark):
    # record d is brand new but lands in c1, which carries E1
    got = _run(
        spark,
        [("a", "c1"), ("d", "c1")],
        [("a", "E1")],
    )
    assert got["d"] == ("c1", "E1", True)


def test_all_new_cluster_mints_prefixed_id(spark):
    got = _run(spark, [("x", "c9")], [("a", "E1")])
    assert got["x"] == ("c9", "new:c9", False)


def test_lost_records_do_not_appear(spark):
    got = _run(spark, [("a", "c1")], [("a", "E1"), ("gone", "E2")])
    assert set(got) == {"a"}


def test_partitioning_invariance(spark):
    rows_cur = [(f"u{i}", f"c{i % 7}") for i in range(200)]
    rows_prev = [(f"u{i}", f"E{i % 5}") for i in range(150)]
    cur = spark.createDataFrame(rows_cur, "url string, cluster string")
    prev = spark.createDataFrame(rows_prev, "url string, entity_id string")
    a = stable_entity_ids(cur.repartition(1), prev.repartition(1))
    b = stable_entity_ids(cur.repartition(8), prev.repartition(8))
    pa = sorted(map(tuple, a.collect()))
    pb = sorted(map(tuple, b.collect()))
    assert pa == pb


def test_composes_with_connected_components(spark):
    # real clustering inputs: CC over two edge sets, then carry
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        connected_components,
    )

    e1 = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "id_a string, id_b string"
    )
    prev = connected_components(e1).select(
        F.col("url"), F.col("predicted_entity_id").alias("entity_id")
    )
    # next run: {a,b} gains e; the c-d edge is gone so {c,d} splits
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "e")], "id_a string, id_b string"
    )
    verts = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "url string"
    )
    cur = connected_components(e2, vertices=verts).select(
        F.col("url"), F.col("predicted_entity_id").alias("cluster")
    )
    got = {
        r["url"]: (r["entity_id"], r["carried"])
        for r in stable_entity_ids(cur, prev).collect()
    }
    assert got["a"] == ("a", True) and got["e"] == ("a", True)
    assert got["c"] == ("c", True)  # biggest surviving fragment keeps id
    assert got["d"][1] is False  # lone fragment minted fresh
