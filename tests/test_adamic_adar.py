"""adamic_adar (operators/linkgraph.py): shared-neighbor link
prediction with hub capping and rounded-score top-k."""

import math

from aml_entity_resolution_assignment_spark.operators.linkgraph import (
    adamic_adar,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_host string, dst_host string")


def test_hand_case_scores(spark):
    # star: z links a, b, c (deg(z)=3); a-b also share w (deg(w)=2)
    e = _edges(
        spark,
        [("z", "a"), ("z", "b"), ("z", "c"), ("w", "a"), ("w", "b")],
    )
    got = {
        (r["host_a"], r["host_b"]): (r["score"], r["n_common"])
        for r in adamic_adar(e).collect()
    }
    # a-b: via z (1/ln3) + via w (1/ln2), 2 common
    s_ab, n_ab = got[("a", "b")]
    assert n_ab == 2
    assert math.isclose(s_ab, 1 / math.log(3) + 1 / math.log(2), rel_tol=1e-12)
    # a-c: via z only
    s_ac, n_ac = got[("a", "c")]
    assert n_ac == 1 and math.isclose(s_ac, 1 / math.log(3), rel_tol=1e-12)
    # z-w share a and b (deg(a)=deg(b)=2)
    assert got[("w", "z")][1] == 2


def test_existing_edges_excluded(spark):
    # a-b are already linked AND share z: must not be suggested
    e = _edges(spark, [("z", "a"), ("z", "b"), ("a", "b")])
    got = {(r["host_a"], r["host_b"]) for r in adamic_adar(e).collect()}
    assert ("a", "b") not in got


def test_direction_agnostic(spark):
    # adjacency in either direction excludes the pair
    e = _edges(spark, [("z", "a"), ("z", "b"), ("b", "a")])
    got = {(r["host_a"], r["host_b"]) for r in adamic_adar(e).collect()}
    assert ("a", "b") not in got


def test_max_degree_cap_drops_hub_centers(spark):
    # hub h has degree 4 (> cap 3): wedges through h vanish;
    # low-degree center z still contributes
    e = _edges(
        spark,
        [("h", "a"), ("h", "b"), ("h", "c"), ("h", "d"), ("z", "a"), ("z", "b")],
    )
    got = {
        (r["host_a"], r["host_b"]): r["n_common"]
        for r in adamic_adar(e, max_degree=3).collect()
    }
    assert got.get(("a", "b")) == 1  # via z only
    assert ("a", "c") not in got  # only via the capped hub


def test_top_k_keeps_best_per_left_endpoint(spark):
    # a shares 2 neighbors with b, 1 with c -> top_k=1 keeps only a-b
    e = _edges(
        spark,
        [("z", "a"), ("z", "b"), ("w", "a"), ("w", "b"), ("v", "a"), ("v", "c")],
    )
    got = [
        (r["host_a"], r["host_b"])
        for r in adamic_adar(e, top_k=1).collect()
        if r["host_a"] == "a"
    ]
    assert got == [("a", "b")]


def test_partitioning_invariance(spark):
    pairs = [
        (f"h{i % 13}", f"h{(i * 7 + 3) % 17}") for i in range(300)
    ]
    e = _edges(spark, pairs)
    a = adamic_adar(e.repartition(1), max_degree=10, top_k=3)
    b = adamic_adar(e.repartition(8), max_degree=10, top_k=3)
    ra = sorted((x[0], x[1], round(x[2], 9), x[3]) for x in map(tuple, a.collect()))
    rb = sorted((x[0], x[1], round(x[2], 9), x[3]) for x in map(tuple, b.collect()))
    assert ra == rb
