"""Connected components vs networkx oracle (FIXTURES.md §4)."""

import random

import networkx as nx
import pytest

from aml_entity_resolution_assignment_spark.operators.cluster import (
    connected_components,
)


def _oracle(edges, vertices):
    g = nx.Graph()
    g.add_nodes_from(vertices)
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for v in comp:
            out[v] = root
    return out


def _run(spark, edges, vertices=None):
    e_df = spark.createDataFrame(
        edges or [("x", "x")], "id_a string, id_b string"
    )
    if not edges:
        e_df = e_df.limit(0)
    v_df = (
        spark.createDataFrame([(v,) for v in vertices], "url string")
        if vertices is not None
        else None
    )
    got = connected_components(e_df, vertices=v_df)
    return {r["url"]: r["predicted_entity_id"] for r in got.collect()}


def test_chain_transitivity(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    verts = ["a", "b", "c", "d", "e"]
    assert _run(spark, edges, verts) == _oracle(edges, verts)


def test_two_cluster_merge(spark):
    edges = [("a", "b"), ("c", "d"), ("b", "c")]
    verts = ["a", "b", "c", "d"]
    got = _run(spark, edges, verts)
    assert len(set(got.values())) == 1


def test_singletons_kept(spark):
    edges = [("a", "b")]
    verts = ["a", "b", "s1", "s2"]
    got = _run(spark, edges, verts)
    assert got["s1"] == "s1" and got["s2"] == "s2"
    assert got["a"] == got["b"] == "a"


def test_no_edges_all_singletons(spark):
    got = _run(spark, [], ["x", "y", "z"])
    assert got == {"x": "x", "y": "y", "z": "z"}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_networkx(spark, seed):
    rng = random.Random(seed)
    verts = [f"v{i:03d}" for i in range(60)]
    edges = [
        (rng.choice(verts), rng.choice(verts)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges, verts) == _oracle(edges, verts)


def test_long_chain_converges_quickly(spark):
    # path graph of 64 nodes: diameter 63, log-round algorithm must
    # converge well under the 50-iteration cap
    verts = [f"n{i:02d}" for i in range(64)]
    edges = [(verts[i], verts[i + 1]) for i in range(63)]
    got = _run(spark, edges, verts)
    assert set(got.values()) == {"n00"}


# ---------------------------------------------------------------------------
# incremental CC (round 4): fold new edges into an existing assignment
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_incremental_cc_equals_full_recompute(spark, seed):
    """incremental_connected_components(CC(base), delta) must equal
    CC(base + delta) exactly — merges across old components, chains of
    merges through a single batch, and brand-new vertices included."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        incremental_connected_components,
    )

    rng = random.Random(seed)
    verts = [f"v{i:03d}" for i in range(60)]
    base = [tuple(sorted(rng.sample(verts, 2))) for _ in range(40)]
    # delta: edges among old vertices + edges introducing NEW vertices
    newv = [f"w{i:03d}" for i in range(10)]
    delta = [tuple(sorted(rng.sample(verts, 2))) for _ in range(10)]
    delta += [(rng.choice(verts), w) for w in newv[:6]]
    delta += [tuple(sorted(rng.sample(newv, 2))) for _ in range(5)]

    base_df = spark.createDataFrame(base, "id_a string, id_b string")
    delta_df = spark.createDataFrame(delta, "id_a string, id_b string")
    vert_df = spark.createDataFrame([(v,) for v in verts], "url string")

    assignments = connected_components(base_df, vertices=vert_df, id_col="url")
    got = incremental_connected_components(assignments, delta_df)
    got_map = {
        r["url"]: r["predicted_entity_id"] for r in got.collect()
    }

    all_verts = set(verts) | {v for e in delta for v in e}
    want = _oracle(base + delta, all_verts)
    assert got_map == want


def test_incremental_cc_empty_delta_is_identity(spark):
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        incremental_connected_components,
    )

    base_df = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "id_a string, id_b string"
    )
    vert_df = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("e",)], "url string")
    assignments = connected_components(base_df, vertices=vert_df, id_col="url")
    empty = spark.createDataFrame([], "id_a string, id_b string")
    got = incremental_connected_components(assignments, empty)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in assignments.collect()
    }


def test_incremental_cc_merge_chain_through_batch(spark):
    """One batch can chain several old components together; every
    member must relabel to the global min."""
    from aml_entity_resolution_assignment_spark.operators.cluster import (
        incremental_connected_components,
    )

    base_df = spark.createDataFrame(
        [("a1", "a2"), ("b1", "b2"), ("c1", "c2")], "id_a string, id_b string"
    )
    assignments = connected_components(base_df, id_col="url")
    delta = spark.createDataFrame(
        [("a2", "b1"), ("b2", "c1")], "id_a string, id_b string"
    )
    got = {
        r["url"]: r["predicted_entity_id"]
        for r in incremental_connected_components(assignments, delta).collect()
    }
    assert got == {v: "a1" for v in ["a1", "a2", "b1", "b2", "c1", "c2"]}
