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
