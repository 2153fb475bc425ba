"""Link-graph operators: href extraction, PageRank, HITS.

PageRank/HITS are checked against an independent dense numpy power
iteration (same formulas, matrix form) — not against the operator's own
arithmetic — plus invariants (mass conservation, partitioning
invariance).
"""
import numpy as np
import pytest

from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.operators.linkgraph import (
    extract_links,
    hits,
    label_propagation,
    pagerank,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_links_filters_and_normalizes(spark):
    rows = [
        # www stripped on both ends, port stripped, parallel links counted
        (
            "http://www.a.com/x",
            '<a href="http://b.com/1">.</a><a href="https://www.b.com:8080/2">.</a>',
        ),
        # relative / mailto / javascript dropped; self-link kept
        (
            "http://a.com/y",
            '<a href="/rel">.</a><a href="mailto:x@y.z">.</a>'
            '<a href="javascript:void(0)">.</a><a href="http://a.com/z">.</a>',
        ),
        ("http://m.c.com/", '<a href="http://A.COM/up">.</a>'),
        ("http://empty.com/", "<p>no links</p>"),
    ]
    out = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in extract_links(_pages(spark, rows)).collect()
    }
    assert out == {
        ("a.com", "b.com"): 2,
        ("a.com", "a.com"): 1,
        ("c.com", "a.com"): 1,
    }


def _np_pagerank(edges, verts, iters, d):
    verts = sorted(verts)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    a = np.zeros((n, n))
    for s, t in edges:
        a[idx[s], idx[t]] = 1.0
    deg = a.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dm = r[deg == 0].sum()
        contrib = (r[deg > 0] / deg[deg > 0]) @ a[deg > 0]
        r = (1 - d) / n + d * (contrib + dm / n)
    return dict(zip(verts, r))


def _edge_df(spark, edges):
    return spark.createDataFrame(
        [(s, t) for s, t in edges], "src_host string, dst_host string"
    )


GRAPH = [  # 6 vertices: f dangling, e only a target via c
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "e"),
    ("d", "a"), ("e", "f"),
]


def test_pagerank_matches_numpy(spark):
    verts = {v for e in GRAPH for v in e}
    expected = _np_pagerank(GRAPH, verts, iters=10, d=0.85)
    got = {r["host"]: r["rank"] for r in pagerank(_edge_df(spark, GRAPH)).collect()}
    assert set(got) == verts
    for v in verts:
        assert got[v] == pytest.approx(expected[v], abs=1e-12)


def test_pagerank_mass_conserved_and_dangling(spark):
    # f has no out-edges: its mass must be redistributed, total == 1
    got = pagerank(_edge_df(spark, GRAPH), iterations=7).collect()
    assert sum(r["rank"] for r in got) == pytest.approx(1.0, abs=1e-9)
    # every rank >= teleport base
    n = len(got)
    assert all(r["rank"] >= (1 - 0.85) / n - 1e-12 for r in got)


def test_pagerank_partitioning_invariant(spark):
    e = _edge_df(spark, GRAPH)
    r1 = {r["host"]: r["rank"] for r in pagerank(e.repartition(1)).collect()}
    r8 = {r["host"]: r["rank"] for r in pagerank(e.repartition(8)).collect()}
    for v in r1:
        assert r1[v] == pytest.approx(r8[v], abs=1e-12)


def test_pagerank_parallel_edges_collapse(spark):
    dup = GRAPH + GRAPH[:3]
    r1 = {r["host"]: r["rank"] for r in pagerank(_edge_df(spark, GRAPH)).collect()}
    r2 = {r["host"]: r["rank"] for r in pagerank(_edge_df(spark, dup)).collect()}
    assert r1 == r2


def _np_hits(edges, verts, iters):
    verts = sorted(verts)
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    a = np.zeros((n, n))
    for s, t in edges:
        a[idx[s], idx[t]] = 1.0
    auth = np.full(n, 1.0 / n)
    hub = np.full(n, 1.0 / n)
    for _ in range(iters):
        a_raw = hub @ a
        h_raw = a @ a_raw  # hub from UNnormalized auth (matches operator)
        auth = a_raw / a_raw.sum()
        hub = h_raw / h_raw.sum()
    return {v: (auth[idx[v]], hub[idx[v]]) for v in verts}


def test_hits_matches_numpy(spark):
    verts = {v for e in GRAPH for v in e}
    expected = _np_hits(GRAPH, verts, iters=8)
    got = {
        r["host"]: (r["auth"], r["hub"])
        for r in hits(_edge_df(spark, GRAPH)).collect()
    }
    assert set(got) == verts
    for v in verts:
        assert got[v][0] == pytest.approx(expected[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(expected[v][1], abs=1e-12)
    # L1 normalization: both score vectors sum to 1
    assert sum(a for a, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(h for _, h in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_sink_and_source_scores(spark):
    got = {
        r["host"]: (r["auth"], r["hub"])
        for r in hits(_edge_df(spark, GRAPH), iterations=4).collect()
    }
    assert got["f"][1] == 0.0  # no out-edges -> hub 0
    assert got["d"][0] == 0.0  # no in-edges -> auth 0


def _py_lpa(edges, iters):
    from collections import Counter

    sym = {}
    verts = set()
    for s, t in edges:
        verts.add(s)
        verts.add(t)
        if s != t:
            sym.setdefault(s, set()).add(t)
            sym.setdefault(t, set()).add(s)
    labels = {v: v for v in verts}
    for _ in range(iters):
        nxt = {}
        for v in verts:
            nbrs = sym.get(v)
            if not nbrs:
                nxt[v] = labels[v]
                continue
            counts = Counter(labels[x] for x in nbrs)
            top = max(counts.values())
            nxt[v] = min(l for l, c in counts.items() if c == top)
        labels = nxt
    return labels


def test_label_propagation_matches_python(spark):
    # two dense triangles joined by one bridge edge + an isolate (self-loop)
    g = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("c", "x"),
        ("solo", "solo"),
    ]
    for iters in (1, 3, 5):
        expected = _py_lpa(g, iters)
        got = {
            r["host"]: r["label"]
            for r in label_propagation(
                _edge_df(spark, g), iterations=iters
            ).collect()
        }
        assert got == expected, iters
    # communities: the two triangles converge to internal labels and
    # the isolate keeps its own
    final = _py_lpa(g, 5)
    assert final["solo"] == "solo"
    assert len({final["a"], final["b"], final["c"]}) == 1


def test_label_propagation_partitioning_invariant(spark):
    e = _edge_df(spark, GRAPH)
    r1 = {
        r["host"]: r["label"]
        for r in label_propagation(e.repartition(1), iterations=4).collect()
    }
    r8 = {
        r["host"]: r["label"]
        for r in label_propagation(e.repartition(8), iterations=4).collect()
    }
    assert r1 == r8


def test_pagerank_on_extracted_generator_links(spark):
    """extract_links -> pagerank end-to-end on html built the same way
    the registry query builds it (absolute links into a host space)."""
    rows = [
        (
            f"http://www.h{i % 4}.example.com/doc/{i}",
            f'<html><body><a href="http://h{(i * 7) % 6}.example.com/p">x</a>'
            "</body></html>",
        )
        for i in range(40)
    ]
    edges = extract_links(_pages(spark, rows))
    ranks = pagerank(edges, iterations=5)
    rows_out = ranks.collect()
    assert sum(r["rank"] for r in rows_out) == pytest.approx(1.0, abs=1e-9)
    hosts = {r["host"] for r in rows_out}
    assert {f"h{i}.example.com" for i in range(6)} >= hosts
    assert any(h.startswith("h4") or h.startswith("h5") for h in hosts)


# ---------------------------------------------------------- anchor text


def test_anchor_texts_aggregation(spark):
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        anchor_texts,
    )

    t = "http://t.example.com/page"
    pages = spark.createDataFrame(
        [
            ("u1", f'<a href="{t}">Great  Site</a>'
                   f'<a href="{t}" class="x">great site</a>'
                   '<a href="/rel">relative</a>'
                   '<a href="mailto:a@b.c">mail</a>'
                   f'<a href="{t}"></a>'),
            ("u2", f'<a href="{t}">great site</a>'
                   f'<a href="{t}">other words</a>'
                   '<a href="http://z.example.com/">zzz</a>'),
        ],
        "url string, html string",
    )
    rows = anchor_texts(pages, k=2).collect()
    by_target = {}
    for r in rows:
        by_target.setdefault(r["target_url"], []).append(
            (r["rank"], r["anchor"], r["n"])
        )
    got = sorted(by_target[t])
    # case + whitespace normalized, counted across pages; empty anchor
    # and relative/mailto targets dropped
    assert got == [(1, "great site", 3), (2, "other words", 1)]
    assert by_target["http://z.example.com/"] == [(1, "zzz", 1)]


def test_anchor_texts_topk_ties_lexicographic(spark):
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        anchor_texts,
    )

    t = "https://x.example.com/"
    pages = spark.createDataFrame(
        [("u", f'<a href="{t}">bbb</a><a href="{t}">aaa</a>'
               f'<a href="{t}">ccc</a>')],
        "url string, html string",
    )
    rows = sorted(
        (r["rank"], r["anchor"]) for r in anchor_texts(pages, k=2).collect()
    )
    assert rows == [(1, "aaa"), (2, "bbb")]


# ------------------------------------------------------------ triangles


def _tri_ref(edge_list):
    """Brute-force per-node triangle counts."""
    import itertools
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    counts = defaultdict(int)
    nodes = sorted(adj)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return dict(counts)


def test_triangle_counts_vs_bruteforce(spark):
    import random

    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        triangle_counts,
    )

    rng = random.Random(11)
    nodes = [f"h{i}" for i in range(18)]
    edge_list = {(a, b) for a in nodes for b in nodes
                 if a < b and rng.random() < 0.25}
    # a hub connected to everything (exercises the degree orientation)
    edge_list |= {("hub", n) for n in nodes}
    # parallel + self + reversed edges must not change counts
    rows = [(a, b) for a, b in edge_list]
    rows += [(b, a) for a, b in list(edge_list)[:10]]
    rows += [("h0", "h0"), ("hub", "hub")]
    df = spark.createDataFrame(rows, "src_host string, dst_host string")
    got = {
        r["host"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert got == _tri_ref(edge_list)
    assert "hub" in got  # the hub closes many triangles


def test_triangle_counts_empty_and_acyclic(spark):
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        triangle_counts,
    )

    # a path graph has no triangles -> empty result
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src_host string, dst_host string",
    )
    assert triangle_counts(df).count() == 0


# ---------------------------------------------------------- random walks


def test_random_walks_deterministic_and_valid(spark):
    import hashlib

    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        random_walks,
    )

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "a"), ("b", "a"), ("x", "a"),  # x: source-only node
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    rows = random_walks(df, length=3, seed=17).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)

    def ref_hop(walk_id, t, cur):
        nbrs = sorted(adj[cur])
        hx = hashlib.md5(f"{walk_id}#{t}|17".encode()).hexdigest()
        h = int("".join(hx[2 * i : 2 * i + 2] for i in range(15, 7, -1)), 16)
        return nbrs[h % len(nbrs)]

    # every node starts one walk; each hop matches the hash rule;
    # walks follow real edges and stop at sinks
    assert set(walks) == {"a", "b", "c", "d", "x"}
    for wid, path in walks.items():
        assert path[0] == wid
        t = 1
        cur = wid
        while t in path:
            assert path[t] in adj[cur]
            assert path[t] == ref_hop(wid, t, cur)
            cur = path[t]
            t += 1
        # stopped only at a sink or full length
        assert t == 4 or cur not in adj

    # partitioning invariance
    rows8 = random_walks(df.repartition(8), length=3, seed=17).collect()
    assert sorted(map(tuple, rows8)) == sorted(map(tuple, rows))


# ------------------------------------------------------------- k-core


def test_k_core_triangle_with_tail(spark):
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        k_core,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src_host string, dst_host string",
    )
    got = {
        (r["host"], r["degree"]) for r in k_core(edges, k=2).collect()
    }
    assert got == {("a", 2), ("b", 2), ("c", 2)}  # tail d peeled
    # chain has no 2-core
    chain = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")],
        "src_host string, dst_host string",
    )
    assert k_core(chain, k=2).count() == 0


def test_k_core_cascading_peel_and_symmetrize(spark):
    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        k_core,
    )

    # clique {a,b,c,d}; pendant chain e-f hanging off d; duplicate and
    # reverse edges + a self-loop must not inflate degrees
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("e", "f"), ("a", "a"),
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {(r["host"], r["degree"]) for r in k_core(df, k=3).collect()}
    # peeling cascades: f (deg 1) then e (deg 1) then nothing else;
    # the 3-core is the clique with in-core degree 3 each
    assert got == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}
    a = {tuple(r) for r in k_core(df.repartition(1), k=2).collect()}
    b = {tuple(r) for r in k_core(df.repartition(7), k=2).collect()}
    assert a == b


def test_k_core_raises_on_non_convergence(spark):
    import pytest

    from aml_entity_resolution_assignment_spark.operators.linkgraph import (
        k_core,
    )

    # a 14-node path peels two endpoints per round: needs 7 rounds +
    # the convergence-detection round; max_rounds=3 must raise, not
    # silently return the middle of the path as a fake 2-core
    path = [(f"n{i}", f"n{i+1}") for i in range(13)]
    df = spark.createDataFrame(path, "src_host string, dst_host string")
    with pytest.raises(ValueError, match="did not converge"):
        k_core(df, k=2, max_rounds=3)
    assert k_core(df, k=2, max_rounds=12).count() == 0  # true 2-core
