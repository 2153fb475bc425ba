"""Link-graph analytics over web pages: href extraction + PageRank + HITS.

The reference pipeline stops at entity clustering (connected components
over match edges, src/matching.py); a Common-Crawl-scale corpus also
carries the *hyperlink* graph, and the standard training-data uses for
it are host-level authority scores (PageRank / HITS) for quality
weighting and crawl prioritization. This module provides:

- ``extract_links``    pages(url, html) -> (src_host, dst_host, n_links)
                       host-level edge table, pure column expressions
                       (regexp href scan + JVM url parse — no UDF).
- ``pagerank``         fixed-iteration power method with dangling-mass
                       redistribution (Page et al. 1999 form).
- ``hits``             Kleinberg hubs/authorities, L1-normalized per
                       iteration (L1 instead of the paper's L2 so the
                       SQL oracle twin needs no sqrt; the ranking order
                       is identical — normalization only rescales).

Scale notes (10^12 pages): extract_links is a single codegen'd
projection — no shuffle until the host-pair groupBy, whose key space is
|hosts|^2-bounded and heavily combinable map-side. PageRank/HITS
iterate over the HOST graph (|hosts| ~ 10^8 for the full web, ~5 orders
smaller than pages): the weighted edge table is computed once and
persisted partitioned by src; each iteration is ONE fused job (the
dangling-mass scalar collect materializes the previous round's lazy
localCheckpoint), with one shuffle for the contribution groupBy. On a
cluster the edge table would be bucketed by src (sources/io.py
write_bucketed) so the per-iteration join is one-sided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aml_entity_resolution_assignment_spark.functions.normalize import (
    norm_hostname,
    url_host,
)

_HREF_RE = r'href="([^"]+)"'


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Host-level link edges from raw page HTML.

    Scans ``href="..."`` attributes (double-quoted form — the shape the
    engine's page generator and WARC fixtures emit), keeps absolute
    http(s) targets only (relative / mailto: / javascript: links carry
    no cross-host signal), and normalizes both endpoints with the same
    ``norm_hostname`` used by the bk_host blocking key, so the link
    graph and the ER graph share one host vocabulary.

    Returns (src_host, dst_host, n_links) — n_links counts parallel
    links; self-links (same host) are kept, PageRank handles them.
    Entirely JVM column expressions: regexp scan + explode + parse_url;
    the only shuffle is the final bounded host-pair aggregation.
    """
    html = F.col(html_col).cast("string")
    src = norm_hostname(url_host(F.col(url_col)))
    out = (
        pages.select(
            src.alias("src_host"),
            F.explode(
                F.regexp_extract_all(html, F.lit(_HREF_RE), F.lit(1))
            ).alias("href"),
        )
        .where(F.col("href").rlike("^https?://"))
        .select(
            "src_host",
            norm_hostname(url_host(F.col("href"))).alias("dst_host"),
        )
        .where((F.col("src_host") != "") & (F.col("dst_host") != ""))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an (src, dst) edge table.

    r_k(v) = (1-d)/N + d * (sum_{u->v} r_{k-1}(u)/outdeg(u) + D_{k-1}/N)

    where D is the total rank mass on dangling vertices (no out-edges),
    redistributed uniformly — so sum(rank) == 1 exactly at every
    iteration (the standard stochastic-matrix completion). Parallel
    edges are collapsed first (unweighted graph). Deterministic for a
    fixed iteration count; returns (host, rank).

    The whole fixed-iteration chain runs as ONE caller-driven job: the
    dangling-mass aggregate is a broadcast 1-row crossJoin (not a
    driver collect), so rounds chain through lazy localCheckpoints
    with zero per-round driver actions.

    Partitioning (guide §2.4 — two operations keyed the same way share
    one exchange): every per-round table is hash-partitioned on the
    vertex key at ONE partition count derived from the measured vertex
    count (~100k rows/partition, capped at the session setting — the
    CC-style scale-adaptive sizing, never a local-mode constant).
    w_edges(src, p), ranks(v, p) and verts(v, p) are then
    co-partitioned, so each iteration plans exactly ONE exchange (the
    contribution re-key src -> dst); the rank-update join against
    verts is exchange-free.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select("dst"))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # dangling flag rides the vertex table: the per-iteration mass
    # aggregate is then a filter+sum with no join
    verts0 = (
        verts.join(outdeg.withColumnRenamed("src", "v"), "v", "left")
        .select("v", F.col("deg").isNull().alias("is_dangling"))
        .persist()
    )
    n = verts0.count()
    if n == 0:
        verts0.unpersist()
        return verts0.select(F.col("v").alias("host"), F.lit(0.0).alias("rank"))
    spark = edges.sparkSession
    orig_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nparts = max(8, min(orig_parts, n // 100_000 + 1))
    verts = verts0.repartition(nparts, "v").localCheckpoint(eager=False)
    w_edges = (
        e.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition(nparts, "src")
        .persist()
    )

    base = (1.0 - damping) / n
    ranks = verts.select("v", F.lit(1.0 / n).alias("rank"), "is_dangling")
    for _ in range(iterations):
        # the dangling mass rides as a BROADCAST 1-row aggregate
        # (crossJoin) instead of a per-round driver collect: the whole
        # fixed-iteration chain is ONE caller-driven job — each round's
        # lazy checkpoint is materialized by the next round's broadcast
        # build, with zero driver round-trips (same arithmetic: the
        # scalar division moves from Python to the identical double
        # expression)
        dm = ranks.where("is_dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contrib = (
            ranks.join(w_edges, ranks["v"] == w_edges["src"])
            # ONE exchange per round: the explicit (nparts, dst)
            # repartition is reused by the groupBy (same key, same
            # count), and its output co-partitions with verts(v, p)
            # so the rank-update join below is exchange-free
            .repartition(nparts, "dst")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        ranks = (
            verts.join(contrib, verts["v"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "v",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("_dm") / F.lit(float(n))
                    )
                ).alias("rank"),
                "is_dangling",
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select(F.col("v").alias("host"), "rank")
    out = out.localCheckpoint(eager=True)  # release the persisted inputs
    verts0.unpersist()
    w_edges.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    iterations: int = 5,
) -> DataFrame:
    """Synchronous label propagation (Raghavan 2007) — community
    detection, complementing connected_components (which finds REACHABLE
    sets, not dense groups).

    Labels start as the vertex id; each iteration every vertex adopts
    the most frequent label among its neighbors (graph treated as
    undirected), ties broken by MIN label — fully deterministic for a
    fixed iteration count, no random vertex order. Isolated vertices
    keep their own label. Returns (host, label).

    Per iteration: one symmetrized join + one (vertex, label) count
    aggregation + one per-vertex arg-min/max aggregate — two shuffles,
    both on vertex keys; rounds chain through LAZY localCheckpoints,
    so a fixed-iteration run is ONE caller-driven job with no
    per-round driver action (checkpoints still cut lineage). Synchronous
    LPA can 2-cycle on bipartite structures; a fixed iteration budget
    (the standard Spark/GraphX contract) makes that a documented
    determinism, not an infinite loop.
    """
    # distinct column names per table: localCheckpoint keeps expression
    # ids, so reusing "u" across labels and sym would make each round's
    # self-join ambiguous
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).where(
        F.col("s") != F.col("t")
    ).distinct()
    # lazy localCheckpoint instead of persist: round 1 materializes it,
    # later rounds reuse the blocks, and the ContextCleaner reclaims
    # them when the RDD is dropped — no unpersist bookkeeping, which a
    # fully lazy loop could no longer order correctly anyway
    sym = (
        e.union(e.select(F.col("t").alias("s"), F.col("s").alias("t")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    verts = (
        edges.select(F.col(src).alias("u"))
        .union(edges.select(F.col(dst).alias("u")))
        .distinct()
    )

    # LAZY checkpoints throughout: a fixed-iteration loop needs no
    # driver action per round — the caller's one action materializes
    # the whole chain, each round's checkpoint caching its output for
    # the next (was one eager-checkpoint job per round)
    labels = verts.select("u", F.col("u").alias("label")).localCheckpoint(
        eager=False
    )
    for _ in range(iterations):
        neigh = (
            labels.join(sym, labels["u"] == sym["t"])
            .groupBy(F.col("s").alias("w"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        # arg-max by (cnt desc, label asc) as ONE aggregate: min of the
        # (negated count, label) struct — struct ordering is
        # lexicographic, so this is exactly max-count-then-min-label
        best = (
            neigh.groupBy("w")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"), F.col("label").alias("l")
                    )
                ).alias("b")
            )
            .select(F.col("w").alias("u"), F.col("b.l").alias("new_label"))
        )
        labels = (
            labels.join(best, "u", "left")
            .select(
                "u",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels.select(F.col("u").alias("host"), "label")


def hits(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    iterations: int = 8,
) -> DataFrame:
    """Kleinberg HITS: (host, auth, hub), L1-normalized per iteration.

    auth_k(v) = sum_{u->v} hub_{k-1}(u), then auth_k /= sum(auth_k);
    hub_k(u)  = sum_{u->v} auth_k(v),   then hub_k  /= sum(hub_k).

    Both scores start uniform (1/N). Vertices with no in-edges get
    auth 0, no out-edges hub 0 (after the first iteration). Same
    fused-job iteration shape as pagerank; the edge table is persisted
    once in both orientations' join key partitioning.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("v")).union(e.select("dst")).distinct().persist()
    )
    n = verts.count()
    if n == 0:
        return verts.select(
            F.col("v").alias("host"),
            F.lit(0.0).alias("auth"),
            F.lit(0.0).alias("hub"),
        )
    e = e.persist()

    scores = verts.select(
        "v", F.lit(1.0 / n).alias("auth"), F.lit(1.0 / n).alias("hub")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        auth_raw = (
            scores.join(e, scores["v"] == e["src"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
        )
        with_auth = verts.join(
            auth_raw, verts["v"] == auth_raw["dst"], "left"
        ).select("v", F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"))
        hub_raw = (
            with_auth.join(e, with_auth["v"] == e["dst"])
            .groupBy("src")
            .agg(F.sum("a_raw").alias("h_raw"))
        )
        nxt = (
            with_auth.join(hub_raw, with_auth["v"] == hub_raw["src"], "left")
            .select(
                "v", "a_raw", F.coalesce("h_raw", F.lit(0.0)).alias("h_raw")
            )
            .localCheckpoint(eager=False)
        )
        # ONE scalar job materializes the round, then normalize lazily
        # (the L1 sums are over already-checkpointed rows)
        sums = nxt.agg(
            F.sum("a_raw").alias("sa"), F.sum("h_raw").alias("sh")
        ).collect()[0]
        sa = sums["sa"] or 1.0
        sh = sums["sh"] or 1.0
        scores = nxt.select(
            "v",
            (F.col("a_raw") / F.lit(sa)).alias("auth"),
            (F.col("h_raw") / F.lit(sh)).alias("hub"),
        )
    out = scores.select(F.col("v").alias("host"), "auth", "hub")
    out = out.localCheckpoint(eager=True)
    verts.unpersist()
    e.unpersist()
    return out


def anchor_texts(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    k: int = 3,
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-corpus
    side product (anchor text is the query-independent description of
    a page; search engines and label-generation pipelines aggregate it
    per target). Scans `<a href="...">text</a>` pairs (two
    regexp_extract_all passes over the SAME pattern — per the regex
    engine's left-to-right scan both passes yield matches in the same
    order, so arrays_zip aligns href with its own anchor), keeps
    absolute http(s) targets with non-empty anchors, normalizes the
    anchor (lowercase, whitespace-collapsed), and emits the top-k
    anchors per target by frequency (ties lexicographic).

    Returns (target_url, anchor, n, rank). Scale shape: one explode,
    one (target, anchor) key-grouped count, one window partitioned by
    target — bounded by the distinct-anchor fanout per target, never
    corpus-wide. All JVM expressions."""
    from pyspark.sql.window import Window

    pat = r'<a href="([^"]+)"[^>]*>([^<]*)</a>'
    html = F.col(html_col).cast("string")
    zipped = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(pat), F.lit(1)).alias("href"),
        F.regexp_extract_all(html, F.lit(pat), F.lit(2)).alias("anchor"),
    )
    pairs = (
        pages.select(F.explode(zipped).alias("z"))
        .select(
            F.col("z.href").alias("target_url"),
            F.trim(
                F.regexp_replace(F.lower(F.col("z.anchor")), r"\s+", " ")
            ).alias("anchor"),
        )
        .where(F.col("target_url").rlike("^https?://"))
        .where(F.col("anchor") != "")
    )
    counts = pairs.groupBy("target_url", "anchor").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("target_url").orderBy(
        F.col("n").desc(), F.col("anchor")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("target_url", "anchor", "n", "rank")
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph of
    `edges` — the classic cohesion analytic (spam farms and mirror
    rings are triangle-dense; organic link neighborhoods are sparse).

    Scale shape: the DEGREE-ORIENTED node-iterator. Each undirected
    edge is oriented from its lower-(degree, name) endpoint to the
    higher one; wedges are generated only between a node's
    OUT-neighbors, so a node contributes C(out_deg, 2) wedge pairs
    with out-degree bounded by O(sqrt(m)) — the hub that would
    generate deg^2 wedges under naive iteration generates almost
    none. Closure is one equi-join back to the oriented edge set
    (the ordering guarantees the closing edge, if present, is
    oriented v->w). Every triangle is found exactly once, at its
    least-(degree, name) corner. Three shuffles total: degree agg,
    wedge self-join, closure join.

    Returns (host, n_triangles) for nodes in >= 1 triangle."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("x"),
            F.greatest(F.col(src), F.col(dst)).alias("y"),
        )
        .where(F.col("x") != F.col("y"))
        .distinct()
    )
    deg = (
        und.select(F.col("x").alias("n"))
        .unionByName(und.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    e = (
        und.join(deg.select(F.col("n").alias("x"), F.col("d").alias("dx")),
                 "x")
        .join(deg.select(F.col("n").alias("y"), F.col("d").alias("dy")),
              "y")
    )
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    oriented = e.select(
        F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("u"),
        F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("w"),
        F.when(x_first, F.col("dy")).otherwise(F.col("dx")).alias("dw"),
    )
    o1 = oriented.select(
        F.col("u"), F.col("w").alias("v"), F.col("dw").alias("dv")
    )
    o2 = oriented.select("u", "w", "dw")
    wedges = o1.join(o2, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(
        F.col("u").alias("v"), F.col("w")
    )
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_triangles"))
    )


def random_walks(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    length: int = 4,
    seed: int | str = 17,
) -> DataFrame:
    """Deterministic uniform random walks — the DeepWalk/node2vec
    corpus generator (walks become the "sentences" a graph-embedding
    model trains on). One walk starts at every node; at step t the
    next hop is out-neighbor number
        hash_u64(walk_id # t) mod out_degree(cur)
    (content-hash uniform, operators/sampling.hash_u64), so the walk
    set is identical across re-runs, partitionings, and engines — the
    SQL twin replays every hop. Walks stop early at sinks.

    Scale shape: neighbor indexing is one per-src window (bounded by
    out-degree); each of the `length` steps is two equi-joins (degree,
    indexed adjacency) chained lazily into one plan — the pagerank-
    style fixed-iteration shape, no driver round-trips.

    Returns (walk_id, step, node)."""
    from pyspark.sql.window import Window

    from .sampling import hash_u64

    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    w = Window.partitionBy("u").orderBy("v")
    # lazy checkpoint: the indexed adjacency feeds every hop's join,
    # the degree table and the start-node list — without it each of
    # the `length` steps re-runs the distinct + window lineage
    adj = adj.withColumn("nbr", F.row_number().over(w) - 1).localCheckpoint(
        eager=False
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("outd"))
    nodes = (
        adj.select("u")
        .unionByName(adj.select(F.col("v").alias("u")))
        .distinct()
    )
    state = nodes.select(
        F.col("u").alias("walk_id"),
        F.lit(0).alias("step"),
        F.col("u").alias("node"),
    )
    out = state
    for t in range(1, length + 1):
        hop = F.pmod(
            hash_u64(
                F.concat_ws("#", F.col("walk_id"), F.lit(str(t))), seed
            ),
            F.col("outd").cast("decimal(20,0)"),
        ).cast("int")
        nxt = (
            state.join(deg, state["node"] == deg["u"])
            .select("walk_id", F.col("node").alias("_cur"), hop.alias("_i"))
            .join(
                adj,
                (F.col("_cur") == adj["u"]) & (F.col("_i") == adj["nbr"]),
            )
            .select(
                "walk_id", F.lit(t).alias("step"), F.col("v").alias("node")
            )
        )
        out = out.unionByName(nxt)
        state = nxt
    return out


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src_host",
    dst: str = "dst_host",
    max_rounds: int = 30,
) -> DataFrame:
    """Vertices of the undirected k-core (the maximal subgraph where
    every vertex keeps degree >= k) by synchronous peeling — the
    standard link-spam / tightly-knit-community signal on host graphs
    (a k-core of mutually-linking hosts with k large is a link farm;
    coreness also orders crawl frontiers by connectivity).

    Peeling: symmetrize to a simple undirected graph (self-loops
    dropped), then repeatedly delete every vertex whose current degree
    is < k until a fixpoint; what survives is exactly the k-core
    (order-independent, hence deterministic). Each round is one
    degree aggregation + two left-semi joins; the edge table shrinks
    monotonically, so rounds get cheaper; the loop stops at the first
    round that deletes nothing (the surviving-vertex count is the
    1-row action that also materializes the round's lazy
    localCheckpoint, the fused-round pattern of pagerank/CC). NOTE:
    synchronous peel depth is worst-case O(|V|) (a path graph peels
    two endpoints per round), so non-convergence within `max_rounds`
    raises rather than silently returning a superset of the k-core;
    raise `max_rounds` for deep chain-shaped graphs.

    Returns (host, degree) for k-core members, degree = within-core
    degree (>= k by construction)."""
    if k < 1:
        raise ValueError("need k >= 1")
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        fwd.unionByName(
            fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_prev = -1
    converged = False
    for _ in range(max_rounds):
        deg = e.groupBy("a").agg(F.count("*").alias("degree"))
        keep = deg.where(F.col("degree") >= k).localCheckpoint(eager=False)
        n = keep.count()  # the ONE action per round
        if n == n_prev:
            converged = True
            break
        n_prev = n
        kv = keep.select("a")
        e = (
            e.join(kv, "a", "left_semi")
            .join(kv.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    if not converged:
        raise ValueError(
            f"k_core did not converge within max_rounds={max_rounds}; "
            "the partially-peeled graph is a SUPERSET of the k-core — "
            "raise max_rounds (synchronous peel depth is worst-case "
            "O(|V|) on chain-shaped graphs)"
        )
    return (
        e.groupBy("a")
        .agg(F.count("*").alias("degree"))
        .where(F.col("degree") >= k)
        .select(F.col("a").alias("host"), "degree")
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    max_degree: int | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction over the undirected host graph:
    for every NON-adjacent pair (u, v) sharing at least one neighbor,
    score = sum over common neighbors z of 1/ln(deg(z)) — the classic
    "which links are missing" analytic (entity-graph completion,
    related-host discovery, crawl-frontier hinting). Shared neighbors
    through low-degree nodes count more than through mega-hubs, which
    is the whole point versus raw common-neighbor counts.

    Scale shape: wedge generation is a self-join of the symmetrized
    edge list on the CENTER node z, so candidate volume is
    sum(deg(z)^2). On power-law web graphs that sum is owned by a few
    mega-hubs whose wedges carry negligible weight anyway (1/ln(deg)
    -> 0), so `max_degree` drops center nodes above the cap BEFORE the
    join — the standard bounded-wedge trade (same cap family as the
    blocking drop-cap) that turns the quadratic hub term into a
    constant; the cap is part of the operator's declared semantics,
    not a silent truncation, and the SQL twin applies the same cap.
    After the wedge aggregate, one anti-join against the edge set
    removes already-linked pairs; `top_k` keeps the best suggestions
    per LEFT endpoint via a ranking window (ROUNDED score desc,
    partner asc — ranking on 6-dp-rounded scores makes the selection
    invariant to floating-point summation order, the same
    engine-invariance convention as joins.mutual_best_match).

    Returns (host_a, host_b, score, n_common) with host_a < host_b.
    """
    from pyspark.sql import Window

    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        fwd.unionByName(
            fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count("*").alias("d"))
    centers = und.join(deg.select(F.col("a"), F.col("d")), "a")
    if max_degree is not None:
        centers = centers.where(F.col("d") <= max_degree)
    # center z contributes the wedge (x, z, y) for every neighbor pair
    left = centers.select(
        F.col("a").alias("z"), F.col("b").alias("x"), F.col("d")
    )
    right = centers.select(F.col("a").alias("z"), F.col("b").alias("y"))
    wedges = (
        left.join(right, "z")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(
            F.sum(1.0 / F.log(F.col("d").cast("double"))).alias("score"),
            F.count("*").alias("n_common"),
        )
    )
    existing = und.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).where(F.col("x") < F.col("y"))
    out = wedges.join(existing, ["x", "y"], "left_anti").select(
        F.col("x").alias("host_a"),
        F.col("y").alias("host_b"),
        F.col("score"),
        F.col("n_common"),
    )
    if top_k is not None:
        w = Window.partitionBy("host_a").orderBy(
            F.round(F.col("score"), 6).desc(), F.col("host_b")
        )
        out = (
            out.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= top_k)
            .drop("_r")
        )
    return out
