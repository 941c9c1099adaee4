"""PageRank: numpy-reference parity, dangling mass, mode equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from wistia_video_analytics_project_spark.operators import graph


def _ref_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({u for u, v, w in edges} | {v for u, v, w in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, v, w in edges:
        out[idx[u]] += w
    r = np.ones(n) / n
    for _ in range(iters):
        new = np.full(n, (1 - d) / n)
        dm = float(r[out == 0].sum())
        for u, v, w in edges:
            new[idx[v]] += d * r[idx[u]] * w / out[idx[u]]
        new += d * dm / n
        r = new
    return {node: float(r[idx[node]]) for node in nodes}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = graph.pagerank(df, weight="w", **kw).collect()
    return {r.node: r.rank for r in got}


def test_pagerank_matches_reference_with_dangling(spark):
    """Node 4 has no out-edges: its mass must redistribute, not vanish."""
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 2.0), (1, 4, 1.0)]
    got = _run(spark, edges, iterations=10)
    want = _ref_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_lazy_chain_matches_checkpointed_on_symmetric(spark):
    """On a symmetrized graph (no dangling) the single-action lazy chain
    and the checkpoint-per-iteration mode agree exactly, and both match
    the reference."""
    base = [(1, 2, 1.0), (2, 3, 3.0), (1, 3, 1.0), (3, 4, 2.0)]
    edges = base + [(v, u, w) for u, v, w in base]
    lazy = _run(spark, edges, iterations=8, handle_dangling=False)
    ckpt = _run(spark, edges, iterations=8, handle_dangling=True)
    want = _ref_pagerank(edges, iters=8)
    for node in want:
        assert lazy[node] == pytest.approx(want[node], abs=1e-12), node
        assert ckpt[node] == pytest.approx(want[node], abs=1e-12), node
    assert sum(lazy.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_hub_outranks_leaves(spark):
    """A star hub receiving every leaf's full rank must outrank leaves."""
    leaves = list(range(2, 9))
    edges = [(leaf, 1, 1.0) for leaf in leaves] + [
        (1, leaf, 1.0) for leaf in leaves
    ]
    got = _run(spark, edges, iterations=10, handle_dangling=False)
    hub = got[1]
    assert all(hub > got[leaf] for leaf in leaves)


def test_triangle_stats_known_graphs(spark):
    """K4 has 4 triangles / 12 wedges / clustering 1.0; adding a pendant
    vertex adds 3 wedges at the attachment point and no triangles."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4, "a long, b long")
    row = graph.triangle_stats(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (
        4, 6, 4, 12,
    )
    assert row.global_clustering == 1.0

    pend = spark.createDataFrame(k4 + [(4, 5)], "a long, b long")
    row = graph.triangle_stats(pend).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles, row.n_wedges) == (
        5, 7, 4, 15,
    )
    assert row.global_clustering == round(12 / 15, 6)


def test_triangle_stats_triangle_free(spark):
    """A star graph has wedges but zero triangles."""
    star = [(1, leaf) for leaf in range(2, 7)]
    df = spark.createDataFrame(star, "a long, b long")
    row = graph.triangle_stats(df).collect()[0]
    assert row.n_triangles == 0 and row.n_wedges == 10
    assert row.global_clustering == 0.0


def test_k_core_peels_to_dense_backbone(spark):
    """K4 plus a pendant chain: the 3-core is exactly the K4 (every
    survivor at degree 3); the chain peels away over multiple rounds."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(k4 + chain, "a long, b long")
    got = {r.node: r.core_degree for r in graph.k_core(df, 3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # 2-core of a triangle with a tail = the triangle
    tri = [(1, 2), (2, 3), (1, 3), (3, 9), (9, 10)]
    df = spark.createDataFrame(tri, "a long, b long")
    got = {r.node: r.core_degree for r in graph.k_core(df, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_when_k_exceeds_density(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame(tri, "a long, b long")
    assert graph.k_core(df, 3).count() == 0


def test_personalized_pagerank_matches_reference(spark):
    """Seeded teleport: mass concentrates near the seed set, matches an
    in-memory reference in both execution modes, and still sums to 1."""

    def ref_ppr(edges, seeds, d=0.85, iters=8):
        nodes = sorted({u for u, v, w in edges} | {v for u, v, w in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        out = np.zeros(n)
        for u, v, w in edges:
            out[idx[u]] += w
        tu = np.array([1.0 / len(seeds) if x in seeds else 0.0 for x in nodes])
        r = tu.copy()
        for _ in range(iters):
            new = (1 - d) * tu
            dm = float(r[out == 0].sum())
            for u, v, w in edges:
                new[idx[v]] += d * r[idx[u]] * w / out[idx[u]]
            new += d * dm * tu
            r = new
        return {x: float(r[idx[x]]) for x in nodes}

    base = [(1, 2, 1.0), (2, 3, 3.0), (1, 3, 1.0), (3, 4, 2.0)]
    edges = base + [(v, u, w) for u, v, w in base]
    seeds = {1}
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    sdf = spark.createDataFrame([(1,)], "node long")
    want = ref_ppr(edges, seeds, iters=8)
    for dangling in (False, True):
        got = {
            r.node: r.rank
            for r in graph.pagerank(
                df, iterations=8, weight="w", handle_dangling=dangling,
                seeds=sdf,
            ).collect()
        }
        for node in want:
            assert got[node] == pytest.approx(want[node], abs=1e-12), (
                dangling, node,
            )
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # relevance is seed-centric: the seed outranks the far node
    assert got[1] > got[4]

    # dangling digraph: mass returns to the seed, never vanishes
    dg = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, w double"
    )
    got = {
        r.node: r.rank
        for r in graph.pagerank(
            dg, iterations=10, weight="w", seeds=sdf
        ).collect()
    }
    want = ref_ppr([(1, 2, 1.0), (2, 3, 1.0)], {1}, iters=10)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_bipartite_reference_and_ordering(spark):
    """Kleinberg iterations match an in-memory reference exactly, and a
    part bought by every customer out-authorities niche parts."""
    edges = [
        (1, 100), (2, 100), (3, 100),   # part 100: universal
        (1, 200), (2, 200),             # part 200: popular
        (3, 300),                       # part 300: niche
    ]
    df = spark.createDataFrame(edges, "c long, p long")
    hubs, auths = graph.hits_bipartite(df, iterations=3,
                                       hub_col="c", auth_col="p")
    got_a = {r.auth: r.auth_score for r in auths.collect()}
    got_h = {r.hub: r.hub_score for r in hubs.collect()}

    import collections

    h = {c: 1.0 for c, _ in edges}
    for _ in range(3):
        a = collections.defaultdict(float)
        for c, p in edges:
            a[p] += h[c]
        h = collections.defaultdict(float)
        for c, p in edges:
            h[c] += a[p]
    assert got_a == pytest.approx(dict(a))
    assert got_h == pytest.approx(dict(h))
    assert got_a[100] > got_a[200] > got_a[300]


def test_degree_powerlaw_matches_hand_formula(spark):
    """CSN alpha on a hand-built degree multiset equals the closed form,
    and a hub-heavy graph yields a lower (heavier-tailed) alpha than a
    regular one."""
    import math

    k4 = [(x, y) for x in range(1, 5) for y in range(x + 1, 5)]  # all deg 3
    row = graph.degree_powerlaw(
        spark.createDataFrame(k4, "a long, b long"), dmin=2
    ).collect()[0]
    want = 1.0 + 4 / (4 * math.log(3 / 1.5))
    assert row.alpha_mle == round(want, 4)
    assert (row.n_nodes, row.n_tail, row.max_degree) == (4, 4, 3)

    star = [(1, leaf) for leaf in range(2, 30)] + [(2, 3), (4, 5)]
    hubby = graph.degree_powerlaw(
        spark.createDataFrame(star, "a long, b long"), dmin=2
    ).collect()[0]
    assert hubby.max_degree == 28
    assert hubby.alpha_mle < row.alpha_mle  # heavier tail


def test_assortativity_signs(spark):
    """A star is maximally disassortative (r = -1); a clique's degree
    correlation is undefined-degenerate (denominator 0 -> NULL), and a
    two-clique chain is assortative-positive."""
    star = [(1, leaf) for leaf in range(2, 8)]
    r = graph.degree_assortativity(
        spark.createDataFrame(star, "a long, b long")
    ).collect()[0]
    assert r.n_edges == 6 and r.assortativity == -1.0

    k4 = [(x, y) for x in range(1, 5) for y in range(x + 1, 5)]
    r = graph.degree_assortativity(
        spark.createDataFrame(k4, "a long, b long")
    ).collect()[0]
    assert r.assortativity is None  # all degrees equal: zero variance

    # hand-computed Pearson over the symmetrized endpoint-degree pairs
    g = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    import numpy as np

    deg = {}
    for u, v in g:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    ju = [deg[u] for u, v in g] + [deg[v] for u, v in g]
    jv = [deg[v] for u, v in g] + [deg[u] for u, v in g]
    want = round(float(np.corrcoef(ju, jv)[0, 1]), 4)
    r = graph.degree_assortativity(
        spark.createDataFrame(g, "a long, b long")
    ).collect()[0]
    assert r.assortativity == want


def test_hits_rejects_nonpositive_iterations(spark):
    """iterations < 1 must raise a clear ValueError at entry, not an
    AttributeError on the never-assigned authority frame (r4 ADVICE)."""
    df = spark.createDataFrame([(1, 10), (2, 10)], "hub long, auth long")
    with pytest.raises(ValueError, match="iterations"):
        graph.hits_bipartite(df, iterations=0)


def test_pagerank_stats_reports_node_count(spark):
    edges = [(1, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 2, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    stats = {}
    graph.pagerank(
        df, weight="w", handle_dangling=False, stats=stats
    ).collect()
    assert stats == {"n_nodes": 3}


def test_k_core_stats_flags_convergence(spark):
    # converges quickly: fixpoint inside max_rounds
    tri = [(1, 2), (2, 3), (1, 3), (3, 9), (9, 10)]
    df = spark.createDataFrame(tri, "a long, b long")
    stats = {}
    graph.k_core(df, 2, stats=stats).collect()
    assert stats["converged"] is True and stats["rounds"] >= 1
    # truncated peel: a long chain under 2-core peels one edge per
    # round from each end; max_rounds=1 cannot reach fixpoint
    chain = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(chain, "a long, b long")
    stats = {}
    graph.k_core(df, 2, max_rounds=1, stats=stats).collect()
    assert stats["converged"] is False and stats["rounds"] == 1


# --- label propagation ------------------------------------------------------


def _two_clique_graph(spark):
    from itertools import combinations

    edges = [(a, b, 5.0) for a, b in combinations(range(0, 5), 2)]
    edges += [(a, b, 5.0) for a, b in combinations(range(10, 15), 2)]
    edges.append((4, 10, 1.0))  # weak bridge
    return spark.createDataFrame(edges, "a long, b long, w double")


def test_label_propagation_recovers_planted_partition(spark):
    df = _two_clique_graph(spark)
    labels = {
        r.node: r.community
        for r in graph.label_propagation(df, weight="w", rounds=5).collect()
    }
    left = {labels[n] for n in range(0, 5)}
    right = {labels[n] for n in range(10, 15)}
    assert len(left) == 1 and len(right) == 1
    assert left != right
    # deterministic ties -> every label is the community's smallest id
    assert left == {0} and right == {10}


def test_label_propagation_deterministic_and_rounds_contract(spark):
    df = _two_clique_graph(spark)
    a = sorted(
        (r.node, r.community)
        for r in graph.label_propagation(df, weight="w", rounds=3).collect()
    )
    b = sorted(
        (r.node, r.community)
        for r in graph.label_propagation(
            df.repartition(7), weight="w", rounds=3
        ).collect()
    )
    assert a == b
    # rounds=0: every node keeps its own id
    own = graph.label_propagation(df, weight="w", rounds=0).collect()
    assert all(r.node == r.community for r in own)


def test_community_summary_modularity_signs(spark):
    from pyspark.sql import functions as F

    df = _two_clique_graph(spark)
    labels = graph.label_propagation(df, weight="w", rounds=5)
    edges = df.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    )
    rows = graph.community_summary(labels, edges).collect()
    assert {r.community for r in rows} == {0, 10}
    for r in rows:
        assert r.n_nodes == 5
        # two near-disjoint cliques: each contributes positive modularity
        assert r.modularity_part > 0.1
        assert r.internal_w == 50.0  # C(5,2)=10 edges x weight 5
