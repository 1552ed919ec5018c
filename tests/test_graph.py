"""Graph analytics: PageRank differential vs dense numpy power
iteration, degree bookkeeping, and the structural invariants (mass
conservation, dangling handling) the DataFrame formulation must keep.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_marketdata_downloader_archived_spark.operators.graph import degrees, pagerank


def _numpy_pagerank(edges, n, damping=0.85, iters=50):
    """Dense reference: row-stochastic transition with uniform
    redistribution of dangling mass, power-iterated."""
    m = np.zeros((n, n))
    for s, d in edges:
        m[s, d] += 1.0
    out = m.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s in range(n):
            if out[s] > 0:
                contrib += r[s] * m[s] / out[s]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


@pytest.mark.parametrize("seed", [0, 7])
def test_pagerank_matches_numpy(spark, seed) -> None:
    rng = np.random.default_rng(seed)
    n = 12
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(40, 2))
        if a != b
    ]
    # ensure at least one dangling node (all out-edges removed)
    edges = [(s, d) for s, d in edges if s != n - 1]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r.node: r.rank
        for r in pagerank(df, max_iter=50, tol=None).collect()
    }
    want = _numpy_pagerank(edges, n)
    touched = {s for s, _ in edges} | {d for _, d in edges}
    for node in touched:
        assert got[node] == pytest.approx(want[node], abs=1e-8)
    # ranks over TOUCHED nodes must carry the mass numpy assigns them
    assert sum(got.values()) == pytest.approx(
        sum(want[list(touched)]), abs=1e-6
    )


def test_pagerank_mass_sums_to_one_on_closed_graph(spark) -> None:
    # cycle + chord: every node has an out-edge, so total rank == 1
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    df = spark.createDataFrame(edges, "src int, dst int")
    ranks = pagerank(df, max_iter=40, tol=1e-12, check_every=5)
    total = sum(r.rank for r in ranks.collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_pagerank_authority_ordering(spark) -> None:
    # star: everyone links to node 0 -> node 0 must rank highest
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    ranks = {r.node: r.rank for r in pagerank(df, max_iter=30).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > 3 * ranks[2]


def test_pagerank_collapses_parallel_edges(spark) -> None:
    """Weight = parallel-edge multiplicity / out-degree: node 2
    (receiving 3 of A's 4 edge-slots) must outrank node 1 (1 slot)."""
    edges = [(0, 2), (0, 2), (0, 2), (0, 1), (1, 0), (2, 0)]
    df = spark.createDataFrame(edges, "src int, dst int")
    ranks = {
        r.node: r.rank
        for r in pagerank(df, max_iter=60, tol=None).collect()
    }
    assert ranks[2] > ranks[1]
    want = _numpy_pagerank(edges, 3, iters=60)
    for i in range(3):
        assert ranks[i] == pytest.approx(want[i], abs=1e-8)


def test_degrees(spark) -> None:
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (0, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: (r.out_degree, r.in_degree) for r in degrees(df).collect()}
    assert got == {0: (3, 1), 1: (1, 2), 2: (1, 2)}


def _brute_triangles(edges):
    import itertools

    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nodes = sorted({n for e in und for n in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )


def test_triangle_count_known_answers(spark) -> None:
    from etl_marketdata_downloader_archived_spark.operators.graph import (
        triangle_count,
    )

    # K4 has 4 triangles; direction/multiplicity/self-loops collapse
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    k4 += [(0, 0), (1, 2), (2, 1)]
    df = spark.createDataFrame(k4, "src int, dst int")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)

    # triangle-free: a star
    star = [(0, i) for i in range(1, 6)]
    r = triangle_count(
        spark.createDataFrame(star, "src int, dst int")
    ).collect()[0]
    assert r.n_triangles == 0


def test_triangle_count_vs_brute_force(spark) -> None:
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.graph import (
        triangle_count,
    )

    rng = np.random.default_rng(21)
    edges = [
        (int(a), int(b)) for a, b in rng.integers(0, 15, size=(60, 2))
    ]
    # add a celebrity hub touching everyone: the degree-ordered
    # orientation must keep its OUT-degree tiny
    edges += [(99, i) for i in range(15)]
    df = spark.createDataFrame(edges, "src int, dst int")
    r = triangle_count(df).collect()[0]
    assert r.n_triangles == _brute_triangles(edges)


def test_pagerank_weighted_edges(spark) -> None:
    """weight_col: an edge carrying 3x the weight behaves exactly like
    3 parallel unweighted edges; zero-weight edges drop out."""
    from etl_marketdata_downloader_archived_spark.operators.graph import pagerank

    weighted = [(0, 2, 3.0), (0, 1, 1.0), (1, 0, 2.0), (2, 0, 1.0), (0, 3, 0.0)]
    parallel = [(0, 2), (0, 2), (0, 2), (0, 1), (1, 0), (2, 0)]
    wdf = spark.createDataFrame(weighted, "src int, dst int, w double")
    pdf = spark.createDataFrame(parallel, "src int, dst int")
    got_w = {
        r.node: r.rank
        for r in pagerank(wdf, max_iter=40, tol=None, weight_col="w").collect()
    }
    got_p = {
        r.node: r.rank
        for r in pagerank(pdf, max_iter=40, tol=None).collect()
    }
    assert 3 not in got_w  # zero-weight edge contributes no node
    for n in got_p:
        assert got_w[n] == pytest.approx(got_p[n], abs=1e-10)


def _brute_k_core(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        und = {(a, b) for a, b in und if a not in drop and b not in drop}


def test_k_core_known_answer(spark) -> None:
    from etl_marketdata_downloader_archived_spark.operators.graph import k_core

    # K4 core-3 plus a pendant chain that must peel away entirely
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.degree for r in k_core(df, 3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # k above the max core empties the graph
    assert k_core(df, 4).count() == 0


def test_k_core_vs_brute_force(spark) -> None:
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.graph import k_core

    rng = np.random.default_rng(29)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 25, size=(120, 2))]
    df = spark.createDataFrame(edges, "src int, dst int")
    for k in (2, 3, 4):
        want = _brute_k_core(edges, k)
        got = {r.node: r.degree for r in k_core(df, k).collect()}
        assert got == want


@pytest.mark.parametrize("kind", ["closed", "open_in", "dangling"])
def test_pagerank_update_tiers_match_numpy_and_each_other(spark, kind) -> None:
    """pagerank picks one of three per-round updates (closed graph /
    dangling-free / general) from structural probes, and the
    single-partition fast path from the node count. Every tier, on
    BOTH the collapsed and the distributed (small_graph_max=0) route,
    must agree with the dense numpy reference - so a future change to
    one branch cannot drift while the others hold."""
    n = 30
    ring = [(i, (i + 1) % n) for i in range(n)]
    chords = [(i, (i * 7 + 3) % n) for i in range(n)]
    if kind == "closed":
        edges = ring + chords
    elif kind == "open_in":
        # node n-1 keeps its out-edge but nothing points at it:
        # dangling-free yet not closed (left-join tier)
        edges = [(s, d) for s, d in ring + chords if d != n - 1]
        edges += [(n - 1, 0)]
    else:
        # node n-1 receives but never sends: dangling tier
        edges = [(s, d) for s, d in ring + chords if s != n - 1]
    df = spark.createDataFrame(edges, "src int, dst int")
    want = _numpy_pagerank(edges, n)
    for gate in (2048, 0):
        got = {
            r.node: r.rank
            for r in pagerank(
                df, max_iter=50, tol=None, small_graph_max=gate
            ).collect()
        }
        assert len(got) == n
        for node, rank in got.items():
            assert rank == pytest.approx(want[node], abs=1e-9), (kind, gate)


def test_assortativity_matches_numpy(spark) -> None:
    """degree_assortativity's rational bigint-moment formula vs the
    textbook Pearson-with-sqrt computed by numpy over the edge-end
    degree list - an INDEPENDENT formulation (numpy takes the
    covariance/sqrt route; the operator proves the sqrt cancels)."""
    import numpy as np

    from etl_marketdata_downloader_archived_spark.operators.graph import (
        degree_assortativity,
    )

    rng = np.random.default_rng(13)
    # preferential-attachment-ish: biased endpoints give a nonzero r
    edges = set()
    nodes = list(range(40))
    for _ in range(300):
        u = int(rng.choice(nodes[: 10 + int(rng.integers(0, 30))]))
        v = int(rng.choice(nodes))
        if u != v:
            edges.add((min(u, v), max(u, v)))
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long"
    )
    row = degree_assortativity(df).collect()[0]

    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    want = float(np.corrcoef(np.array(xs), np.array(ys))[0, 1])
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(edges)
    assert row.assortativity == pytest.approx(want, abs=1e-12)


def test_assortativity_degenerate_cases(spark) -> None:
    from etl_marketdata_downloader_archived_spark.operators.graph import (
        degree_assortativity,
    )

    # a perfect cycle is degree-regular: zero variance -> NULL, not NaN
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
    )
    row = degree_assortativity(cyc).collect()[0]
    assert row.assortativity is None and row.n_edges == 5
    # parallel + self edges collapse/drop before the statistic
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)], "src long, dst long"
    )
    row = degree_assortativity(messy).collect()[0]
    assert row.n_edges == 2 and row.n_nodes == 3


def test_bfs_hops_layers_and_cap(spark) -> None:
    """Chain 1-2-3-4-5 + isolated 9: multi-source layering, the
    max_hops cap, and directedness on an asymmetric list - each case
    on BOTH tiers (driver fast path, and the frontier-Pregel
    distributed path forced with small_graph_max=0)."""
    from etl_marketdata_downloader_archived_spark.operators.graph import bfs_hops

    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    ud = chain + [(b, a) for a, b in chain]
    edges = spark.createDataFrame(ud, ["src", "dst"])
    directed = spark.createDataFrame(chain, ["src", "dst"])
    src = spark.createDataFrame([(1,)], ["node"])
    src2 = spark.createDataFrame([(1,), (5,)], ["node"])
    src3 = spark.createDataFrame([(3,)], ["node"])
    empty = spark.createDataFrame([], "node long")

    for sgm in (100_000, 0):  # fast path, then distributed
        got = {
            r.node: r.hops
            for r in bfs_hops(edges, src, small_graph_max=sgm).collect()
        }
        assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}, sgm

        # cap: nodes past max_hops are absent, not mislabeled
        got = {
            r.node: r.hops
            for r in bfs_hops(
                edges, src, max_hops=2, small_graph_max=sgm
            ).collect()
        }
        assert got == {1: 0, 2: 1, 3: 2}, sgm

        # multi-source: nearest source wins
        got = {
            r.node: r.hops
            for r in bfs_hops(edges, src2, small_graph_max=sgm).collect()
        }
        assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}, sgm

        # directed: no back-edges -> nothing upstream of the source
        got = {
            r.node: r.hops
            for r in bfs_hops(directed, src3, small_graph_max=sgm).collect()
        }
        assert got == {3: 0, 4: 1, 5: 2}, sgm

        # empty sources -> empty result
        assert bfs_hops(edges, empty, small_graph_max=sgm).count() == 0, sgm

    # the unroll boundary: hops_per_round == the chain length (the
    # last block's deepest layer comes up empty), == 1, and a cap
    # falling INSIDE an unrolled block all agree with the fast path
    for hpr, cap in ((4, 20), (1, 20), (2, 3)):
        got = {
            r.node: r.hops
            for r in bfs_hops(
                edges, src, max_hops=cap, small_graph_max=0,
                hops_per_round=hpr,
            ).collect()
        }
        want = {n: h for n, h in {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}.items()
                if h <= cap}
        assert got == want, (hpr, cap)


def test_bfs_hops_rejects_uncapped_unroll(spark) -> None:
    """hops_per_round > 4 is refused: each lazy layer doubles the
    block's plan tree, so the cap protects Catalyst, loudly."""
    import pytest as _pytest

    from etl_marketdata_downloader_archived_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    src = spark.createDataFrame([(1,)], ["node"])
    with _pytest.raises(ValueError, match="1..4"):
        bfs_hops(edges, src, hops_per_round=16)
