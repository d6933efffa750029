"""Hand-computed goldens for the round-6 operators: pagerank (vs a pure-
Python power iteration) and robust median/MAD outliers."""

from __future__ import annotations

import pytest

# heavyweight Spark suite: deselected by the default `addopts` fast set so
# the driver's verify completes inside its window (r13 verdict #7); run via
# `pytest -m slow` or the full suite via `pytest --override-ini addopts= tests/`
pytestmark = pytest.mark.slow


def _py_pagerank(edge_list, iterations=5, d=0.85):
    from collections import defaultdict

    out = defaultdict(list)
    for s, t in edge_list:
        out[s].append(t)
    nodes = sorted(out)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        nxt = {}
        for v in nodes:
            s = sum(rank[u] / len(out[u]) for u in nodes if v in out[u])
            nxt[v] = (1.0 - d) / n + d * s
        rank = nxt
    return rank


def test_pagerank_matches_python_reference(spark):
    from cosmo_spark.operators.pagerank import pagerank

    # undirected triangle + a pendant: 1-2, 2-3, 1-3, 3-4
    und = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edge_list = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edge_list, "src INT, dst INT")
    got = {
        r.node: r.pagerank
        for r in pagerank(df, iterations=5, damping=0.85).collect()
    }
    ref = _py_pagerank(edge_list)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], rel=1e-12), v
    # probability mass is conserved by construction (no dangling nodes)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_keeps_zero_indegree_nodes(spark):
    """ADVICE r6 (medium): a DIRECTED graph meeting the documented
    contract (outdeg >= 1 everywhere) can still have zero-IN-degree
    nodes — a→b, b→a, c→a leaves c with no contrib row, and an inner
    sums⋈deg state join erased it (and its outgoing mass) after round
    1.  The rebuilt-from-deg left join must keep c at teleport mass and
    keep its contributions flowing into a."""
    from cosmo_spark.operators.pagerank import pagerank

    edge_list = [(1, 2), (2, 1), (3, 1)]
    df = spark.createDataFrame(edge_list, "src INT, dst INT")
    for bcast in (False, True):
        got = {
            r.node: r.pagerank
            for r in pagerank(df, iterations=5, damping=0.85,
                              broadcast_state=bcast).collect()
        }
        ref = _py_pagerank(edge_list)
        assert set(got) == {1, 2, 3}, f"broadcast_state={bcast}"
        for v in ref:
            assert got[v] == pytest.approx(ref[v], rel=1e-12), (bcast, v)
        # node 3: nothing points at it -> pure teleport mass
        assert got[3] == pytest.approx((1.0 - 0.85) / 3, rel=1e-12)
        # no dangling nodes -> mass conserved, which fails if 3's
        # outgoing contribution into 1 is dropped
        assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_broadcast_state_same_result(spark):
    from cosmo_spark.operators.pagerank import pagerank

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edge_list = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edge_list, "src INT, dst INT")
    a = {r.node: r.pagerank for r in pagerank(df, broadcast_state=False).collect()}
    b = {r.node: r.pagerank for r in pagerank(df, broadcast_state=True).collect()}
    for v in a:
        assert a[v] == pytest.approx(b[v], rel=1e-12)


def test_grouped_median_odd_even_and_ties(spark):
    from cosmo_spark.operators.robust import grouped_median

    rows = [
        # odd group: median = 2.0
        ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 9.0),
        # even group: median = (2+4)/2 = 3.0
        ("b", 1, 1.0), ("b", 2, 2.0), ("b", 3, 4.0), ("b", 4, 8.0),
        # all-ties group: median = 5.0
        ("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0), ("c", 4, 5.0),
    ]
    df = spark.createDataFrame(rows, "g STRING, id INT, v DOUBLE")
    got = {r.g: r.median
           for r in grouped_median(df, "g", "v", "id").collect()}
    assert got == {"a": 2.0, "b": 3.0, "c": 5.0}


def test_robust_outliers_golden(spark):
    from cosmo_spark.operators.robust import robust_outliers

    # group: values 1..9 plus a gross outlier 100.
    # n=10, sorted: 1..9,100 -> median=(5+6)/2=5.5; |dev|: .5,...,4.5,94.5
    # sorted devs: .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5 -> MAD=2.5
    # modified z(100) = .6745*94.5/2.5 = 25.5 > 3.5; z(9)=.6745*3.5/2.5=0.94
    rows = [("g", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    df = spark.createDataFrame(rows, "g STRING, id INT, v DOUBLE")
    out = robust_outliers(df, "g", "v", "id", z=3.5).collect()
    assert [(r.id, r.v) for r in out] == [(9, 100.0)]


def test_robust_outliers_zero_mad_flags_any_deviation(spark):
    from cosmo_spark.operators.robust import robust_outliers

    # 5 identical values and one different: MAD = 0, so ANY deviation is
    # an outlier under the multiplication-only test (0.6745*|x-med| > 0)
    rows = [("g", i, 5.0) for i in range(5)] + [("g", 9, 5.1)]
    df = spark.createDataFrame(rows, "g STRING, id INT, v DOUBLE")
    out = robust_outliers(df, "g", "v", "id", z=3.5).collect()
    assert [(r.id, r.v) for r in out] == [(9, 5.1)]


# ---------------------------------------------------------------- triangles


def _py_triangles(edge_list):
    """Brute-force per-node triangle counts of an undirected simple graph."""
    from itertools import combinations

    adj = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (len(adj[n]), tri[n]) for n in adj}


def _run_triangles(spark, edges):
    from cosmo_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "u long, v long")
    return {
        r["node"]: (r["degree"], r["triangles"])
        for r in triangle_counts(df).collect()
    }


def test_triangles_k4(spark):
    # K4: every node has degree 3 and sits in C(3,2)=3 triangles
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert _run_triangles(spark, edges) == {n: (3, 3) for n in (1, 2, 3, 4)}


def test_triangles_path_has_none(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _run_triangles(spark, edges)
    assert got == {1: (1, 0), 2: (2, 0), 3: (2, 0), 4: (1, 0)}


def test_triangles_match_bruteforce_on_hashed_graph(spark):
    # deterministic pseudo-random graph: edge (u,v) present iff a hash bit
    # fires; includes a deliberate hub (node 0 connected to everyone) so
    # the degree orientation's skew path is exercised
    n = 24
    edges = [(0, v) for v in range(1, n)]
    for u in range(1, n):
        for v in range(u + 1, n):
            if (u * 1000003 + v) % 7 < 2:
                edges.append((u, v))
    assert _run_triangles(spark, edges) == _py_triangles(edges)


def test_triangles_empty(spark):
    from cosmo_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([], "u long, v long")
    assert triangle_counts(df).count() == 0


def _py_kcore(edge_list, k):
    """Full fixpoint k-core: (node -> degree) inside the core."""
    adj = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        drop = [n for n, nb in adj.items() if len(nb) < k]
        changed = bool(drop)
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_converges_to_fixpoint(spark):
    from cosmo_spark.operators.graph import kcore_peel

    # K5 (a 4-core) plus a tail of pendants hanging off it: peeling the
    # tail takes multiple rounds (5-6, 6-7, 7-8 unravel one per round)
    edges = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    edges += [(5, 6), (6, 7), (7, 8)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["node"]: r["degree"] for r in kcore_peel(df, k=4, rounds=4).collect()
    }
    assert got == _py_kcore(edges, 4)
    assert min(got.values()) >= 4  # converged


def test_kcore_zero_rounds_is_input_degrees(spark):
    from cosmo_spark.operators.graph import kcore_peel

    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["degree"] for r in kcore_peel(df, k=99, rounds=0).collect()}
    assert got == {1: 1, 2: 2, 3: 1}
