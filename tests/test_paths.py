"""Shortest-path family parity: multi-source BFS and weighted SSSP vs
networkx, redirect-chain resolution vs a pure-python chain walker."""

from __future__ import annotations

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from jgtextrank_spark.algos.paths import (
    bfs_distances,
    bfs_distances_result,
    resolve_redirects,
    sssp,
)


def _edges_df(spark, edges, weights=None):
    rows = [
        (str(s), str(d), float(weights[i]) if weights else 1.0)
        for i, (s, d) in enumerate(edges)
    ]
    return spark.createDataFrame(
        rows, "src string, dst string, weight double"
    )


def _rand_digraph(seed, n, m):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((u, v))
    return sorted(edges)


@pytest.mark.parametrize("seed,n,m", [(3, 40, 90), (7, 60, 100)])
def test_bfs_directed_vs_nx(spark, seed, n, m):
    edges = _rand_digraph(seed, n, m)
    G = nx.DiGraph()
    G.add_edges_from((str(u), str(v)) for u, v in edges)
    seeds = [str(s) for s in (0, 1) if str(s) in G]
    exp = {}
    for s in seeds:
        for v, d in nx.single_source_shortest_path_length(G, s).items():
            if v not in exp or d < exp[v]:
                exp[v] = d
    got = {
        r["vertex"]: r["dist"]
        for r in bfs_distances(
            _edges_df(spark, edges), seeds, checkpoint_every=0
        ).collect()
    }
    for v in G.nodes:
        assert got[v] == (exp[v] if v in exp else None), v


def test_bfs_undirected_and_isolated_seed(spark):
    edges = [(0, 1), (1, 2), (3, 4)]
    df = _edges_df(spark, edges)
    # seed "9" is not in the graph at all; undirected reaches 2 from 0
    got = {
        r["vertex"]: r["dist"]
        for r in bfs_distances(
            df, ["0", "9"], directed=False, checkpoint_every=0
        ).collect()
    }
    assert got == {"0": 0, "1": 1, "2": 2, "3": None, "4": None, "9": 0}


def test_bfs_frontier_round_count(spark):
    # path graph 0->1->...->9: BFS needs exactly 10 supersteps
    # (9 expanding + 1 empty-frontier round to prove the fixpoint)
    edges = [(i, i + 1) for i in range(9)]
    res = bfs_distances_result(
        _edges_df(spark, edges), ["0"], checkpoint_every=0
    )
    assert res.converged
    assert res.iterations == 10
    got = {r["vertex"]: r["dist"] for r in res.state.collect()}
    assert got == {str(i): i for i in range(10)}


def test_bfs_resume(spark, tmp_path):
    edges = [(i, i + 1) for i in range(12)]
    df = _edges_df(spark, edges)
    ck = str(tmp_path / "bfs_ck")
    partial = bfs_distances_result(
        df, ["0"], max_iter=4, checkpoint_every=2, checkpoint_dir=ck
    )
    assert not partial.converged
    resumed = bfs_distances_result(
        df, ["0"], checkpoint_every=2, checkpoint_dir=ck
    )
    assert resumed.converged
    assert any(m.get("event") == "resume" for m in resumed.metrics)
    got = {r["vertex"]: r["dist"] for r in resumed.state.collect()}
    assert got == {str(i): i for i in range(13)}


@pytest.mark.parametrize("seed,n,m", [(5, 40, 120), (11, 50, 90)])
def test_sssp_vs_nx_dijkstra(spark, seed, n, m):
    rng = random.Random(seed * 100 + 1)
    edges = _rand_digraph(seed, n, m)
    weights = [round(rng.uniform(0.5, 5.0), 3) for _ in edges]
    G = nx.DiGraph()
    for (u, v), w in zip(edges, weights):
        G.add_edge(str(u), str(v), weight=w)
    seeds = [s for s in ("0", "1") if s in G]
    exp = nx.multi_source_dijkstra_path_length(G, seeds)
    got = {
        r["vertex"]: r["dist"]
        for r in sssp(
            _edges_df(spark, edges, weights), seeds, checkpoint_every=0
        ).collect()
    }
    for v in G.nodes:
        if v in exp:
            assert got[v] == pytest.approx(exp[v], abs=1e-9), v
        else:
            assert got[v] is None, v


def test_sssp_parallel_edges_take_min(spark):
    # duplicate (0,1) edges with different weights: min must win
    df = spark.createDataFrame(
        [("0", "1", 5.0), ("0", "1", 2.0), ("1", "2", 1.0)],
        "src string, dst string, weight double",
    )
    got = {
        r["vertex"]: r["dist"]
        for r in sssp(df, ["0"], checkpoint_every=0).collect()
    }
    assert got == {"0": 0.0, "1": 2.0, "2": 3.0}


def test_sssp_negative_weight_raises(spark):
    df = spark.createDataFrame(
        [("0", "1", -1.0)], "src string, dst string, weight double"
    )
    with pytest.raises(ValueError, match="non-negative"):
        sssp(df, ["0"])


def _py_resolve(pairs, max_hops):
    """Pure-python oracle: min-dst functional graph, walk to terminal."""
    nxt = {}
    for s, d in pairs:
        if s != d and (s not in nxt or d < nxt[s]):
            nxt[s] = d
    out = {}
    for s in nxt:
        cur, hops = s, 0
        while cur in nxt and hops <= max_hops:
            cur = nxt[cur]
            hops += 1
        if cur not in nxt and hops <= max_hops:
            out[s] = (cur, hops, True)
        else:
            out[s] = (None, None, False)
    return out


@pytest.mark.parametrize("max_hops", [4, 16])
def test_resolve_redirects_chains_cycles_cutoff(spark, max_hops):
    pairs = (
        # chain of length 6: a0->a1->...->a6 (resolved iff max_hops>=6)
        [(f"a{i}", f"a{i+1}") for i in range(6)]
        # 3-cycle
        + [("c0", "c1"), ("c1", "c2"), ("c2", "c0")]
        # self-loop only: dropped entirely (no output row)
        + [("s", "s")]
        # multi-target src: min dst wins
        + [("m", "z2"), ("m", "z1")]
    )
    df = spark.createDataFrame(pairs, "src string, dst string")
    exp = _py_resolve(pairs, max_hops)
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    got = {r["src"]: (r["final"], r["hops"], r["resolved"]) for r in rows}
    assert got == exp


def test_resolve_redirects_random_functional(spark):
    rng = random.Random(42)
    pairs = []
    for i in range(300):
        j = rng.randrange(350)
        if i != j:
            pairs.append((f"u{i:03d}", f"u{j:03d}"))
    df = spark.createDataFrame(pairs, "src string, dst string")
    exp = _py_resolve(pairs, 16)
    got = {
        r["src"]: (r["final"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=16).collect()
    }
    assert got == exp


# ------------------------------------------------------------------ landmarks
def test_landmark_distances_vs_nx(spark):
    from jgtextrank_spark.algos.paths import (
        landmark_distances,
        select_landmarks,
    )

    edges = _rand_digraph(seed=5, n=40, m=90)
    df = _edges_df(spark, edges)
    lms = select_landmarks(df, num_landmarks=4)
    G = nx.Graph()
    G.add_edges_from((str(u), str(v)) for u, v in edges if u != v)
    # deterministic pick: top degree, ties by id asc
    want_lms = sorted(G.degree, key=lambda t: (-t[1], t[0]))[:4]
    assert lms == [v for v, _ in want_lms]

    got = {
        (r["landmark"], r["vertex"]): r["dist"]
        for r in landmark_distances(df, landmarks=lms).collect()
    }
    want = {
        (l, v): d
        for l in lms
        for v, d in nx.single_source_shortest_path_length(G, l).items()
    }
    assert got == want


def test_landmark_directed_and_resume(spark, tmp_path):
    from jgtextrank_spark.algos.paths import (
        landmark_distances,
        landmark_distances_result,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "a")]
    df = _edges_df(spark, edges)
    got = {
        (r["landmark"], r["vertex"]): r["dist"]
        for r in landmark_distances(
            df, landmarks=["a"], directed=True
        ).collect()
    }
    assert got == {("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 2,
                   ("a", "d"): 3, ("a", "e"): 4}

    # resume: interrupt after 2 supersteps, resume equals uninterrupted
    ck = str(tmp_path / "lmck")
    partial = landmark_distances_result(
        df, landmarks=["a"], directed=True, max_iter=2,
        checkpoint_every=2, checkpoint_dir=ck,
    )
    assert not partial.converged
    resumed = landmark_distances_result(
        df, landmarks=["a"], directed=True,
        checkpoint_every=2, checkpoint_dir=ck, resume=True,
    )
    got2 = {
        (r["landmark"], r["vertex"]): r["dist"]
        for r in resumed.state.collect()
    }
    assert got2 == got


def test_estimate_distance_triangle_bound(spark):
    from jgtextrank_spark.algos.paths import (
        estimate_distance,
        landmark_distances,
        select_landmarks,
    )

    edges = _rand_digraph(seed=9, n=30, m=60)
    df = _edges_df(spark, edges)
    lms = select_landmarks(df, num_landmarks=3)
    ld = landmark_distances(df, landmarks=lms)
    G = nx.Graph()
    G.add_edges_from((str(u), str(v)) for u, v in edges if u != v)
    verts = sorted(G.nodes)
    pairs = [(verts[i], verts[-1 - i]) for i in range(8)]
    pdf = spark.createDataFrame(pairs, "a string, b string")
    got = {
        (r["a"], r["b"]): r["est_dist"]
        for r in estimate_distance(ld, pdf).collect()
    }
    sp = {l: nx.single_source_shortest_path_length(G, l) for l in lms}
    for a, b in pairs:
        want = min(
            (sp[l][a] + sp[l][b] for l in lms if a in sp[l] and b in sp[l]),
            default=None,
        )
        assert got[(a, b)] == want
        if want is not None and nx.has_path(G, a, b):
            # upper bound on the true distance
            assert want >= nx.shortest_path_length(G, a, b)
