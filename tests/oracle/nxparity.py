"""Numpy mirrors of the networkx solver semantics the reference relies on.

scipy is not installed in this sandbox, so ``nx.pagerank`` / ``nx.hits``
(scipy-backed in networkx >= 3) cannot run. These functions reproduce the
documented power-iteration recurrences of
``networkx/algorithms/link_analysis/pagerank_alg.py::_pagerank_scipy`` and
``hits_alg.py::_hits_python`` (public BSD-licensed semantics) with dense
numpy, for use as test oracles and as drop-in monkeypatches so the real
reference package (`/root/reference`) can run end-to-end as the
differential oracle.
"""

from __future__ import annotations

import numpy as np


def pagerank_nx(
    G,
    alpha: float = 0.85,
    personalization=None,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    nstart=None,
    weight: str = "weight",
    dangling=None,
):
    """Signature-compatible replacement for nx.pagerank (power iteration,
    L1 stop err < N*tol). ``G`` is a networkx graph."""
    import networkx as nx

    N = len(G)
    if N == 0:
        return {}
    nodelist = list(G)
    idx = {n: i for i, n in enumerate(nodelist)}
    A = np.zeros((N, N), dtype=float)
    directed = G.is_directed()
    for u, v, data in G.edges(data=True):
        w = data.get(weight, 1.0) if weight is not None else 1.0
        A[idx[u], idx[v]] += w
        if not directed and u != v:
            A[idx[v], idx[u]] += w
    S = A.sum(axis=1)
    nonzero = S != 0
    Anorm = A.copy()
    Anorm[nonzero] = A[nonzero] / S[nonzero, None]

    x = np.repeat(1.0 / N, N)
    if personalization is None:
        p = np.repeat(1.0 / N, N)
    else:
        p = np.array([personalization.get(n, 0) for n in nodelist], float)
        p /= p.sum()
    dangling_weights = p
    is_dangling = np.where(S == 0)[0]

    for _ in range(max_iter):
        xlast = x
        x = (
            alpha * (x @ Anorm + sum(x[is_dangling]) * dangling_weights)
            + (1 - alpha) * p
        )
        err = np.absolute(x - xlast).sum()
        if err < N * tol:
            return dict(zip(nodelist, map(float, x)))
    raise nx.PowerIterationFailedConvergence(max_iter)


def pagerank_edges(
    edges: list[tuple],
    nodes: list | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    directed: bool = True,
):
    """PageRank oracle on a plain (src, dst, weight) edge list."""
    import networkx as nx

    G = nx.DiGraph() if directed else nx.Graph()
    if nodes:
        G.add_nodes_from(nodes)
    for e in edges:
        src, dst = e[0], e[1]
        w = e[2] if len(e) > 2 else 1.0
        if G.has_edge(src, dst):
            G[src][dst]["weight"] += 0.0  # Graph collapses multi-edges
        G.add_edge(src, dst, weight=w)
    return pagerank_nx(G, alpha=alpha, max_iter=max_iter, tol=tol)


def hits_python(G, max_iter=100, tol=1.0e-8, nstart=None, normalized=True):
    """nx's pure-python HITS (power iteration, per-iteration max
    normalization, L1 stop on hubs, final sum normalization)."""
    from networkx.algorithms.link_analysis.hits_alg import _hits_python

    return _hits_python(
        G, max_iter=max_iter, tol=tol, nstart=nstart, normalized=normalized
    )


def install_solver_patches():
    """Make the reference package runnable without scipy by routing
    nx.pagerank / nx.hits to the mirrors above."""
    import networkx as nx

    nx.pagerank = pagerank_nx
    nx.hits = hits_python
