"""Driver-side networkx fallback for all-pairs / linear-algebra centralities.

The reference dispatches betweenness, closeness, load, current-flow and
communicability centralities straight to networkx
(/root/reference/jgtextrank/core.py:804-838). These are O(V*E) or worse
all-pairs algorithms with no web-scale distributed formulation — the
reference itself only ever runs them on single-document graphs. We mirror
that honestly: collect the (small) graph to the driver and run networkx,
refusing above a vertex budget. The per-component wrapper reproduces
``_weight_nodes_with_centrality_metrics`` (core.py:614-642): score each
connected component separately, skip ZeroDivisionError components, drop
inf-valued nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["nx_fallback_scores", "SMALL_GRAPH_LIMIT"]

SMALL_GRAPH_LIMIT = 200_000


def _to_nx(edges: DataFrame, vertices: DataFrame | None, directed: bool):
    import networkx as nx

    G = nx.DiGraph() if directed else nx.Graph()
    rows = edges.select("src", "dst", "weight").collect()
    if len(rows) > SMALL_GRAPH_LIMIT:
        raise ValueError(
            f"small-graph fallback refused: {len(rows)} edges > "
            f"{SMALL_GRAPH_LIMIT}. These centralities have no scalable "
            "distributed formulation; run them per-document."
        )
    for r in rows:
        G.add_edge(r["src"], r["dst"], weight=r["weight"])
    if vertices is not None:
        G.add_nodes_from(v["id"] for v in vertices.collect())
    return G


def _flatten_edge_scores(edge_scores: dict) -> dict:
    """Per-node max over incident edge scores (reference
    ``_flatten_nodes_betweenness_weights``, core.py:875-899)."""
    out: dict = {}
    for (u, v), val in edge_scores.items():
        if u not in out or out[u] < val:
            out[u] = val
        if v not in out or out[v] < val:
            out[v] = val
    return out


def _per_component(scoring, G) -> dict:
    import networkx as nx

    if nx.is_connected(G):
        weighted = scoring(G)
    else:
        weighted = {}
        for c in nx.connected_components(G):
            try:
                weighted.update(scoring(G.subgraph(c)))
            except ZeroDivisionError:
                continue
    return {k: v for k, v in weighted.items() if v != float("inf")}


def nx_fallback_scores(
    edges: DataFrame,
    method: str,
    vertices: DataFrame | None = None,
    directed: bool = False,
) -> DataFrame:
    """Supported methods: betweenness_centrality,
    edge_betweenness_centrality, closeness_centrality, load_centrality,
    current_flow_closeness, current_flow_betweenness,
    edge_current_flow_betweenness, communicability_betweenness.
    Returns (vertex, score)."""
    import networkx as nx

    spark = edges.sparkSession
    G = _to_nx(edges, vertices, directed)

    if method == "betweenness_centrality":
        scores = nx.betweenness_centrality(G)
    elif method == "edge_betweenness_centrality":
        scores = _flatten_edge_scores(nx.edge_betweenness_centrality(G))
    elif method == "closeness_centrality":
        scores = nx.closeness_centrality(G)
    elif method == "load_centrality":
        scores = nx.load_centrality(G)
    elif method == "current_flow_closeness":
        scores = _per_component(nx.current_flow_closeness_centrality, G)
    elif method == "current_flow_betweenness":
        scores = _per_component(nx.current_flow_betweenness_centrality, G)
    elif method == "edge_current_flow_betweenness":
        scores = _flatten_edge_scores(
            _per_component(nx.edge_current_flow_betweenness_centrality, G)
        )
    elif method == "communicability_betweenness":
        scores = _per_component(nx.communicability_betweenness_centrality, G)
    else:
        raise ValueError(f"unknown small-graph method: {method}")

    return spark.createDataFrame(
        [(k, float(v)) for k, v in scores.items()], "vertex string, score double"
    )
