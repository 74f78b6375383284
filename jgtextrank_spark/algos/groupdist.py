"""Exact distance centralities over MANY independent small graphs.

``closeness_per_group`` computes per-vertex closeness and harmonic
centrality with EXACT all-pairs BFS inside each group (per-document
token graphs, per-host page graphs) via Arrow-batched ``applyInPandas``
— the same group-local pattern as ``scc_per_group`` (algos/scc.py):
one shuffle co-partitions each group's edges, then a linear-time local
solve with zero global synchronization.

This complements the two existing distance surfaces:
* ``algos/smallgraph.py`` — exact nx solvers for ONE capped graph on
  the driver (SURVEY non-goal escape hatch);
* ``algos/neighborhood.py`` — HyperBall APPROXIMATE distance profiles
  for one huge graph.
Per-group exactness at corpus scale is the missing quadrant: millions
of small graphs, each solved exactly, fully distributed.

Definitions (undirected, unweighted, matching networkx):
* closeness(v) = (r-1)/S * (r-1)/(n-1)   (Wasserman-Faust improved
  formula as used by nx ``closeness_centrality(wf_improved=True)``),
  where r = |v's connected component|, S = sum of distances from v to
  its component, n = group vertex count; 0.0 for isolated-in-component
  vertices (r=1).
* harmonic(v) = sum over reachable u != v of 1/d(v, u) (nx
  ``harmonic_centrality``).

Skew note: the unit of parallelism is the group and the local solve is
O(V*E) per group — route graphs above a size threshold to HyperBall
instead (same guidance as the per-group SCC docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["closeness_per_group"]


def _bfs_all(nodes, nbrs):
    """Yield (v, dists) for every node: dict of BFS distances from v."""
    from collections import deque

    for v in nodes:
        dist = {v: 0}
        dq = deque([v])
        while dq:
            x = dq.popleft()
            for y in nbrs.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        yield v, dist


def closeness_per_group(
    edges: DataFrame,
    group_col: str = "doc_id",
    src_col: str = "src",
    dst_col: str = "dst",
    round_to: int = 6,
) -> DataFrame:
    """``(group, vertex, closeness, harmonic)`` — exact, per independent
    group, undirected (edges are symmetrized; self-loops dropped)."""
    import pandas as pd

    gtype = dict(edges.dtypes)[group_col]
    schema = (
        f"{group_col} {gtype}, vertex string, "
        "closeness double, harmonic double"
    )
    sel = edges.select(
        F.col(group_col),
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group_col].iloc[0]
        nbrs: dict[str, set] = {}
        for a, b in zip(pdf["src"], pdf["dst"]):
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        nodes = sorted(nbrs)
        n = len(nodes)
        rows = []
        for v, dist in _bfs_all(nodes, nbrs):
            r = len(dist)  # component size incl. v
            s = sum(dist.values())
            if r > 1 and n > 1:
                clo = ((r - 1) / s) * ((r - 1) / (n - 1))
            else:
                clo = 0.0
            har = sum(1.0 / d_ for d_ in dist.values() if d_ > 0)
            rows.append((g, v, round(clo, round_to), round(har, round_to)))
        return pd.DataFrame(
            rows, columns=[group_col, "vertex", "closeness", "harmonic"]
        )

    return sel.groupBy(group_col).applyInPandas(solve, schema=schema)
