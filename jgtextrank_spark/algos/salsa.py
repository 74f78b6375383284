"""SALSA link analysis (Lempel & Moran 2001, "The Stochastic Approach
for Link-Structure Analysis").

HITS's authority chain rewards tightly-knit spam farms; SALSA replaces
the mutual-reinforcement sums with two random walks on the bipartite
hub/authority support graph (authority step: back along a uniform
in-link, forward along a uniform out-link). Its payoff for a DataFrame
engine is the paper's Theorem/Section 3 closed form: the walks are
doubly-directed random walks on an undirected bipartite graph, so the
per-component stationary distribution is proportional to the vertex
degree — NO power iteration is needed. With the paper's component
entitlement (each component weighted by its share of the side's
vertices):

    authority(v) = (|A_C| / |A|) * in_deg(v)  / sum_{u in C} in_deg(u)
    hub(h)       = (|H_C| / |H|) * out_deg(h) / sum_{g in C} out_deg(g)

where C is v's connected component of the bipartite support graph, A/H
the authority (in-degree > 0) / hub (out-degree > 0) sides, and degrees
count DISTINCT links (SALSA is defined on the unweighted link graph).

So the whole operator is: one connected-components run on the bipartite
graph (hash-min + pointer jumping — the engine's existing CC) + two
degree aggregations + per-component sums. Deterministic, closed-form,
oracle-replayable — an iterative implementation would be strictly worse
on Spark. Each side's scores sum to 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components

__all__ = ["salsa"]


def salsa(edges: DataFrame) -> DataFrame:
    """DataFrame ``(vertex, hub, authority)`` over all vertices of the
    directed link graph ``edges (src, dst, ...)`` (weights ignored —
    SALSA walks the unweighted support graph; parallel links collapse).
    Vertices with no out-links have hub 0; no in-links, authority 0."""
    links = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    # bipartite support graph: hub-copy H|src — authority-copy A|dst
    bip = links.select(
        F.concat(F.lit("H|"), F.col("src")).alias("src"),
        F.concat(F.lit("A|"), F.col("dst")).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    comp = connected_components(bip).persist()
    side = F.substring("vertex", 1, 1)
    name = F.substr(F.col("vertex"), F.lit(3))

    def _scores(degrees: DataFrame, prefix: str, col: str) -> DataFrame:
        """degrees: (vertex, deg) on the original ids for one side."""
        labelled = degrees.join(
            comp.filter(side == prefix).select(
                name.alias("vertex"), "component"
            ),
            "vertex",
        )
        n_side = labelled.count()
        csum = labelled.groupBy("component").agg(
            F.sum("deg").alias("cdeg"),
            F.count(F.lit(1)).alias("cn"),
        )
        return labelled.join(csum, "component").select(
            "vertex",
            (
                (F.col("cn").cast("double") / F.lit(float(n_side)))
                * F.col("deg").cast("double")
                / F.col("cdeg")
            ).alias(col),
        )

    outd = links.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ind = links.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    hubs = _scores(outd.withColumnRenamed("src", "vertex"), "H", "hub")
    auths = _scores(ind.withColumnRenamed("dst", "vertex"), "A", "authority")

    verts = (
        links.select(F.col("src").alias("vertex"))
        .unionByName(links.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    out = (
        verts.join(hubs, "vertex", "left")
        .join(auths, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
    links.unpersist()
    return out
