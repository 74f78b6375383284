"""Corpus-level graph statistics: degree distribution, degree
assortativity, partition modularity.

The descriptive-statistics layer every link-graph report starts with
(degree histogram and assortativity are the first two plots in any
web-graph paper; modularity scores the communities LPA produces). The
reference computes none of these; they complete the graph suite the way
the HyperBall module completes the distance suite. Everything here is
one or two aggregation exchanges over the degree-annotated edge list —
no iteration, no windows over global orderings, partial-agg friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "degree_distribution",
    "degree_assortativity",
    "modularity",
]


def _und(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edge list (a < b, self-loops out)."""
    return (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )


def _mirror(und: DataFrame) -> DataFrame:
    return und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """``(degree, n_vertices)`` histogram of the undirected simple graph
    — two partial aggregations (vertex degree, then histogram), the
    canonical first look at a crawl's hub structure."""
    adj = _mirror(_und(edges))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )


def degree_assortativity(edges: DataFrame) -> float:
    """Pearson degree-degree correlation over edge endpoints
    (nx.degree_assortativity_coefficient on the simple undirected graph):
    r = cov(deg_u, deg_v) / (sd(deg_u) sd(deg_v)) with the expectation
    over the DIRECTED mirror of the edge list (each undirected edge
    contributes both orientations — the standard symmetric estimator).
    Positive: hubs link hubs (social); negative: hubs link leaves (web).
    One action; returns a python float (a corpus-level scalar)."""
    und = _und(edges)
    adj = _mirror(und)
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    du = deg.select(F.col("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    m = (
        adj.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("du").cast("double")).alias("sx"),
            F.sum(F.col("dv").cast("double")).alias("sy"),
            F.sum((F.col("du") * F.col("dv")).cast("double")).alias("sxy"),
            F.sum((F.col("du") * F.col("du")).cast("double")).alias("sxx"),
            F.sum((F.col("dv") * F.col("dv")).cast("double")).alias("syy"),
        )
        .collect()[0]
    )
    n = float(m["n"])
    cov = m["sxy"] / n - (m["sx"] / n) * (m["sy"] / n)
    vx = m["sxx"] / n - (m["sx"] / n) ** 2
    vy = m["syy"] / n - (m["sy"] / n) ** 2
    denom = (vx * vy) ** 0.5
    return float(cov / denom) if denom > 0 else float("nan")


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = "weight",
) -> float:
    """Newman modularity Q of a vertex partition over the undirected
    graph (nx.community.modularity semantics: each undirected edge once;
    self-loops excluded to match the engine's simple-graph convention):

        Q = sum_c [ in_c / m  -  (deg_c / (2 m))^2 ]

    ``labels`` has columns ``(vertex, label)`` — e.g.
    ``label_propagation`` output. Weighted when ``weight_col`` names an
    edge column (dedup keeps the max weight per undirected pair);
    ``None`` counts edges. Plan: one broadcast-sized join of labels onto
    the edge list + two scalar aggregations."""
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
    )
    la = labels.select(F.col("vertex").alias("a"), F.col("label").alias("ca"))
    lb = labels.select(F.col("vertex").alias("b"), F.col("label").alias("cb"))
    lab = und.join(la, "a").join(lb, "b").persist()
    row = lab.agg(F.sum("w").alias("m")).collect()[0]
    m = float(row["m"] or 0.0)
    if m <= 0:
        lab.unpersist()
        return float("nan")
    # in_c: intra-community weight; deg_c: sum of member degrees
    intra = (
        lab.filter(F.col("ca") == F.col("cb"))
        .agg(F.sum("w").alias("s"))
        .collect()[0]["s"]
        or 0.0
    )
    degs = (
        lab.select(F.col("ca").alias("c"), F.col("w"))
        .unionByName(lab.select(F.col("cb").alias("c"), F.col("w")))
        .groupBy("c")
        .agg(F.sum("w").alias("dc"))
        .agg(F.sum(F.col("dc") * F.col("dc")).alias("s2"))
        .collect()[0]["s2"]
        or 0.0
    )
    lab.unpersist()
    return float(intra / m - degs / (4.0 * m * m))
