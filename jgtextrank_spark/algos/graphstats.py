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
    "reciprocity",
    "transitivity",
    "rich_club",
    "conductance",
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


def reciprocity(edges: DataFrame) -> float:
    """Fraction of directed simple edges whose reverse edge also exists
    (nx.overall_reciprocity). The canonical link-graph symmetry measure:
    blogrolls/nav cross-links are reciprocal, editorial citations are
    not. One self-equi-join of the distinct directed edge list on the
    reversed key + one scalar aggregation."""
    de = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    rev = de.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    row = (
        de.join(rev.withColumn("has_rev", F.lit(1)), ["src", "dst"], "left")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("has_rev", F.lit(0))).alias("r"),
        )
        .collect()[0]
    )
    de.unpersist()
    n = float(row["n"] or 0)
    return float(row["r"] or 0) / n if n > 0 else float("nan")


def transitivity(edges: DataFrame) -> float:
    """Global clustering coefficient (nx.transitivity): 3 * triangles /
    connected triples = sum_v tri(v) / sum_v C(deg(v), 2). Reuses the
    degree-ordered wedge join from triangle counting — per-vertex
    triangle counts and degrees are each one aggregation, the ratio one
    fused scalar action."""
    from .triangles import simple_degrees, triangle_counts

    tri = triangle_counts(edges)
    deg = simple_degrees(edges)
    row = (
        tri.join(deg, "vertex", "left")
        .agg(
            F.sum(F.col("triangles").cast("double")).alias("t"),
            F.sum(
                (
                    F.coalesce("deg", F.lit(0))
                    * (F.coalesce("deg", F.lit(0)) - 1)
                    / 2.0
                ).cast("double")
            ).alias("w"),
        )
        .collect()[0]
    )
    w = float(row["w"] or 0.0)
    return float(row["t"] or 0.0) / w if w > 0 else float("nan")


def rich_club(edges: DataFrame) -> DataFrame:
    """Non-normalized rich-club coefficient per degree threshold
    (nx.rich_club_coefficient(normalized=False)):

        phi(k) = 2 E_k / (N_k (N_k - 1))

    where N_k = #vertices of degree > k and E_k = #edges both of whose
    endpoints have degree > k, for k = 0 .. max_degree - 1 with
    N_k >= 2. "Do the hubs of this crawl form a clique?" is a rich-club
    question.

    Plan shape: degree histogram + per-edge min-endpoint-degree
    histogram (two aggregations over the degree-annotated edge list),
    then suffix sums by a window over the DEGREE-VALUE domain — at most
    max_degree rows, thousands at web scale, so the window is cheap and
    the output is driver-small by construction."""
    from pyspark.sql import Window

    from .triangles import simple_degrees

    und = _und(edges)
    deg = simple_degrees(edges).persist()
    # degree histogram -> N_k via suffix sum over degree values
    dh = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nv"))
    # per-edge min endpoint degree -> E_k via suffix sum
    eh = (
        und.join(
            deg.select(F.col("vertex").alias("a"), F.col("deg").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("vertex").alias("b"), F.col("deg").alias("db")),
            "b",
        )
        .select(F.least("da", "db").alias("md"))
        .groupBy("md")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    max_deg = deg.agg(F.max("deg").alias("m")).collect()[0]["m"]
    deg.unpersist()
    if max_deg is None:
        return edges.sparkSession.createDataFrame(
            [], "k long, phi double"
        )
    ks = edges.sparkSession.range(0, int(max_deg)).select(
        F.col("id").alias("k")
    )
    wsfx = Window.orderBy(F.desc("deg")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nk = dh.select(
        "deg", F.sum("nv").over(wsfx).alias("n_gt")
    ).select(F.col("deg"), F.col("n_gt"))
    wsfx_e = Window.orderBy(F.desc("md")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ek = eh.select("md", F.sum("ne").over(wsfx_e).alias("e_gt"))
    # N_k = vertices with degree > k  = suffix count at smallest deg > k
    out = (
        ks.join(nk, nk["deg"] > F.col("k"))
        .groupBy("k")
        .agg(F.max("n_gt").alias("n_k"))
        .join(
            ks.join(ek, ek["md"] > F.col("k"))
            .groupBy("k")
            .agg(F.max("e_gt").alias("e_k")),
            "k",
            "left",
        )
        .filter(F.col("n_k") >= 2)
        .select(
            "k",
            (
                2.0
                * F.coalesce("e_k", F.lit(0))
                / (F.col("n_k") * (F.col("n_k") - 1))
            ).alias("phi"),
        )
    )
    return out


def conductance(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = "weight",
) -> DataFrame:
    """Per-community conductance over the undirected graph:
    ``(label, cut_w, vol_w, conductance)`` with

        phi(C) = cut(C) / min(vol(C), vol(V \\ C))

    — nx.algorithms.cuts.conductance semantics per community (cut =
    weight of edges with exactly one endpoint in C, vol = sum of member
    weighted degrees), the standard quality score for LPA / community
    output (lower = better-separated). Same edge convention as
    :func:`modularity`: undirected, self-loops out, max-weight dedup per
    pair. Communities whose members all have degree 0 are absent (phi
    undefined); a community covering the whole graph gets phi = 0.0.

    Plan: one dedup aggregation, one label join per endpoint (labels are
    vertex-partitioned; at web scale this is the big-table-to-big-table
    hash join CC/LPA already do), then two partial-agg groupBys keyed by
    label — no global window, no driver loop over communities."""
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
    mirror = lab.select(
        F.col("ca").alias("cu"), F.col("cb").alias("cv"), "w"
    ).unionByName(
        lab.select(
            F.col("cb").alias("cu"), F.col("ca").alias("cv"), "w"
        )
    )
    vol = mirror.groupBy(F.col("cu").alias("label")).agg(
        F.sum("w").alias("vol_w")
    )
    tot = float(
        mirror.agg(F.sum("w").alias("t")).collect()[0]["t"] or 0.0
    )
    cut = (
        mirror.filter(F.col("cu") != F.col("cv"))
        .groupBy(F.col("cu").alias("label"))
        .agg(F.sum("w").alias("cut_w"))
    )
    out = vol.join(cut, "label", "left").select(
        "label",
        F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
        "vol_w",
        F.when(
            F.least(F.col("vol_w"), F.lit(tot) - F.col("vol_w")) > 0,
            F.coalesce("cut_w", F.lit(0.0))
            / F.least(F.col("vol_w"), F.lit(tot) - F.col("vol_w")),
        )
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )
    lab.unpersist()
    return out
