"""Link-prediction scores: common neighbors, Jaccard, Adamic-Adar.

The standard "which edge appears next" suite (Liben-Nowell & Kleinberg
2003) over an undirected simple graph — for a link graph: which pages
*should* link but don't; for the reference's co-occurrence graph: which
term pair is one window short of an edge. The reference has no link
prediction; this generalizes its graph layer the same way the
neighborhood/SCC modules do.

Candidates are the NON-ADJACENT distance-2 pairs (networkx's default
ebunch = non-edges, restricted to pairs with >= 1 common neighbor —
pairs with no common neighbor score 0 on all three metrics and are
omitted rather than materializing the quadratic non-edge set). For
``(u, v)`` with common-neighbor set ``C``:

* ``cn = |C|``
* ``jaccard = |C| / (deg(u) + deg(v) - |C|)``  (|N(u) ∪ N(v)| expanded
  by inclusion-exclusion — no second pass over the union)
* ``adamic_adar = sum over w in C of 1 / ln(deg(w))``  (deg(w) >= 2
  always: w has both u and v as neighbors, so ln never hits 0)

Plan shape: one wedge self-join of the degree-annotated adjacency on the
center w (the same join shape as triangle counting), one
partial-agg-friendly ``groupBy(u, v)``, one anti-join against the edge
set. The wedge join is quadratic in the center's degree — a 10^6-degree
hub mints 10^12 candidate pairs, which no downstream filter can undo —
so ``max_center_degree`` bounds the wedge centers exactly like the
``max_shingle_freq`` hot-key guard in the dedup family: super-hub
centers are skipped with documented recall loss (pairs whose ONLY
common neighbors are super-hubs disappear; scores of surviving pairs
lose those centers' contributions). ``max_center_degree=0`` disables
the guard (exact — the oracle/test mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["link_prediction"]


def link_prediction(
    edges: DataFrame,
    max_center_degree: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame ``(u, v, cn, jaccard, adamic_adar)`` for every
    non-adjacent pair (u < v) with at least one common neighbor.
    ``edges`` rows are any orientation; self-loops ignored."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    adj = (
        und.select(F.col("a").alias("w"), F.col("b").alias("n"))
        .unionByName(und.select(F.col("b").alias("w"), F.col("a").alias("n")))
        .repartition(num_partitions, "w")
        .persist()
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    centers = adj.join(deg, "w")
    if max_center_degree > 0:
        centers = centers.filter(F.col("deg") <= max_center_degree)

    # wedge join on the center w: every unordered neighbor pair (u < v)
    right = centers.select(
        F.col("w"), F.col("n").alias("v")
    )
    wedges = (
        centers.select("w", F.col("n").alias("u"), "deg")
        .join(right, "w")
        .filter(F.col("u") < F.col("v"))
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum(1.0 / F.log(F.col("deg").cast("double"))).alias("aa"),
    )
    # non-adjacent pairs only (networkx non-edge ebunch)
    scores = scores.join(
        und,
        (scores["u"] == und["a"]) & (scores["v"] == und["b"]),
        "left_anti",
    )
    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("deg_v"))
    out = (
        scores.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
                6,
            ).alias("jaccard"),
            F.round("aa", 6).alias("adamic_adar"),
        )
    )
    return out
