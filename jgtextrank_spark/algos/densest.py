"""Densest-subgraph extraction by greedy threshold peeling.

The flagship web-graph mining primitive the reference's PageRank layer
points toward but never ships: find the subgraph maximizing average
degree density rho(S) = |E(S)| / |S|.  On web graphs the densest
subgraph is the canonical link-farm / spam-cluster detector, and the
greedy peel is THE scalable algorithm for it:

* Charikar (APPROX 2000): repeatedly removing the minimum-degree vertex
  and keeping the best intermediate snapshot is a 2-approximation.
* Bahmani, Kumar, Vassilvitskii (VLDB 2012): removing EVERY vertex with
  ``deg <= 2*(1+eps)*rho(S)`` per round keeps a ``2*(1+eps)``
  approximation while needing only ``O(log_{1+eps} n)`` rounds — the
  MapReduce/Spark formulation implemented here.

Spark-first shape (scale notes):

* One degree aggregation per round (map-side partial agg), ONE driver
  action per round fetching the two scalars ``(n, sum(deg))`` — rounds
  are O(log n), so ~40 driver round-trips even at 10^12 vertices.
* The alive vertex/edge sets shrink monotonically; edges are kept
  co-partitioned and lineage is truncated per round (localCheckpoint
  over cached state), so round t+1's plan does not replay round t.
* The removal threshold is evaluated in EXACT integer arithmetic
  (``deg * n * eps_den <= eps_num * 2m`` over decimals, with
  ``(1+eps) = eps_num/eps_den``), so peel rounds are bit-replayable in
  any SQL engine — the correctness gate unrolls the whole peel in
  DuckDB. Snapshot selection (argmax rho) is likewise an exact rational
  cross-multiply, never a float compare.

Output: one row per vertex of the simple graph with the round it was
peeled (1-based) and whether it belongs to the returned densest
snapshot (the alive set at the start of the best round).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _simple_edges

__all__ = ["DensestResult", "densest_subgraph_result", "densest_subgraph"]


@dataclass
class DensestResult:
    peel: DataFrame            # (vertex, peel_round, in_densest)
    rounds: int
    best_round: int            # 1-based round whose starting set is returned
    best_density: float        # |E|/|V| of that snapshot
    metrics: list[dict] = field(default_factory=list)


def densest_subgraph_result(
    edges: DataFrame,
    eps: float | Fraction = 0.1,
    max_rounds: int = 100,
) -> DensestResult:
    """Greedy ``2*(1+eps)``-approximate densest subgraph.

    ``edges`` is any (src, dst[, weight]) table; the graph is simplified
    (self-loops dropped, unordered pairs deduped) — density is over the
    simple undirected graph, matching the classical definition.
    """
    frac = Fraction(str(eps)) if not isinstance(eps, Fraction) else eps
    if frac < 0:
        raise ValueError("eps must be >= 0")
    one_plus = 1 + frac
    num, den = one_plus.numerator, one_plus.denominator

    se = _simple_edges(edges).persist()
    alive = (
        se.select(F.col("u").alias("vertex"))
        .unionByName(se.select(F.col("v").alias("vertex")))
        .distinct()
        .persist()
    )
    alive_edges = se

    removed_parts: list[DataFrame] = []
    densities: list[tuple[int, int]] = []  # (two_m, n) exact per round
    metrics: list[dict] = []

    rounds = 0
    for r in range(1, max_rounds + 1):
        edeg = (
            alive_edges.select(F.col("u").alias("vertex"))
            .unionByName(alive_edges.select(F.col("v").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        deg = (
            alive.join(edeg, "vertex", "left")
            .select("vertex", F.coalesce(F.col("cnt"), F.lit(0)).alias("deg"))
            .persist()
        )
        row = deg.agg(
            F.count(F.lit(1)).alias("n"), F.sum("deg").alias("two_m")
        ).collect()[0]
        n, two_m = int(row["n"]), int(row["two_m"] or 0)
        if n == 0:
            deg.unpersist()
            break
        rounds = r
        densities.append((two_m, n))
        metrics.append(
            {"round": r, "vertices": n, "edges": two_m // 2,
             "density": two_m / 2.0 / n}
        )
        # deg <= (1+eps) * two_m / n  <=>  deg*n*den <= num*two_m, exactly.
        # decimal(38,0) keeps the product exact up to 10^38 (deg*n*den is
        # ~10^25 even at 10^12 vertices) — no float boundary flakes.
        dec = "decimal(38,0)"
        cond = (
            F.col("deg").cast(dec) * F.lit(n).cast(dec) * F.lit(den).cast(dec)
            <= F.lit(num).cast(dec) * F.lit(two_m).cast(dec)
        )
        removed = deg.filter(cond).select(
            "vertex", F.lit(r).alias("peel_round")
        )
        removed_parts.append(removed.localCheckpoint(eager=True))

        new_alive = deg.filter(~cond).select("vertex").localCheckpoint(
            eager=True
        )
        alive.unpersist()
        deg.unpersist()
        alive = new_alive

        new_edges = (
            alive_edges.join(
                alive.withColumnRenamed("vertex", "u"), "u", "semi"
            )
            .join(alive.withColumnRenamed("vertex", "v"), "v", "semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        alive_edges.unpersist()
        alive_edges = new_edges
    else:
        raise RuntimeError(
            f"densest-subgraph peel did not empty in {max_rounds} rounds "
            f"(eps={eps}); raise max_rounds"
        )

    alive.unpersist()
    alive_edges.unpersist()
    if not densities:
        spark = edges.sparkSession
        empty = spark.createDataFrame(
            [], "vertex string, peel_round int, in_densest boolean"
        )
        return DensestResult(empty, 0, 0, 0.0, metrics)

    # argmax rho over rounds, exact rational compare, earliest round wins
    best_round, (bt, bn) = 1, densities[0]
    for i, (t, nn) in enumerate(densities[1:], start=2):
        if t * bn > bt * nn:
            best_round, bt, bn = i, t, nn
    best_density = bt / 2.0 / bn

    peel = removed_parts[0]
    for p in removed_parts[1:]:
        peel = peel.unionByName(p)
    peel = peel.select(
        "vertex",
        "peel_round",
        (F.col("peel_round") >= F.lit(best_round)).alias("in_densest"),
    )
    return DensestResult(peel, rounds, best_round, best_density, metrics)


def densest_subgraph(
    edges: DataFrame, eps: float | Fraction = 0.1, max_rounds: int = 100
) -> DataFrame:
    """(vertex, peel_round, in_densest) — see densest_subgraph_result."""
    return densest_subgraph_result(edges, eps, max_rounds).peel
