"""Luby-style maximal independent set and maximal matching.

The two classical symmetry-breaking primitives of parallel graph
processing (Luby 1986; Israeli-Itai 1986 for matching). Web-pipeline
uses: MIS = conflict-free scheduling over the dedup-pair graph (pick a
canonical keeper set no two of which are near-duplicates), landmark /
seed spreading; maximal matching = one round of graph coarsening for
multilevel partitioners and 2-approximate vertex cover (the matched
endpoints).

Determinism (the design center, same convention as algos/walks.py):
per-round priorities are ``md5(seed:round:id)`` — the first 12 hex
chars, CONCATENATED with the id into a sortable string key (the hash
prefix is fixed-length, so string comparison == (hash, id) tuple
comparison). A vertex/edge is selected iff its key is a strict local
minimum among alive neighbors / incident edges. Everything is string
algebra over md5, so whole runs replay bit-for-bit in any engine with
md5 — the correctness gate unrolls entire runs in DuckDB.

Scale shape: each round is two hash aggregations + semi/anti joins on
the shrinking alive set; expected O(log n) rounds (each round kills a
constant fraction of edges in expectation over the hash). One driver
action per round (the alive-count convergence scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import _simple_edges

__all__ = ["maximal_independent_set", "maximal_matching"]


def _key(prefix_expr, id_col):
    """12-hex md5 prefix || id — fixed-length prefix makes the string
    compare equal to the (hash, id) tuple compare in every engine."""
    return F.concat(
        F.substring(F.md5(F.concat(prefix_expr, F.col(id_col))), 1, 12),
        F.col(id_col),
    )


def maximal_independent_set(
    edges: DataFrame,
    seed: str = "mis",
    max_rounds: int = 60,
) -> DataFrame:
    """(vertex, in_mis, round) over the simple undirected graph.

    Luby local-minimum rule: in round r a vertex joins the MIS iff its
    key ``md5(seed:r:v)[:12] || v`` is strictly smaller than every alive
    neighbor's; winners and their neighbors leave the graph. ``round``
    is the round the vertex was decided. Self-loops are dropped with the
    simplification (a self-looped vertex is its own neighbor under the
    independence relation only in hypergraph readings; the classical MIS
    is over the simple graph).
    """
    se = _simple_edges(edges)
    alive = (
        se.select(F.col("u").alias("vertex"))
        .unionByName(se.select(F.col("v").alias("vertex")))
        .distinct()
        .persist()
    )
    alive_edges = se.persist()

    decided_parts: list[DataFrame] = []
    for r in range(1, max_rounds + 1):
        pri = alive.select(
            "vertex", _key(F.lit(f"{seed}:{r}:"), "vertex").alias("k")
        )
        mirror = alive_edges.select(
            F.col("u").alias("a"), F.col("v").alias("b")
        ).unionByName(
            alive_edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        nbr_min = (
            mirror.join(
                pri.select(F.col("vertex").alias("b"), F.col("k").alias("kb")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("kb").alias("nb_min"))
        )
        winners = (
            pri.join(nbr_min, pri["vertex"] == nbr_min["a"], "left")
            .filter(F.col("nb_min").isNull() | (F.col("k") < F.col("nb_min")))
            .select("vertex")
            .localCheckpoint(eager=True)
        )
        nbrs = (
            mirror.join(
                winners.withColumnRenamed("vertex", "a"), "a", "semi"
            )
            .select(F.col("b").alias("vertex"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        decided_parts.append(
            winners.select(
                "vertex", F.lit(True).alias("in_mis"), F.lit(r).alias("round")
            ).unionByName(
                nbrs.select(
                    "vertex",
                    F.lit(False).alias("in_mis"),
                    F.lit(r).alias("round"),
                )
            )
        )
        removed = winners.unionByName(nbrs)
        new_alive = alive.join(removed, "vertex", "anti").localCheckpoint(
            eager=True
        )
        n_alive = new_alive.count()
        alive.unpersist()
        alive = new_alive
        new_edges = (
            alive_edges.join(
                alive.withColumnRenamed("vertex", "u"), "u", "semi"
            )
            .join(alive.withColumnRenamed("vertex", "v"), "v", "semi")
            .localCheckpoint(eager=True)
        )
        alive_edges.unpersist()
        alive_edges = new_edges
        if n_alive == 0:
            break
    else:
        raise RuntimeError(
            f"MIS did not decide every vertex in {max_rounds} rounds"
        )

    out = decided_parts[0]
    for p in decided_parts[1:]:
        out = out.unionByName(p)
    return out


def maximal_matching(
    edges: DataFrame,
    seed: str = "matching",
    max_rounds: int = 60,
) -> DataFrame:
    """(u, v, round) — a maximal matching of the simple undirected graph.

    Israeli-Itai local-minimum rule: in round r an edge is matched iff
    its key ``md5(seed:r:u>v)[:12] || u || '>' || v`` is the strict
    minimum among alive edges at BOTH endpoints; matched vertices leave.
    Returned pairs are vertex-disjoint, and every simple edge of the
    input touches a matched vertex (maximality).
    """
    alive_edges = _simple_edges(edges).persist()

    matched_parts: list[DataFrame] = []
    for r in range(1, max_rounds + 1):
        keyed = alive_edges.select(
            "u",
            "v",
            F.concat(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{seed}:{r}:"),
                            F.col("u"),
                            F.lit(">"),
                            F.col("v"),
                        )
                    ),
                    1,
                    12,
                ),
                F.col("u"),
                F.lit(">"),
                F.col("v"),
            ).alias("k"),
        )
        incident = keyed.select(
            F.col("u").alias("x"), F.col("k")
        ).unionByName(keyed.select(F.col("v").alias("x"), F.col("k")))
        vmin = incident.groupBy("x").agg(F.min("k").alias("mk"))
        sel = (
            keyed.join(
                vmin.select(F.col("x").alias("u"), F.col("mk").alias("mu")),
                "u",
            )
            .join(
                vmin.select(F.col("x").alias("v"), F.col("mk").alias("mv")),
                "v",
            )
            .filter((F.col("k") == F.col("mu")) & (F.col("k") == F.col("mv")))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        matched_parts.append(
            sel.select("u", "v", F.lit(r).alias("round"))
        )
        mv = (
            sel.select(F.col("u").alias("vertex"))
            .unionByName(sel.select(F.col("v").alias("vertex")))
            .distinct()
        )
        new_edges = (
            alive_edges.join(mv.withColumnRenamed("vertex", "u"), "u", "anti")
            .join(mv.withColumnRenamed("vertex", "v"), "v", "anti")
            .localCheckpoint(eager=True)
        )
        n_edges = new_edges.count()
        alive_edges.unpersist()
        alive_edges = new_edges
        if n_edges == 0:
            break
    else:
        raise RuntimeError(
            f"matching did not exhaust edges in {max_rounds} rounds"
        )

    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.unionByName(p)
    return out
