"""Weisfeiler-Lehman graph fingerprints (per-group).

The 1-WL (color-refinement) hash of Shervashidze et al. 2011 /
networkx's ``weisfeiler_lehman_graph_hash``, run SIMULTANEOUSLY over
millions of independent small graphs keyed by a group column — graph
dedup/canopy signatures for per-document co-occurrence graphs, template
detection over per-host link structures, etc. Two isomorphic graphs
always collide; non-isomorphic graphs collide only if 1-WL cannot
distinguish them (the usual WL caveat).

Everything is md5 over canonically sorted neighbour-label lists, so the
refinement is engine-replayable bit-for-bit (DuckDB oracle: unrolled
CTEs with ``string_agg(... ORDER BY ...)``). Determinism on Spark comes
from ``array_sort(collect_list(...))`` — collect order is arbitrary,
the sort canonicalizes it.

Scale shape: each refinement round is ONE join (labels onto the
adjacency) + ONE (group, vertex) aggregation — both hash-partitioned on
the group key, so independent graphs never synchronize. Rounds are a
fixed small constant (the WL depth), not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["wl_vertex_labels", "wl_fingerprints"]


def _sym(edges: DataFrame, group_col: str) -> DataFrame:
    e = edges.select(group_col, "src", "dst").filter(
        F.col("src") != F.col("dst")
    )
    return (
        e.select(group_col, F.col("src").alias("v"), F.col("dst").alias("u"))
        .unionByName(
            e.select(
                group_col, F.col("dst").alias("v"), F.col("src").alias("u")
            )
        )
        .distinct()
    )


def wl_vertex_labels(
    edges: DataFrame,
    iterations: int = 2,
    group_col: str = "doc_id",
) -> DataFrame:
    """Refined WL labels ``(group, vertex, label)`` after ``iterations``
    rounds. Initial label = md5 of the vertex degree (structure only —
    vertex NAMES never enter, so isomorphic graphs with different token
    sets still collide); update = md5(own label || '|' || comma-joined
    sorted neighbour labels)."""
    adj = _sym(edges, group_col)
    labels = adj.groupBy(group_col, "v").agg(
        F.md5(F.count(F.lit(1)).cast("string")).alias("lbl")
    )
    for _ in range(iterations):
        nbr = adj.join(
            labels.select(
                group_col,
                F.col("v").alias("u"),
                F.col("lbl").alias("ulbl"),
            ),
            [group_col, "u"],
        )
        agg = nbr.groupBy(group_col, "v").agg(
            F.array_join(
                F.array_sort(F.collect_list("ulbl")), ","
            ).alias("nl")
        )
        labels = labels.join(agg, [group_col, "v"]).select(
            group_col,
            "v",
            F.md5(F.concat_ws("|", "lbl", "nl")).alias("lbl"),
        )
    return labels.select(
        group_col, F.col("v").alias("vertex"), F.col("lbl").alias("label")
    )


def wl_fingerprints(
    edges: DataFrame,
    iterations: int = 2,
    group_col: str = "doc_id",
) -> DataFrame:
    """One WL hash per group: ``(group, wl_hash)`` = md5 of the
    comma-joined sorted multiset of refined vertex labels. Equal hashes
    <=> 1-WL-equivalent graphs (isomorphic graphs always equal)."""
    labels = wl_vertex_labels(edges, iterations, group_col)
    return labels.groupBy(group_col).agg(
        F.md5(
            F.array_join(F.array_sort(F.collect_list("label")), ",")
        ).alias("wl_hash")
    )
