"""Bipartite graph analytics: butterfly (4-cycle) counting.

Butterflies — complete 2x2 bicliques — are the bipartite analogue of
triangles: the density signal for host<->page, doc<->token, user<->item
incidence structures, and the basis of bipartite clustering coefficients
(Aksoy et al. 2017 "Measuring and modeling bipartite graphs with
community structure"). For a left pair (a, b) sharing ``c`` right
neighbours, the pair contributes C(c, 2) butterflies; per-left-vertex
counts sum over pairs, the global count halves the per-vertex sum.

Plan shape: one wedge join keyed on the RIGHT vertex (each right vertex
of degree d yields d*(d-1)/2 left pairs), one (a, b) aggregation, one
per-vertex rollup. The wedge join is the standard hot-key risk — a right
vertex shared by millions of lefts (a stop-token, a boilerplate asset
URL) is quadratic — so ``max_right_degree`` drops degenerate right
vertices explicitly, the same tunable guard as the dedup family's
``max_shingle_freq`` and link prediction's ``max_center_degree``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["butterfly_counts"]


def butterfly_counts(
    incidence: DataFrame,
    left_col: str = "left",
    right_col: str = "right",
    max_right_degree: int | None = None,
) -> DataFrame:
    """Per-left-vertex butterfly counts ``(vertex, butterflies)`` over a
    bipartite incidence table (duplicate rows are collapsed; left
    vertices in no butterfly report 0).

    ``max_right_degree`` excludes right vertices with more distinct left
    neighbours than the cap from WEDGE GENERATION (their butterflies are
    not counted — documented semantics, identical on both engine and any
    oracle that applies the same cap)."""
    inc = incidence.select(
        F.col(left_col).alias("l"), F.col(right_col).alias("r")
    ).distinct()
    wedge_src = inc
    if max_right_degree is not None:
        rdeg = inc.groupBy("r").agg(F.count(F.lit(1)).alias("rd"))
        wedge_src = inc.join(
            rdeg.filter(F.col("rd") <= max_right_degree).select("r"),
            "r",
            "left_semi",
        )
    a = wedge_src.select(F.col("l").alias("a"), "r")
    b = wedge_src.select(F.col("l").alias("b"), "r")
    pair_common = (
        a.join(b, "r")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select(
            "a", "b",
            (F.col("c") * (F.col("c") - 1) / F.lit(2))
            .cast("long")
            .alias("bf"),
        )
    )
    per_vertex = (
        pair_common.select(F.col("a").alias("vertex"), "bf")
        .unionByName(pair_common.select(F.col("b").alias("vertex"), "bf"))
        .groupBy("vertex")
        .agg(F.sum("bf").cast("long").alias("butterflies"))
    )
    lefts = inc.select(F.col("l").alias("vertex")).distinct()
    return lefts.join(per_vertex, "vertex", "left").select(
        "vertex",
        F.coalesce("butterflies", F.lit(0)).cast("long").alias(
            "butterflies"
        ),
    )
