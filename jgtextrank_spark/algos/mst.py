"""Minimum spanning forest via distributed Borůvka rounds.

Extends the graph suite (the reference ranks/partitions co-occurrence
graphs — ``/root/reference/jgtextrank/core.py:614-642`` decomposes into
components; the MSF is the natural next decomposition: the lightest
skeleton of each component, used for single-linkage clustering over
similarity graphs and for sparsifying web/host graphs before expensive
downstream ops).

Borůvka is THE MapReduce-friendly MST algorithm: every round each
component selects its minimum outgoing edge (one join + one aggregate —
map-side combinable), the selected edges merge components (contraction),
and the component count at least halves, so O(log V) rounds total. No
priority queue, no sequential dependence — unlike Prim/Kruskal, every
step is a bulk DataFrame op:

1. Attach component labels to both endpoints of every still-external
   edge (two hash joins against the label table, which is small and
   broadcastable once components coarsen).
2. Per component, pick ``min(struct(weight, u, v, other))`` — a single
   partial-aggregable ``groupBy``. The struct comparator makes the
   choice a TOTAL order over edges (each edge's (weight, u, v) triple is
   unique), which is the classic trick that (a) makes the result
   deterministic under weight ties and (b) guarantees the selected-edge
   graph has only 2-cycles, never longer ones.
3. Contract: run the tested accelerated hash-min connected components
   (:func:`..components.connected_components_result` — tree hooking +
   pointer jumping, O(log diameter) rounds) on the selected-edge graph,
   whose size is <= the component count, i.e. tiny relative to E and
   shrinking geometrically. Relabel.

The union of selected edges over all rounds is the minimum spanning
forest w.r.t. the (weight, u, v) total order — a true MSF of the
weights, with ties broken canonically.

At 10^12 edges: the edge table is hash-partitioned by ``u`` once and
static; per round only the label table (V-sized, shrinking) shuffles,
and the contraction graph is component-count-sized. Selected edges per
round are checkpointed to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components_result

__all__ = ["boruvka_msf", "msf_perturbed_weights"]


def msf_perturbed_weights(edges: DataFrame) -> DataFrame:
    """Replace ``weight`` with ``weight + md5(u:v)48bit / 2**48`` on the
    canonical (u < v) pair — a deterministic, engine-portable tie-break
    that makes all weights distinct (so the MSF is unique) without
    changing the relative order of distinct integral weights. The
    perturbation is exact in IEEE doubles (int48 / 2**48 is an exact
    division; one rounded add), so any engine reproduces it bit-for-bit.
    """
    u = F.least("src", "dst")
    v = F.greatest("src", "dst")
    eps = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", u, v)), 1, 12), 16, 10
        ).cast("long").cast("double")
        / F.lit(float(2**48))
    )
    return edges.select(
        "src", "dst", (F.col("weight").cast("double") + eps).alias("weight")
    )


def boruvka_msf(
    edges: DataFrame,
    weight_col: str = "weight",
    num_partitions: int | None = None,
    max_iter: int = 40,
) -> DataFrame:
    """Minimum spanning forest: DataFrame ``(u, v, weight)``, one row per
    forest edge, ``u < v``. Ties are broken by the (weight, u, v) total
    order, so the output is deterministic; with distinct weights it is
    THE unique MSF. Self-loops ignored; parallel edges collapse to their
    minimum weight. Isolated vertices contribute no rows (a forest has
    no edges there)."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = F.col(weight_col).cast("double")
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            w.alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .repartition(num_partitions, "u")
        .persist()
    )
    comp = (
        e.select(F.col("u").alias("vertex"))
        .unionByName(e.select(F.col("v").alias("vertex")))
        .distinct()
        .select("vertex", F.col("vertex").alias("comp"))
        .localCheckpoint(eager=True)
    )
    chosen_parts: list[DataFrame] = []
    for _ in range(max_iter):
        cu = comp.select(
            F.col("vertex").alias("u"), F.col("comp").alias("cu")
        )
        cv = comp.select(
            F.col("vertex").alias("v"), F.col("comp").alias("cv")
        )
        ec = (
            e.join(cu, "u")
            .join(cv, "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        # per-component min external edge under the (w, u, v) total
        # order; both endpoints' components compete for the same edge
        cand = ec.select(
            F.col("cu").alias("c"), F.struct("w", "u", "v").alias("s")
        ).unionByName(
            ec.select(
                F.col("cv").alias("c"), F.struct("w", "u", "v").alias("s")
            )
        )
        sel = (
            cand.groupBy("c")
            .agg(F.min("s").alias("s"))
            .select("s.u", "s.v", "s.w")
            .distinct()
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        if sel.isEmpty():
            break
        chosen_parts.append(sel)
        # contract: components of the selected-edge graph OVER COMPONENT
        # IDS (size <= component count — tiny and shrinking); the
        # selected graph's only cycles are 2-cycles (total order), and
        # the accelerated hash-min handles its long chains in O(log)
        sel_c = (
            ec.join(sel, ["u", "v", "w"], "left_semi")
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
            .withColumn("weight", F.lit(1.0))
        )
        merged = connected_components_result(
            sel_c, checkpoint_every=0, resume=False
        ).state
        comp = (
            comp.join(
                merged.withColumnRenamed("vertex", "comp"), "comp", "left"
            )
            .select(
                "vertex",
                F.coalesce("label", F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    if not chosen_parts:
        return e.select("u", "v", F.col("w").alias("weight")).limit(0)
    out = chosen_parts[0]
    for p in chosen_parts[1:]:
        out = out.unionByName(p)
    return out.distinct().select("u", "v", F.col("w").alias("weight"))
