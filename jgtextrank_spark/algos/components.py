"""Connected components via hash-min label propagation supersteps.

Generalizes the reference's per-component decomposition
(``/root/reference/jgtextrank/core.py:614-642``, which iterates
``nx.connected_components``) into a distributed fixpoint:

    label(v) <- min(label(v), min_{u ~ v} label(u))

until no label changes. Each superstep is one join + one aggregation; the
adjacency is symmetrized once, hash-partitioned by ``src`` and cached, so
only the (small) label vector shuffles per superstep. Convergence in
O(diameter) supersteps — for power-law web graphs the effective diameter
is small (~log N), which is the regime this implementation targets; a
two-phase large-star/small-star contraction (Kiveris et al., "Connected
Components in MapReduce and Beyond") converging in O(log^2 N) on
adversarial long-chain graphs is the known upgrade path and slots into
the same superstep harness.

Component ids are the minimum vertex id in the component (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import symmetrize
from ..supersteps import SuperstepResult, run_supersteps

__all__ = ["connected_components", "connected_components_result"]


def connected_components_result(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    num_partitions: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    broadcast_threshold: int = 2_000_000,
    accelerated: bool = True,
) -> SuperstepResult:
    """``edges`` are undirected rows (any orientation, self-loops ignored).
    Returns state ``(vertex, label)`` where label = min vertex id of the
    component.

    ``accelerated=True`` adds pointer jumping to each superstep:
    label(v) <- min(neighbour-min(v), label(label(v))). Neighbour-min alone
    converges in O(diameter) supersteps; the label-of-label join shortcuts
    chains so convergence is O(log diameter) — the difference between 30
    and ~6 supersteps on a 30-hop path, and between hundreds and ~10 on
    web-graph stragglers."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    adj = (
        symmetrize(edges.select("src", "dst", F.lit(1.0).alias("weight")))
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    verts = edges.select(F.col("src").alias("vertex")).unionByName(
        edges.select(F.col("dst").alias("vertex"))
    )
    if vertices is not None:
        verts = verts.unionByName(vertices.select(F.col("id").alias("vertex")))
    init = verts.distinct().withColumn("label", F.col("vertex")).persist()
    bcast = init.count() <= broadcast_threshold

    def _b(df):
        return F.broadcast(df) if bcast else df

    def step(state: DataFrame, it: int) -> tuple[DataFrame, float]:
        nbr_min = (
            adj.join(
                _b(state.select(F.col("vertex").alias("src"), "label")), "src"
            )
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_state = state.join(
            _b(nbr_min), state["vertex"] == nbr_min["dst"], "left"
        ).select(
            "vertex",
            F.least("label", F.coalesce("nbr_label", "label")).alias("label"),
            F.col("label").alias("prev_label"),
        )
        if accelerated:
            # pointer jumping: label <- min(label, label(label))
            parents = _b(
                state.select(
                    F.col("vertex").alias("p_vertex"),
                    F.col("label").alias("p_label"),
                )
            )
            new_state = new_state.join(
                parents, new_state["label"] == parents["p_vertex"], "left"
            ).select(
                "vertex",
                F.least(
                    "label", F.coalesce("p_label", "label")
                ).alias("label"),
                "prev_label",
            )
        new_state = new_state.persist()
        changed = new_state.agg(
            F.sum(
                F.when(F.col("label") != F.col("prev_label"), 1).otherwise(0)
            ).alias("c")
        ).collect()[0]["c"]
        return new_state, float(changed or 0)

    result = run_supersteps(
        spark,
        init,
        step,
        max_iter=max_iter,
        tolerance=0.0,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        label="connected_components",
    )
    adj.unpersist()
    return result


def connected_components(
    edges: DataFrame, encode_ids: bool = False, **kwargs
) -> DataFrame:
    """DataFrame ``(vertex, component)``.

    ``encode_ids=True`` dictionary-encodes string vertex ids to longs
    before the superstep loop (``graph.encode_vertices``) so every
    iteration shuffles 8-byte keys instead of strings, then decodes and
    relabels each component with its minimum *string* vertex — the output
    is identical to the unencoded run (component = min vertex id), only
    the loop's shuffle payload changes."""
    if not encode_ids:
        res = connected_components_result(edges, **kwargs)
        return res.state.select("vertex", F.col("label").alias("component"))

    from ..graph import encode_vertices

    enc_edges, vdict = encode_vertices(edges)
    res = connected_components_result(enc_edges, **kwargs)
    decoded = res.state.join(
        vdict.withColumnRenamed("id", "vertex"), "vertex"
    ).select(F.col("token").alias("v_str"), "label")
    rep = decoded.groupBy("label").agg(F.min("v_str").alias("component"))
    return decoded.join(rep, "label").select(
        F.col("v_str").alias("vertex"), "component"
    )
