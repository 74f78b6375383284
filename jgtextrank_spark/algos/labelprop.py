"""Label propagation (community detection) supersteps.

The community-detection analogue of the hash-min loop (SURVEY.md §2.5):
synchronous updates, each vertex adopts the most frequent label among its
neighbours (weighted by edge weight), ties broken by the smallest label —
fully deterministic, unlike classic randomized LPA. Vertices with no
neighbours keep their own label.

Each superstep: join labels to the cached symmetrized adjacency, count
(vertex, label) weights, pick the argmax per vertex with a window — two
shuffles over O(E) rows, adjacency itself never re-shuffles. Converges when
no label changes or ``max_iter`` (LPA can oscillate on bipartite-ish
structures; max_iter bounds that, as is standard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import symmetrize
from ..supersteps import SuperstepResult, run_supersteps

__all__ = ["label_propagation", "label_propagation_result"]


def label_propagation_result(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 10,
    weighted: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 5,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    broadcast_threshold: int = 2_000_000,
) -> SuperstepResult:
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    adj = (
        symmetrize(edges)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", w.alias("w"))
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
        votes = (
            adj.join(
                _b(state.select(F.col("vertex").alias("src"), "label")), "src"
            )
            .groupBy("dst", "label")
            .agg(F.sum("w").alias("votes"))
        )
        pick = Window.partitionBy("dst").orderBy(
            F.desc("votes"), F.asc("label")
        )
        best = (
            votes.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("dst", F.col("label").alias("new_label"))
        )
        new_state = (
            state.join(_b(best), state["vertex"] == best["dst"], "left")
            .select(
                "vertex",
                F.coalesce("new_label", "label").alias("label"),
                F.col("label").alias("prev_label"),
            )
            .persist()
        )
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
        label="label_propagation",
    )
    adj.unpersist()
    return result


def label_propagation(
    edges: DataFrame, encode_ids: bool = False, **kwargs
) -> DataFrame:
    """DataFrame ``(vertex, label)``.

    ``encode_ids=True`` runs the loop on dictionary-encoded longs. LPA's
    dynamics DEPEND on label order (ties break to the smallest label), so
    the encoding must be order-preserving — ``encode_vertices(
    order_preserving=True)`` assigns ids monotone in the string order,
    making every superstep's tie-break (and hence the final communities)
    identical to the string run while the loop shuffles 8-byte keys."""
    if not encode_ids:
        res = label_propagation_result(edges, **kwargs)
        return res.state.select("vertex", "label")

    from ..graph import encode_vertices

    if kwargs.get("vertices") is not None:
        raise ValueError(
            "encode_ids=True requires the vertex universe to come from "
            "the edge table."
        )
    enc_edges, vdict = encode_vertices(edges, order_preserving=True)
    res = label_propagation_result(enc_edges, **kwargs)
    v_dict = vdict.withColumnRenamed("id", "vertex").withColumnRenamed(
        "token", "vertex_str"
    )
    l_dict = vdict.withColumnRenamed("id", "label").withColumnRenamed(
        "token", "label_str"
    )
    return (
        res.state.join(v_dict, "vertex")
        .join(l_dict, "label")
        .select(
            F.col("vertex_str").alias("vertex"),
            F.col("label_str").alias("label"),
        )
    )
