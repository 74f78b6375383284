#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1.4): isolate the
expensive operators with explicit timing, independent of the frozen
bench.py. Each experiment prints one labelled line; nothing here is read
by the driver.

Usage: python bench_extra.py <experiment> [...]
Experiments:
  overhead      — per-job / per-stage fixed-cost floor on this box
  cc_chain      — cold hash-min CC on the 200k chain (the per-round
                  overhead magnifier)
  louvain       — louvain_move_phase fixed_rounds=4 on the 2M power-law
  coreness      — h-index core decomposition on the 2M power-law
  hyperball     — HyperBall lg_k=8 on the 2M power-law
  pagerank30m   — 5 fixed supersteps on the 30M-edge headline graph
  betweenness   — sampled Brandes k=8 on the 2M power-law
  ppr           — 32-seed PPR, 10 iters
  scc           — distributed SCC on the 2M power-law
  msf           — Borůvka MSF on the 2M power-law
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from bench import synth_powerlaw_edges  # noqa: E402


def get(cpus=32):
    from jgtextrank_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", app_name="bench-extra",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.3f}s {out if out is not None else ''}")


def ex_overhead(spark):
    df = spark.range(1000).select(F.col("id").alias("k")).persist()
    df.count()
    t("20x trivial count (cached)", lambda: [df.count() for _ in range(20)])
    t("20x groupBy agg (1 exchange)", lambda: [
        df.groupBy("k").count().count() for _ in range(20)
    ])
    small = spark.range(100).select(F.col("id").alias("k"))
    t("20x broadcast join build+probe", lambda: [
        df.join(F.broadcast(small), "k").count() for _ in range(20)
    ])
    t("20x localCheckpoint", lambda: [
        df.limit(100).localCheckpoint(eager=True) for _ in range(20)
    ])


def ex_cc_chain(spark):
    from jgtextrank_spark.algos.components import connected_components_result

    n = 200_000
    base = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    t0 = time.time()
    res = connected_components_result(base, checkpoint_every=0)
    wall = time.time() - t0
    steps = [m for m in res.metrics if m["event"] == "step"]
    print(
        f"cc_chain cold: {wall:.2f}s rounds={res.iterations} "
        f"per-round={[round(m['wall_ms']/1000, 2) for m in steps]}"
    )


def ex_louvain(spark):
    from jgtextrank_spark.algos.louvain import louvain_move_phase

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    t0 = time.time()
    comm, it, _c, ms = louvain_move_phase(edges, fixed_rounds=4)
    ncomm = comm.select("community").distinct().count()
    print(
        f"louvain move4: {time.time() - t0:.2f}s moves="
        f"{[m['moved'] for m in ms]} communities={ncomm}"
    )
    edges.unpersist()


def ex_coreness(spark):
    from jgtextrank_spark.algos.centrality import core_numbers_hindex_result

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    t0 = time.time()
    res = core_numbers_hindex_result(edges, checkpoint_every=0)
    wall = time.time() - t0
    steps = [m for m in res.metrics if m["event"] == "step"]
    print(
        f"coreness: {wall:.2f}s rounds={res.iterations} "
        f"changed={[int(m['delta']) for m in steps]} "
        f"per-round={[round(m['wall_ms']/1000, 2) for m in steps]}"
    )
    edges.unpersist()


def ex_hyperball(spark):
    from jgtextrank_spark.algos.neighborhood import hyperball_result

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    t0 = time.time()
    res, n_t = hyperball_result(edges, max_iter=32, lg_k=8, checkpoint_every=0)
    wall = time.time() - t0
    steps = [m for m in res.metrics if m["event"] == "step"]
    print(
        f"hyperball: {wall:.2f}s rounds={res.iterations} "
        f"changed={[int(m['delta']) for m in steps]} "
        f"per-round={[round(m['wall_ms']/1000, 2) for m in steps]}"
    )
    edges.unpersist()


def ex_pagerank30m(spark):
    from jgtextrank_spark.algos.pagerank import pagerank_result

    edges = synth_powerlaw_edges(spark, 1_000_000, 30_000_000).persist()
    edges.count()
    t0 = time.time()
    res, n = pagerank_result(
        edges, tol=0.0, max_iter=5, checkpoint_every=0, truncate_every=3
    )
    wall = time.time() - t0
    steps = [m for m in res.metrics if m["event"] == "step"]
    print(
        f"pagerank30m 5it: {wall:.2f}s "
        f"per-step={[round(m['wall_ms']/1000, 2) for m in steps]}"
    )
    edges.unpersist()


def ex_betweenness(spark):
    from jgtextrank_spark.algos.betweenness import betweenness_sampled

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    t0 = time.time()
    out = betweenness_sampled(edges, k=8)
    nz = out.filter(F.col("betweenness") > 0).count()
    print(f"betweenness k8: {time.time() - t0:.2f}s nonzero={nz}")
    edges.unpersist()


def ex_ppr(spark):
    from jgtextrank_spark.algos.pagerank import pagerank_multi_seed

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    seeds = [int(i * 997) % 200_000 for i in range(32)]
    t0 = time.time()
    out = pagerank_multi_seed(edges, seeds, max_iter=10, min_score=1e-6)
    touched = out.count()
    print(f"ppr 32x10: {time.time() - t0:.2f}s rows={touched}")
    edges.unpersist()


def ex_scc(spark):
    from jgtextrank_spark.algos.scc import (
        strongly_connected_components_result,
    )

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    t0 = time.time()
    scc, ms = strongly_connected_components_result(edges)
    n = scc.count()
    wall = time.time() - t0
    ncomp = scc.select("component").distinct().count()
    print(f"scc: {wall:.2f}s vertices={n} components={ncomp}")
    for m in ms:
        print("  ", m)
    edges.unpersist()


def ex_msf(spark):
    from jgtextrank_spark.algos.mst import boruvka_msf, msf_perturbed_weights

    edges = msf_perturbed_weights(
        synth_powerlaw_edges(spark, 200_000, 2_000_000).withColumn(
            "weight", F.lit(1.0)
        )
    ).persist()
    edges.count()
    t0 = time.time()
    msf = boruvka_msf(edges).persist()
    n = msf.count()
    print(f"msf: {time.time() - t0:.2f}s forest_edges={n}")
    edges.unpersist()
    msf.unpersist()


def main():
    which = sys.argv[1:] or ["overhead"]
    spark = get()
    for name in which:
        globals()[f"ex_{name}"](spark)


if __name__ == "__main__":
    main()
