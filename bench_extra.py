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


def ex_textrank_phases(spark):
    """Phase split of the flagship textrank_keywords bench row (sf0.1):
    sentence build / co-occur graph / solver / collapse+weigh."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from jgtextrank_spark.corpus import build_sentences
    from jgtextrank_spark.graph import cooccurrence_edges
    from jgtextrank_spark.textrank import (
        collapse_candidates,
        solve_scores,
        top_t_vertices,
        vertices_from_sentences,
        weigh_candidates,
    )

    pages = entrymod._docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    sents = build_sentences(pages).persist()
    t("sentences (build+materialize)", lambda: sents.count())
    edges = cooccurrence_edges(
        sents, window=2, conn_with_original_ctx=True, weighted=False
    ).persist()
    t("edges (cooccur)", lambda: edges.count())
    vertices = vertices_from_sentences(sents).persist()
    t("vertices", lambda: vertices.count())
    holder = {}

    def _solve():
        holder["s"] = solve_scores(
            edges, vertices, solver="pagerank", max_iter=100, tol=1e-6,
            directed=False,
        ).persist()
        holder["s"].count()

    t("solver (pagerank to conv)", _solve)
    scores = holder["s"]
    top = top_t_vertices(scores, top_p=1.0).persist()
    t("top_t", lambda: top.count())
    cands = collapse_candidates(sents, scores, per_doc=True)
    wt = weigh_candidates(cands, scores, top, weight_comb="sum", mu=5)
    t("collapse+weigh+sort", lambda: len(
        wt.orderBy(F.desc("score"), F.asc("term")).collect()
    ))
    for df in (sents, edges, vertices, scores, top):
        df.unpersist()


def ex_weblinks_phases(spark):
    """Phase split of web_links_and_host_pagerank (sf0.1): page synth +
    link extraction + host rollup vs the PR_ITERS-superstep pagerank."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod
    from jgtextrank_spark.algos.pagerank import pagerank
    from jgtextrank_spark.weblinks import host_edges, link_edges

    he = host_edges(
        link_edges(entrymod._synth_pages(spark, sf_dir))
    ).persist()
    t("host_edges (links+rollup)", lambda: he.count())
    t("host pagerank 20it", lambda: pagerank(
        he, max_iter=entrymod.PR_ITERS, tol=0.0, checkpoint_every=0
    ).collect())
    he.unpersist()


def ex_betweenness_levels(spark):
    """Per-level instrumented copy of the betweenness forward/backward
    sweeps on the 2M power-law graph (k=8) — where do the ~29s go?"""
    from pyspark.sql import DataFrame

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()
    adj = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(num_partitions, "src")
        .persist()
    )
    verts = (
        adj.select(F.col("src").alias("vertex"))
        .unionByName(adj.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    srcs = (
        verts.orderBy(F.md5(F.col("vertex").cast("string")), F.col("vertex"))
        .limit(8)
        .select(F.col("vertex").alias("s"))
        .localCheckpoint(eager=True)
    )
    n_sources = srcs.count()
    print(f"setup: {time.time()-t0:.2f}s n={n} sources={n_sources}")
    cur = (
        srcs.select("s", F.col("s").alias("v"), F.lit(1.0).alias("sigma"))
        .repartition(num_partitions, "s", "v")
        .localCheckpoint(eager=True)
    )
    levels = [cur]
    visited = cur.select("s", "v")
    depth = 0
    fwd = []
    while True:
        depth += 1
        t1 = time.time()
        newly = (
            cur.join(adj, cur["v"] == adj["src"])
            .select("s", F.col("dst").alias("nv"), "sigma")
            .groupBy("s", F.col("nv").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        c = newly.count()
        fwd.append((round(time.time() - t1, 2), c))
        if c == 0:
            break
        levels.append(newly)
        visited = visited.unionByName(newly.select("s", "v"))
        cur = newly
    print(f"forward levels (sec, frontier): {fwd}")
    bc_parts = []
    delta = levels[-1].select("s", "v", F.lit(0.0).alias("delta"))
    bwd = []
    for lvl in range(len(levels) - 1, 0, -1):
        t1 = time.time()
        bc_parts.append(delta)
        wd = levels[lvl].join(delta, ["s", "v"]).select(
            "s", F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"), "delta",
        )
        contrib = (
            wd.join(adj, wd["w"] == adj["dst"])
            .select("s", F.col("src").alias("v"), "sigma_w", "delta")
            .join(
                levels[lvl - 1].select(
                    "s", "v", F.col("sigma").alias("sigma_v")
                ),
                ["s", "v"],
            )
            .groupBy("s", "v")
            .agg(F.sum(
                F.col("sigma_v") / F.col("sigma_w")
                * (F.lit(1.0) + F.col("delta"))
            ).alias("delta"))
        )
        delta = (
            levels[lvl - 1].select("s", "v")
            .join(contrib, ["s", "v"], "left")
            .select("s", "v", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )
        bwd.append(round(time.time() - t1, 2))
    print(f"backward levels (sec): {bwd}")
    t1 = time.time()
    acc = bc_parts[0]
    for part in bc_parts[1:]:
        acc = acc.unionByName(part)
    bc = acc.groupBy("v").agg(
        (F.sum("delta") * F.lit(0.5 * n / n_sources)).alias("betweenness")
    )
    out = verts.join(bc, verts["vertex"] == bc["v"], "left").select(
        "vertex", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    nz = out.filter(F.col("betweenness") > 0).count()
    print(f"final agg: {time.time()-t1:.2f}s nonzero={nz}")
    adj.unpersist()
    edges.unpersist()


def ex_cc_inc_phases(spark):
    """Warm-start CC on the 200k chain: setup vs per-round walls."""
    from jgtextrank_spark.algos.components import connected_components_result

    n, n_delta = 200_000, 100
    base = spark.range(n - 1).filter(F.col("id") != n // 2).select(
        F.format_string("v%07d", F.col("id")).alias("src"),
        F.format_string("v%07d", F.col("id") + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    res_a = connected_components_result(base, checkpoint_every=0)
    prior = res_a.state.select(
        F.col("vertex").alias("id"), "label"
    ).localCheckpoint(eager=True)
    chords = spark.range(n_delta).select(
        F.format_string(
            "v%07d", F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n))
        ).alias("src"),
        F.format_string(
            "v%07d", F.pmod(F.xxhash64(F.col("id") * 2 + 2), F.lit(n))
        ).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    edges_b = base.unionByName(chords).localCheckpoint(eager=True)
    t0 = time.time()
    warm = connected_components_result(
        edges_b, checkpoint_every=0, init_labels=prior
    )
    wall = time.time() - t0
    steps = [m for m in warm.metrics if m["event"] == "step"]
    rounds_s = sum(m["wall_ms"] for m in steps) / 1000
    print(
        f"cc_inc warm: {wall:.2f}s rounds={warm.iterations} "
        f"rounds_sec={rounds_s:.2f} setup_sec={wall - rounds_s:.2f} "
        f"per-round={[round(m['wall_ms']/1000, 2) for m in steps]}"
    )


def ex_leiden_phases(spark):
    """Leiden budget-12 on the 2M power-law graph with per-phase walls
    (move levels vs refinement CC vs contraction)."""
    from jgtextrank_spark.algos import louvain as lv

    edges = synth_powerlaw_edges(spark, 200_000, 2_000_000).persist()
    edges.count()
    orig_move = lv.louvain_move_phase
    orig_refine = lv.refine_partition
    walls = []

    def timed_move(*a, **k):
        t1 = time.time()
        out = orig_move(*a, **k)
        walls.append(("move", round(time.time() - t1, 2), out[1]))
        return out

    def timed_refine(*a, **k):
        t1 = time.time()
        out = orig_refine(*a, **k)
        walls.append(("refine", round(time.time() - t1, 2), None))
        return out

    lv.louvain_move_phase = timed_move
    lv.refine_partition = timed_refine
    try:
        t0 = time.time()
        res = lv.leiden(edges, levels=2, max_rounds=12)
        print(
            f"leiden budget12: {time.time()-t0:.2f}s levels={res.levels} "
            f"rounds={res.rounds} phases={walls}"
        )
    finally:
        lv.louvain_move_phase = orig_move
        lv.refine_partition = orig_refine
    edges.unpersist()


def main():
    which = sys.argv[1:] or ["overhead"]
    spark = get()
    for name in which:
        globals()[f"ex_{name}"](spark)


if __name__ == "__main__":
    main()
