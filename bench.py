#!/usr/bin/env python
"""Headline benchmark for the jgtextrank_spark engine.

Prints ONE JSON line:
  {"metric": "pagerank_edges_per_sec_per_superstep", "value": N,
   "unit": "edges/sec", "queries": {...per-query seconds...}, "sf": ...}

The headline metric follows BASELINE.md: edges processed per second of
superstep wall time, measured on weighted PageRank run to convergence
(L1 delta < N*tol, tol=1e-6) over a deterministic synthetic power-law
edge table (the `documents` co-occurrence graph has a 31-token vocabulary
— correctness-sized, not throughput-sized; FIXTURES.md §4 prescribes the
synthetic power-law graph for throughput).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_EDGES / BENCH_VERTICES to resize the synthetic graph.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_powerlaw_edges(
    spark: SparkSession, n_vertices: int, n_edges: int, seed: int = 42
) -> DataFrame:
    """Deterministic skewed directed edge table (src, dst, weight).

    src ~ uniform over vertices; dst = floor(V * u^3) for u uniform from a
    hash — mass concentrates at low ids, giving power-law-ish in-degree
    hubs (the skew case the partitioning strategy must survive)."""
    ids = spark.range(n_edges)
    u_src = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_vertices))
    h = F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1_000_000_007))
    u = h.cast("double") / 1_000_000_007.0
    dst = F.floor(F.lit(float(n_vertices)) * F.pow(u, F.lit(3.0)))
    w = 1.0 + F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(5)).cast(
        "double"
    )
    return ids.select(
        u_src.cast("long").alias("src"),
        dst.cast("long").alias("dst"),
        w.alias("weight"),
    )


def bench_cc_star_chain(spark: SparkSession, n: int = 200_000) -> dict:
    """Large-star/small-star CC on an n-vertex chain — the adversarial
    diameter case. Reports rounds + per-round edge counts (contraction
    evidence: the edge set collapses toward one star)."""
    from jgtextrank_spark.algos.components import (
        connected_components_star_result,
    )

    edges = spark.range(n - 1).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    t0 = time.time()
    res = connected_components_star_result(edges, checkpoint_every=0)
    wall = time.time() - t0
    counts = [
        m.get("edges") for m in res.metrics if m.get("event") == "step"
    ]
    return {
        "chain_vertices": n,
        "rounds": res.iterations,
        "converged": res.converged,
        "wall_sec": round(wall, 3),
        "edge_counts_per_round": counts,
    }


def bench_cc_star_contraction(
    spark: SparkSession, n_vertices: int = 200_000, n_edges: int = 2_000_000
) -> dict:
    """Star CC on a dense-ish power-law graph: the edge set must CONTRACT
    per round (m -> ~n-1 star edges) — the property that makes the
    algorithm the scale path at 10^12 edges (a chain, being a tree, keeps
    n-1 edges throughout; this shows the m >> n collapse)."""
    from jgtextrank_spark.algos.components import (
        connected_components_star_result,
    )

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    m0 = edges.select(
        F.least("src", "dst"), F.greatest("src", "dst")
    ).distinct().count()
    t0 = time.time()
    res = connected_components_star_result(edges, checkpoint_every=0)
    wall = time.time() - t0
    edges.unpersist()
    counts = [
        m.get("edges") for m in res.metrics if m.get("event") == "step"
    ]
    return {
        "vertices": n_vertices,
        "initial_undirected_edges": m0,
        "rounds": res.iterations,
        "converged": res.converged,
        "wall_sec": round(wall, 3),
        "edge_counts_per_round": counts,
    }


def bench_coreness_hindex(
    spark: SparkSession, n_vertices: int = 200_000, n_edges: int = 2_000_000
) -> dict:
    """h-index core decomposition on the 2M-edge power-law graph — the
    superstep-harness scale path (constant per-round plan shape), vs the
    old k-by-k peeling whose round count grows with k_max."""
    from jgtextrank_spark.algos.centrality import core_numbers_hindex_result

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    t0 = time.time()
    res = core_numbers_hindex_result(edges, checkpoint_every=0)
    wall = time.time() - t0
    max_core = res.state.agg(F.max("h").alias("m")).collect()[0]["m"]
    edges.unpersist()
    return {
        "vertices": n_vertices,
        "rounds": res.iterations,
        "converged": res.converged,
        "wall_sec": round(wall, 3),
        "max_core": max_core,
    }


def bench_louvain(
    spark: SparkSession,
    n_vertices: int = 200_000,
    n_edges: int = 2_000_000,
    rounds: int = 4,
) -> dict:
    """Louvain local-move phase (fixed rounds) on the 2M-edge power-law
    graph: per-round cost is one neighbor-community aggregation + one
    per-vertex window argmax + one label join-back — constant plan shape
    per round (the single-window-pass move rule; see louvain.py)."""
    from jgtextrank_spark.algos.louvain import louvain_move_phase

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    t0 = time.time()
    comm, it, _conv, ms = louvain_move_phase(edges, fixed_rounds=rounds)
    n_comms = comm.select("community").distinct().count()
    wall = time.time() - t0
    edges.unpersist()
    return {
        "vertices": n_vertices,
        "rounds": it,
        "moves_per_round": [m["moved"] for m in ms],
        "communities": n_comms,
        "wall_sec": round(wall, 3),
    }


def bench_leiden(
    spark: SparkSession,
    n_vertices: int = 200_000,
    n_edges: int = 2_000_000,
    levels: int = 2,
    budgets: tuple = (2, 6, 12),
) -> dict:
    """Full Leiden loop (move + connectivity refinement + aggregate-on-
    refinement) on the 2M-edge power-law graph, measured as a
    BUDGET-VS-MODULARITY curve: one run per max_rounds budget, each
    reporting wall, per-level round counts, whether the no-move fixpoint
    was reached within budget, and the modularity Q of the returned
    partition. This is what tells a user of leiden() what a round budget
    buys at a given scale — the md5-gated synchronous rule activates
    half the vertices per round, so move counts decay geometrically and
    exact no-move convergence costs ~2x the half-budget wall for
    marginal Q (the curve quantifies 'marginal'). The headline wall is
    the largest budget's run. Refinement adds one CC run per level on
    the intra-community edge subset."""
    from jgtextrank_spark.algos.graphstats import modularity
    from jgtextrank_spark.algos.louvain import leiden

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    curve = []
    for budget in budgets:
        t0 = time.time()
        res = leiden(edges, levels=levels, max_rounds=budget)
        n_comms = res.assignment.select("community").distinct().count()
        wall = time.time() - t0
        q = modularity(
            edges,
            res.assignment.withColumnRenamed("community", "label"),
            weight_col=None,
        )
        curve.append(
            {
                "max_rounds": budget,
                "levels": res.levels,
                "rounds_per_level": res.rounds,
                "communities": n_comms,
                "converged": res.converged,
                "modularity": round(q, 6),
                "wall_sec": round(wall, 3),
            }
        )
    last = curve[-1]
    return {
        "vertices": n_vertices,
        "budget_curve": curve,
        "levels": last["levels"],
        "rounds_per_level": last["rounds_per_level"],
        "communities": last["communities"],
        "converged": last["converged"],
        "modularity": last["modularity"],
        "wall_sec": last["wall_sec"],
    }


def bench_hyperball(
    spark: SparkSession, n_vertices: int = 200_000, n_edges: int = 2_000_000,
    lg_k: int = 8,
) -> dict:
    """HyperBall neighborhood function on the 2M-edge power-law graph:
    per-superstep cost is O(E) HLL merges regardless of ball sizes — the
    property that lets the distance profile run at web scale. lg_k=8
    (~6.5% relative error, 256-register sketches) is the standard
    HyperBall operating point: each superstep ships one sketch per
    adjacency row through the union agg, so register size IS the
    shuffle-byte knob."""
    from jgtextrank_spark.algos.neighborhood import hyperball_result

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    t0 = time.time()
    res, n_t = hyperball_result(
        edges, max_iter=32, lg_k=lg_k, checkpoint_every=0
    )
    wall = time.time() - t0
    edges.unpersist()
    target = 0.9 * n_t[-1]
    eff = next((t for t, v in enumerate(n_t) if v >= target), len(n_t) - 1)
    return {
        "vertices": n_vertices,
        "rounds": res.iterations,
        "converged": res.converged,
        "wall_sec": round(wall, 3),
        "effective_diameter_0.9": eff,
        "n_t": [round(v) for v in n_t],
    }


def bench_scc_distributed(
    spark: SparkSession, n_vertices: int = 200_000, n_edges: int = 2_000_000
) -> dict:
    """Distributed SCC (trim + accelerated coloring + backward gather) on
    the power-law DIGRAPH — the generator yields the bow-tie regime: one
    giant SCC over the hub core plus ~1% acyclic tendril vertices that
    trim peels."""
    from jgtextrank_spark.algos.scc import strongly_connected_components

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    t0 = time.time()
    scc = strongly_connected_components(edges)
    n = scc.count()
    wall = time.time() - t0
    n_comp = scc.select("component").distinct().count()
    edges.unpersist()
    return {
        "vertices": n,
        "edges": n_edges,
        "components": n_comp,
        "wall_sec": round(wall, 3),
    }


def bench_salted_pagerank(
    spark: SparkSession, edges: DataFrame, iters: int = 5
) -> dict:
    """Fixed-iteration PageRank on the (hub-skewed) synthetic graph with
    and without explicit dst-salting: same scores (asserted to 1e-12 in
    tests), compare mean superstep wall."""
    from jgtextrank_spark.algos.pagerank import pagerank_result

    out = {}
    # salted runs FIRST so any residual JIT/cache warmup favours plain —
    # conservative for the salted claim
    for label, salt in (("salted8", 8), ("plain", 0)):
        res, _ = pagerank_result(
            edges, tol=0.0, max_iter=iters, checkpoint_every=0,
            truncate_every=3, salt_buckets=salt,
        )
        steps = [m for m in res.metrics if m["event"] == "step"]
        out[label] = round(
            sum(m["wall_ms"] for m in steps) / len(steps) / 1000.0, 3
        )
    return out


def bench_pagerank_convergence(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    absolute_delta: float = 1.0e-6,
    max_iter: int = 100,
) -> dict:
    """Converged PageRank on the synthetic graph; returns the headline
    throughput numbers.

    Convergence is the BASELINE criterion read literally: total L1 delta
    < 1e-6 (networkx's stop is err < N*tol, so we pass tol =
    absolute_delta / N). ~90 supersteps at alpha=0.85 — a meaty sample for
    the per-superstep throughput estimate."""
    from jgtextrank_spark.algos.pagerank import pagerank_result

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    real_edges = edges.count()
    t0 = time.time()
    res, n = pagerank_result(
        edges,
        tol=absolute_delta / max(1, n_vertices),
        max_iter=max_iter,
        checkpoint_every=0,
        truncate_every=3,
    )
    wall = time.time() - t0
    steps = [m for m in res.metrics if m["event"] == "step"]
    superstep_sec = sum(m["wall_ms"] for m in steps) / 1000.0
    # steady state: drop the first two supersteps (JIT warmup, first-touch
    # of the cached adjacency) — standard practice for per-iteration
    # throughput; the full mean is reported alongside.
    steady = steps[2:] if len(steps) > 4 else steps
    steady_mean = sum(m["wall_ms"] for m in steady) / len(steady) / 1000.0
    edges.unpersist()
    return {
        "vertices": n,
        "edges": real_edges,
        "supersteps": len(steps),
        "converged": res.converged,
        "total_sec": wall,
        "superstep_sec": superstep_sec,
        "mean_superstep_sec": superstep_sec / max(1, len(steps)),
        "steady_superstep_sec": steady_mean,
        "edges_per_sec_per_superstep": real_edges / steady_mean,
        "step_walls_sec": [round(m["wall_ms"] / 1000.0, 3) for m in steps],
        "final_delta": steps[-1]["delta"] if steps else None,
    }


def bench_warm_start(
    spark: SparkSession,
    n_vertices: int = 200_000,
    n_edges: int = 2_000_000,
) -> dict:
    """Incremental PageRank on a crawl delta: converge on snapshot A,
    perturb ~1% of edges (the typical recrawl churn), then converge on
    snapshot B cold vs warm-started from A's scores. The payoff metric
    is the superstep count — at web scale each saved superstep is a full
    pass over the adjacency."""
    from pyspark.sql import functions as F

    from jgtextrank_spark.algos.pagerank import pagerank_result

    edges_a = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges_a.count()
    # ~1% churn: bump the weight of edges whose (src+dst) hash lands in
    # one bucket of 100 (deterministic, no RNG state)
    churn = F.pmod(F.xxhash64("src", "dst"), F.lit(100)) == 0
    edges_b = edges_a.withColumn(
        "weight",
        F.when(churn, F.col("weight") * 3.0).otherwise(F.col("weight")),
    ).persist()
    edges_b.count()

    tol = 1.0e-6 / n_vertices
    res_a, _ = pagerank_result(
        edges_a, tol=tol, checkpoint_every=0, truncate_every=3
    )
    prior = res_a.state.select(
        F.col("vertex").alias("id"), "rank"
    ).localCheckpoint(eager=True)

    t0 = time.time()
    cold, _ = pagerank_result(
        edges_b, tol=tol, checkpoint_every=0, truncate_every=3
    )
    cold_wall = time.time() - t0
    t0 = time.time()
    warm, _ = pagerank_result(
        edges_b, tol=tol, checkpoint_every=0, truncate_every=3,
        init_scores=prior,
    )
    warm_wall = time.time() - t0
    edges_a.unpersist()
    edges_b.unpersist()
    cold_steps = len([m for m in cold.metrics if m["event"] == "step"])
    warm_steps = len([m for m in warm.metrics if m["event"] == "step"])
    return {
        "vertices": n_vertices,
        "edges": n_edges,
        "churned_edge_pct": 1.0,
        "cold_supersteps": cold_steps,
        "warm_supersteps": warm_steps,
        "cold_wall_sec": round(cold_wall, 3),
        "warm_wall_sec": round(warm_wall, 3),
        "superstep_savings_pct": round(
            100.0 * (1 - warm_steps / max(1, cold_steps)), 1
        ),
        "converged": bool(cold.converged and warm.converged),
    }


def bench_msf_powerlaw(
    spark: SparkSession, n_vertices: int = 200_000, n_edges: int = 2_000_000
) -> dict:
    """Borůvka MSF on the 2M-edge power-law graph with md5-perturbed
    distinct weights: O(log V) selection rounds, each one join+aggregate
    over the (static, shrinking-external) edge table; the contraction
    graphs are component-count-sized."""
    from jgtextrank_spark.algos.mst import boruvka_msf, msf_perturbed_weights

    edges = msf_perturbed_weights(
        synth_powerlaw_edges(spark, n_vertices, n_edges).withColumn(
            "weight", F.lit(1.0)
        )
    ).persist()
    edges.count()
    t0 = time.time()
    msf = boruvka_msf(edges).persist()
    n_forest = msf.count()
    wall = time.time() - t0
    edges.unpersist()
    msf.unpersist()
    return {
        "vertices": n_vertices,
        "input_edges": n_edges,
        "forest_edges": n_forest,
        "wall_sec": round(wall, 3),
    }


def bench_cc_incremental(
    spark: SparkSession, n: int = 200_000, n_delta: int = 100
) -> dict:
    """Incremental connected components on an insert-only delta: converge
    hash-min on a 200k-vertex chain (the adversarial-diameter case), add
    ``n_delta`` deterministic chord edges, then re-run cold vs warm
    (prior labels as state + virtual star edges). The warm run should
    close in O(1)-ish rounds regardless of the 200k diameter."""
    from pyspark.sql import functions as F

    from jgtextrank_spark.algos.components import (
        connected_components_result,
    )

    # TWO disjoint chains (the middle link is absent), so the chord
    # deltas genuinely MERGE components and the warm run has to
    # propagate a new minimum, not just re-verify old labels
    base = spark.range(n - 1).filter(
        F.col("id") != n // 2
    ).select(
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
    cold = connected_components_result(edges_b, checkpoint_every=0)
    cold_wall = time.time() - t0
    t0 = time.time()
    warm = connected_components_result(
        edges_b, checkpoint_every=0, init_labels=prior
    )
    warm_wall = time.time() - t0
    return {
        "chain_vertices": n,
        "delta_edges": n_delta,
        "cold_rounds": cold.iterations,
        "warm_rounds": warm.iterations,
        "cold_wall_sec": round(cold_wall, 3),
        "warm_wall_sec": round(warm_wall, 3),
        "converged": bool(cold.converged and warm.converged),
    }


def bench_betweenness_sampled(
    spark: SparkSession, n_vertices: int = 200_000,
    n_edges: int = 2_000_000, k: int = 8,
) -> dict:
    """Sampled Brandes betweenness (k deterministic md5 sources) on the
    2M-edge power-law graph: 2*diameter level-synchronous rounds over a
    (source, vertex)-keyed state — the estimator whose cost scales with
    k, not |V|, so the same plan runs at 10^12 edges with k unchanged."""
    from jgtextrank_spark.algos.betweenness import betweenness_sampled

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    t0 = time.time()
    out = betweenness_sampled(edges, k=k)
    nonzero = out.filter(F.col("betweenness") > 0).count()
    wall = time.time() - t0
    edges.unpersist()
    return {
        "vertices": n_vertices,
        "sources": k,
        "nonzero_vertices": nonzero,
        "wall_sec": round(wall, 3),
    }


def bench_ppr_multi_seed(
    spark: SparkSession, n_vertices: int = 200_000,
    n_edges: int = 2_000_000, n_seeds: int = 32, iters: int = 10,
) -> dict:
    """32 concurrent personalized PageRanks on the 2M-edge power-law
    digraph in ONE (seed, vertex)-keyed plan with the standard 1e-6
    score truncation — the related-pages batch shape (S is the
    throughput knob; plan count is independent of S)."""
    from jgtextrank_spark.algos.pagerank import pagerank_multi_seed

    edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    edges.count()
    seeds = [int(i * 997) % n_vertices for i in range(n_seeds)]
    t0 = time.time()
    out = pagerank_multi_seed(edges, seeds, max_iter=iters, min_score=1e-6)
    touched = out.count()
    wall = time.time() - t0
    edges.unpersist()
    return {
        "vertices": n_vertices,
        "seeds": n_seeds,
        "iters": iters,
        "state_rows": touched,
        "wall_sec": round(wall, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_vertices = int(os.environ.get("BENCH_VERTICES", "1000000"))
    n_edges = int(os.environ.get("BENCH_EDGES", "30000000"))

    from jgtextrank_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="jgtextrank-bench",
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    queries: dict[str, float] = {}

    import __spark_entry__ as entrymod

    def timed(name, fn):
        t0 = time.time()
        fn()
        queries[name] = round(time.time() - t0, 3)

    # headline: converged PageRank on the synthetic power-law graph
    pr = bench_pagerank_convergence(spark, n_vertices, n_edges)
    queries["pagerank_synth_converged"] = round(pr["total_sec"], 3)

    # skew path: explicit dst-salting vs plain on the same skewed graph
    salt_edges = synth_powerlaw_edges(spark, n_vertices, n_edges).persist()
    salt_edges.count()
    salted = bench_salted_pagerank(spark, salt_edges)
    salt_edges.unpersist()

    # adversarial-diameter CC (round count) + edge-contraction evidence
    cc_star = bench_cc_star_chain(spark)
    queries["cc_star_chain_200k"] = cc_star["wall_sec"]
    cc_contract = bench_cc_star_contraction(spark)
    queries["cc_star_powerlaw_2m"] = cc_contract["wall_sec"]

    # k-core on the same power-law scale (superstep-harness h-index path)
    kcore = bench_coreness_hindex(spark)
    queries["coreness_hindex_powerlaw_2m"] = kcore["wall_sec"]

    # distance profile (HyperBall sketches) on the same graph
    hb = bench_hyperball(spark)
    queries["hyperball_powerlaw_2m"] = hb["wall_sec"]

    # Louvain move phase on the same power-law scale
    louv = bench_louvain(spark)
    queries["louvain_powerlaw_2m"] = louv["wall_sec"]

    # full Leiden (move + refine + aggregate) on the same graph
    leid = bench_leiden(spark)
    queries["leiden_powerlaw_2m"] = leid["wall_sec"]

    # engine queries over the sf tables
    timed(
        "pagerank_docs_20it",
        lambda: entrymod.q_pagerank(spark, sf_dir).collect(),
    )
    timed(
        "textrank_keywords",
        lambda: entrymod.q_textrank_keywords(spark, sf_dir).collect(),
    )
    timed(
        "bpe_train_16",
        # 16 merge rounds: one corpus-scale word count, then vocab-sized
        # pair-count + fold-merge rounds (one scalar action each)
        lambda: __import__(
            "jgtextrank_spark.functions.bpe", fromlist=["bpe_train"]
        ).bpe_train(entrymod._docs(spark, sf_dir), merges=16).collect(),
    )
    timed(
        "components_per_doc",
        lambda: entrymod.q_components_per_doc(spark, sf_dir).count(),
    )
    timed(
        "triangle_count",
        lambda: entrymod.q_triangle_count(spark, sf_dir).collect(),
    )
    timed(
        "dedup_minhash_lsh",
        lambda: entrymod.q_dedup_minhash_lsh(spark, sf_dir).count(),
    )
    timed(
        "dedup_ngram_jaccard",
        lambda: entrymod.q_dedup_ngram_jaccard(spark, sf_dir).count(),
    )
    timed(
        "ann_cosine_topk",
        lambda: entrymod.q_ann_cosine_topk(spark, sf_dir).count(),
    )
    timed(
        "quality_and_langid",
        lambda: (
            entrymod.q_quality_score(spark, sf_dir).count(),
            entrymod.q_lang_id(spark, sf_dir).count(),
        ),
    )
    timed(
        "web_links_and_host_pagerank",
        lambda: entrymod.q_web_host_pagerank(spark, sf_dir).collect(),
    )
    timed(
        "scc_per_doc",
        lambda: entrymod.q_scc_per_doc(spark, sf_dir).count(),
    )
    timed(
        "link_prediction_web",
        lambda: entrymod.q_link_prediction(spark, sf_dir).count(),
    )
    timed(
        "curation_filters",
        lambda: (
            entrymod.q_repetition(spark, sf_dir).count(),
            entrymod.q_pii_scrub(spark, sf_dir).count(),
            entrymod.q_decontaminate(spark, sf_dir).count(),
        ),
    )

    timed(
        "duplicate_spans",
        lambda: entrymod.q_duplicate_spans(spark, sf_dir).count(),
    )
    timed(
        "bm25_topk",
        lambda: entrymod.q_bm25_topk(spark, sf_dir).count(),
    )
    timed(
        "dedup_clusters",
        lambda: entrymod.q_dedup_clusters(spark, sf_dir).count(),
    )
    timed(
        "skipgram_pairs",
        lambda: entrymod.q_skipgram_pairs(spark, sf_dir).count(),
    )
    timed(
        "node2vec_walks",
        lambda: entrymod.q_node2vec_walks(spark, sf_dir).count(),
    )
    timed(
        "msf_forest",
        lambda: entrymod.q_msf_forest(spark, sf_dir).count(),
    )

    # distributed SCC rounds on the 2M-edge power-law digraph (giant SCC
    # + ~1% tendrils under this generator — the bow-tie regime)
    scc_detail = bench_scc_distributed(spark)
    queries["scc_powerlaw_2m"] = scc_detail["wall_sec"]

    # incremental PageRank: warm-start superstep savings on a 1% delta
    warm_detail = bench_warm_start(spark)
    queries["pagerank_warm_start_2m"] = warm_detail["warm_wall_sec"]

    # incremental CC: insert-only delta on the adversarial chain
    cc_inc = bench_cc_incremental(spark)
    queries["cc_incremental_chain_200k"] = cc_inc["warm_wall_sec"]

    # Borůvka MSF on the 2M-edge power-law graph
    msf_detail = bench_msf_powerlaw(spark)
    queries["msf_powerlaw_2m"] = msf_detail["wall_sec"]

    # sampled Brandes betweenness (k=8 sources) on the same graph
    bw_detail = bench_betweenness_sampled(spark)
    queries["betweenness_k8_powerlaw_2m"] = bw_detail["wall_sec"]

    # 32 concurrent personalized PageRanks on the same digraph
    ppr_detail = bench_ppr_multi_seed(spark)
    queries["ppr_32seed_powerlaw_2m"] = ppr_detail["wall_sec"]

    # corpus-wide paragraph dedup + robots politeness over the sf tables
    timed(
        "paragraph_dedup",
        lambda: entrymod.q_paragraph_dedup(spark, sf_dir).count(),
    )
    timed(
        "robots_filter",
        lambda: entrymod.q_robots_filter(spark, sf_dir).count(),
    )
    timed(
        "cocitation_web",
        lambda: entrymod.q_cocitation(spark, sf_dir).count(),
    )

    detail = {
        "synthetic_graph": {
            "vertices": pr["vertices"],
            "edges": pr["edges"],
        },
        "supersteps": pr["supersteps"],
        "converged": pr["converged"],
        "mean_superstep_sec": round(pr["mean_superstep_sec"], 4),
        "final_delta": pr["final_delta"],
        "cpus": cpus,
        "salted_pagerank_mean_superstep_sec": salted,
        "cc_star_chain": cc_star,
        "cc_star_contraction": cc_contract,
        "coreness_hindex": kcore,
        "hyperball": hb,
        "louvain": louv,
        "leiden": leid,
        "scc_distributed": scc_detail,
        "pagerank_warm_start": warm_detail,
        "cc_incremental": cc_inc,
        "msf_powerlaw": msf_detail,
        "betweenness_sampled": bw_detail,
        "ppr_multi_seed": ppr_detail,
    }
    out = {
        "metric": "pagerank_edges_per_sec_per_superstep",
        "value": round(pr["edges_per_sec_per_superstep"], 1),
        "unit": "edges/sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "converged": pr["converged"],
        "supersteps": pr["supersteps"],
    }
    # Full detail goes to STDERR: the driver captures only the tail of
    # stdout, and round 4's single fat line scrolled the headline out of
    # the capture window ("parsed": null). Stdout stays exactly ONE
    # compact JSON line, printed last.
    print(json.dumps({**out, "detail": detail}), file=sys.stderr)
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
