"""PageRank parity vs the networkx recurrence (numpy mirror oracle)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from jgtextrank_spark.algos.pagerank import pagerank, pagerank_result
from jgtextrank_spark.graph import symmetrize
from oracle.nxparity import pagerank_edges


def _make_edges_df(spark, edges, directed=True):
    df = spark.createDataFrame(
        [(str(s), str(d), float(w)) for s, d, w in edges],
        "src string, dst string, weight double",
    )
    return df if directed else symmetrize(df)


def _assert_allclose(spark_scores: dict, oracle: dict, atol=1e-6):
    assert set(spark_scores) == set(oracle)
    for k, v in oracle.items():
        assert abs(spark_scores[k] - v) <= atol, (
            k,
            spark_scores[k],
            v,
        )


def _collect(df):
    return {r["vertex"]: r["score"] for r in df.collect()}


def test_simple_chain(spark):
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (1, 3, 2.0)]
    got = _collect(pagerank(_make_edges_df(spark, edges)))
    want = pagerank_edges([(str(s), str(d), w) for s, d, w in edges])
    _assert_allclose(got, want)


def test_dangling_and_isolated(spark):
    # 4 is dangling (no out-edges), 9 is fully isolated.
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (1, 4, 0.5)]
    edf = _make_edges_df(spark, edges)
    vdf = spark.createDataFrame([("9",)], "id string")
    got = _collect(pagerank(edf, vertices=vdf))
    want = pagerank_edges(
        [(str(s), str(d), w) for s, d, w in edges], nodes=["9"]
    )
    _assert_allclose(got, want)


def test_undirected_with_selfloop(spark):
    edges = [(1, 2, 1.0), (2, 3, 1.0), (2, 2, 1.0), (3, 1, 1.0)]
    edf = _make_edges_df(spark, edges, directed=False)
    got = _collect(pagerank(edf))
    want = pagerank_edges(
        [(str(s), str(d), w) for s, d, w in edges], directed=False
    )
    _assert_allclose(got, want)


def test_random_graph_weighted(spark):
    rng = random.Random(42)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.uniform(0.5, 3.0))
        for _ in range(400)
    ]
    # collapse duplicate (s,d) like nx.DiGraph (last write wins)
    dedup = {}
    for s, d, w in edges:
        dedup[(s, d)] = w
    edges = [(s, d, w) for (s, d), w in dedup.items()]
    got = _collect(pagerank(_make_edges_df(spark, edges)))
    want = pagerank_edges([(str(s), str(d), w) for s, d, w in edges])
    _assert_allclose(got, want)


def test_convergence_metadata(spark):
    edges = [(1, 2, 1.0), (2, 1, 1.0)]
    res, n = pagerank_result(_make_edges_df(spark, edges))
    assert n == 2
    assert res.converged
    assert res.iterations >= 1
    steps = [m for m in res.metrics if m["event"] != "resume"]
    assert all(m["wall_ms"] > 0 for m in steps)
    assert steps[-1]["delta"] <= 2 * 1e-6


def test_checkpoint_resume(spark, tmp_path):
    rng = random.Random(7)
    n = 40
    dedup = {}
    for _ in range(250):
        dedup[(rng.randrange(n), rng.randrange(n))] = rng.uniform(0.5, 2.0)
    edges = [(s, d, w) for (s, d), w in dedup.items()]
    edf = _make_edges_df(spark, edges)

    ckpt = str(tmp_path / "pr_ckpt")
    # First run: stop early (budget 5 iters, checkpoint every 2).
    res1, _ = pagerank_result(
        edf, max_iter=5, checkpoint_every=2, checkpoint_dir=ckpt
    )
    assert not res1.converged
    # Second run resumes from superstep 4's checkpoint and converges.
    res2, n_v = pagerank_result(
        edf, max_iter=100, checkpoint_every=2, checkpoint_dir=ckpt
    )
    assert res2.converged
    assert any(m["event"] == "resume" for m in res2.metrics)
    got = {
        r["vertex"]: r["rank"]
        for r in res2.state.select("vertex", "rank").collect()
    }
    want = pagerank_edges([(str(s), str(d), w) for s, d, w in edges])
    for k, v in want.items():
        assert abs(got[k] - v) <= 1e-6


def test_personalized_pagerank_parity(spark):
    """Topic-sensitive PageRank vs the nx recurrence: teleport AND
    dangling mass follow the normalized personalization vector; vertices
    absent from the table get weight 0. Encoded path identical."""
    import networkx as nx

    from oracle.nxparity import pagerank_nx

    rng = random.Random(13)
    n = 40
    dedup = {}
    for _ in range(200):
        dedup[(rng.randrange(n), rng.randrange(n))] = rng.uniform(0.5, 2.0)
    dedup[(0, 777)] = 1.0  # 777 dangling: mass redistributes along p
    edges = [(s, d, w) for (s, d), w in dedup.items()]
    edf = _make_edges_df(spark, edges)
    # deterministic non-uniform weights on a strict subset of vertices
    pers = {str(v): float(1 + v % 5) for v in range(0, n, 2)}
    pdf = spark.createDataFrame(
        list(pers.items()), "id string, weight double"
    )
    G = nx.DiGraph()
    for s, d, w in edges:
        G.add_edge(str(s), str(d), weight=w)
    want = pagerank_nx(G, personalization=pers)
    got = _collect(pagerank(edf, personalization=pdf))
    _assert_allclose(got, want)
    # encode_ids path translates personalization ids through the dict
    got_enc = _collect(pagerank(edf, personalization=pdf, encode_ids=True))
    _assert_allclose(got_enc, got, atol=1e-12)
    # ids ABSENT from the graph are ignored — nx normalizes p over its
    # nodelist only, so phantom weights must not dilute the vector;
    # plain and encoded paths must agree with nx AND each other
    pers_phantom = dict(pers, **{"no-such-vertex": 99.0, "ghost": 7.0})
    pdf2 = spark.createDataFrame(
        list(pers_phantom.items()), "id string, weight double"
    )
    got_ph = _collect(pagerank(edf, personalization=pdf2))
    _assert_allclose(got_ph, want)
    got_ph_enc = _collect(
        pagerank(edf, personalization=pdf2, encode_ids=True)
    )
    _assert_allclose(got_ph_enc, got_ph, atol=1e-12)
    # degenerate: all-zero weight table raises
    zero = spark.createDataFrame([("0", 0.0)], "id string, weight double")
    with pytest.raises(Exception, match="sum > 0"):
        pagerank(edf, personalization=zero)
    # degenerate: positive weights but none in the graph also raises
    allout = spark.createDataFrame(
        [("ghost", 5.0)], "id string, weight double"
    )
    with pytest.raises(Exception, match="sum > 0"):
        pagerank(edf, personalization=allout)


def test_warm_start_same_fixpoint_fewer_supersteps(spark):
    """init_scores warm start: identical converged scores (1e-6), fewer
    supersteps when seeding from a near-identical graph's solution —
    the incremental-recompute path for crawl deltas."""
    rng = random.Random(11)
    n = 80
    dedup = {}
    for _ in range(600):
        dedup[(rng.randrange(n), rng.randrange(n))] = rng.uniform(0.5, 2.0)
    edges_a = [(s, d, w) for (s, d), w in dedup.items()]
    # snapshot B: perturb a handful of edges
    dedup[(0, 1)] = 5.0
    dedup[(2, 3)] = 0.1
    edges_b = [(s, d, w) for (s, d), w in dedup.items()]

    res_a, _ = pagerank_result(_make_edges_df(spark, edges_a))
    prior = res_a.state.select(
        F.col("vertex").alias("id"), "rank"
    ).localCheckpoint(eager=True)

    cold, _ = pagerank_result(_make_edges_df(spark, edges_b))
    warm, _ = pagerank_result(
        _make_edges_df(spark, edges_b), init_scores=prior
    )
    assert warm.converged and cold.converged
    assert warm.iterations < cold.iterations
    c = {r["vertex"]: r["rank"] for r in cold.state.collect()}
    w = {r["vertex"]: r["rank"] for r in warm.state.collect()}
    assert set(c) == set(w)
    for v in c:
        assert abs(c[v] - w[v]) < 5e-6, v


def test_warm_start_new_vertices_get_uniform_prior(spark):
    # prior covers only part of the graph + one out-of-graph id; the run
    # must still converge to the cold-start fixpoint
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 1.0)]
    prior = spark.createDataFrame(
        [("1", 0.9), ("2", 0.1), ("99", 4.0)], ["id", "rank"]
    )
    cold, _ = pagerank_result(_make_edges_df(spark, edges))
    warm, _ = pagerank_result(_make_edges_df(spark, edges), init_scores=prior)
    c = {r["vertex"]: r["rank"] for r in cold.state.collect()}
    w = {r["vertex"]: r["rank"] for r in warm.state.collect()}
    for v in c:
        assert abs(c[v] - w[v]) < 5e-6, v


def test_warm_start_encoded_matches_plain(spark):
    edges = [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (1, 3, 0.5)]
    prior = spark.createDataFrame([("2", 0.7), ("3", 0.3)], ["id", "rank"])
    plain = {
        r["vertex"]: r["score"]
        for r in pagerank(
            _make_edges_df(spark, edges), init_scores=prior
        ).collect()
    }
    enc = {
        r["vertex"]: r["score"]
        for r in pagerank(
            _make_edges_df(spark, edges), init_scores=prior, encode_ids=True
        ).collect()
    }
    assert set(plain) == set(enc)
    for v in plain:
        assert abs(plain[v] - enc[v]) < 1e-9, v


def test_warm_start_zero_mass_raises(spark):
    edges = [(1, 2, 1.0), (2, 1, 1.0)]
    bad = spark.createDataFrame([("1", -1.0), ("2", 0.0)], ["id", "rank"])
    with pytest.raises(Exception):
        pagerank_result(_make_edges_df(spark, edges), init_scores=bad)
