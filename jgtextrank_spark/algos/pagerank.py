"""Weighted PageRank with exact networkx power-iteration semantics.

The reference ranks vertices with ``nx.pagerank(G, weight='weight',
max_iter=100, tol=1e-6)`` (``/root/reference/jgtextrank/core.py:798-799``).
networkx (>=3.0, scipy path) computes:

    A   : weighted adjacency, row-normalized by weighted out-degree
    x0  = p = uniform 1/N
    x'  = alpha * (x @ A + sum(x[dangling]) * p) + (1 - alpha) * p
    stop when  sum(|x' - x|) < N * tol

This module is that exact recurrence as one DataFrame job per superstep:

* ``norm_edges`` (src, dst, w/outdeg(src)) is computed once, hash-partitioned
  by ``src`` and cached — each superstep shuffles only the rank vector to the
  adjacency partitions (ranks are O(V), edges O(E) stay put).
* Dangling mass and the L1 convergence delta are **fused into a single
  aggregate** over the new state, so each superstep is exactly one action.
* State carries ``(vertex, rank, dangling)``; the superstep harness handles
  persistence, lineage truncation, checkpoint/resume and metrics.

For undirected graphs pass ``graph.symmetrize(edges)`` — matching how
networkx treats an undirected graph (each edge in both directions,
self-loops once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..supersteps import SuperstepResult, run_supersteps

__all__ = ["pagerank", "pagerank_result", "trustrank", "spam_mass"]


def pagerank_result(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    weight_col: str = "weight",
    num_partitions: int | None = None,
    checkpoint_every: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    broadcast_threshold: int = 2_000_000,
    truncate_every: int = 1,
    salt_buckets: int = 0,
    personalization: DataFrame | None = None,
    init_scores: DataFrame | None = None,
) -> tuple[SuperstepResult, int]:
    """Run PageRank, returning the full superstep result (state has columns
    ``vertex, rank, dangling, prev_rank``) plus N. ``edges`` are directed
    ``(src, dst, weight)``; ``vertices`` (one column ``id``) may add
    isolated vertices beyond those present in edges.

    ``personalization`` (columns ``id, weight``) makes it topic-sensitive
    PageRank with nx semantics: the teleport AND the dangling-mass
    redistribution follow the normalized weight vector instead of 1/n
    (vertices absent from the table get weight 0 — they receive rank
    only through links; ids absent from the GRAPH are ignored and do not
    enter the normalization sum, exactly as networkx builds p over its
    nodelist). The per-vertex weight rides the state as a
    column, so the superstep plan shape is unchanged: no extra join, the
    same single fused delta+dangle action.

    ``init_scores`` (columns ``id, rank``) warm-starts the power
    iteration from a prior run's scores (incremental recomputation after
    a crawl delta — see weblinks edge_diff): the fixpoint is unchanged,
    convergence just starts closer, so fewer supersteps. Missing ids get
    the uniform prior; the seed vector is renormalized to sum 1.

    ``salt_buckets > 0`` enables the explicit skew path for extreme hubs
    (SURVEY §4.2.2-4.2.3; degree >> E/partitions, e.g. 10^8-in-degree
    vertices in web graphs):

    * the cached adjacency is partitioned by ``(src, hash(dst) % S)``
      instead of ``src`` alone, so a hot *source* vertex's edges spread
      over S partitions; in the broadcast-rank regime the per-superstep
      contrib join stays map-only, so no partition sees more than ~1/S of
      a hub's edges (a straggler killer that AQE cannot fix for a cached,
      already-partitioned input);
    * contribution aggregation becomes an explicit two-stage
      ``(dst, hash(src) % S) -> dst`` tree: stage one bounds any single
      reducer partition to ~1/S of a hot *destination*'s messages, stage
      two merges S partials per dst. This does not rely on map-side
      partial aggregation staying effective (it degrades once the
      per-partition distinct-dst set blows the hash-agg budget and rows
      spill sorted).

    Sums are reassociated only (same addends per dst), so scores are
    bit-identical modulo float addition order — tests assert 1e-12
    agreement with the unsalted path and 1e-6 vs the oracle."""
    spark = edges.sparkSession
    sc = spark.sparkContext
    np_derived = num_partitions is None
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # one traversal of the (possibly expensive) input lineage: the vertex
    # union, the out-degree aggregate and the normalized adjacency below
    # all derive from this narrow cached projection instead of each
    # re-running the upstream pipeline (link extraction / tokenizer /
    # candidate generation). No-op when the caller already persisted the
    # edge table. Unpersisted once verts + norm_edges are filled.
    from ..graph import materialize_input

    ebase = materialize_input(edges, "src", "dst", weight_col)

    edge_ids = ebase.select(F.col("src").alias("id")).unionByName(
        ebase.select(F.col("dst").alias("id"))
    )
    if vertices is not None:
        edge_ids = edge_ids.unionByName(vertices.select("id"))
    verts = edge_ids.distinct()

    out_deg = ebase.groupBy("src").agg(F.sum(weight_col).alias("out_w"))

    verts = verts.join(
        out_deg.select(F.col("src").alias("id")).withColumn(
            "has_out", F.lit(True)
        ),
        "id",
        "left",
    ).select(
        F.col("id").alias("vertex"),
        F.coalesce("has_out", F.lit(False)).alias("has_out"),
    )
    if personalization is not None:
        # nx semantics: the vector is normalized over IN-GRAPH ids only
        # (networkx builds p over its nodelist, so weights of ids absent
        # from the graph never enter p.sum()). Restricting BEFORE the sum
        # keeps plain/encoded/nx identical even with out-of-graph ids.
        pmatched = personalization.select(
            F.col("id").alias("vertex"),
            F.col("weight").cast("double").alias("pw"),
        ).join(verts.select("vertex"), "vertex")
        psum = pmatched.agg(F.sum("pw").alias("s")).collect()[0]["s"]
        if not psum or psum <= 0:
            raise ValueError(
                "personalization weights (over ids present in the graph) "
                "must sum > 0"
            )
        verts = verts.join(
            pmatched.select(
                "vertex", (F.col("pw") / F.lit(psum)).alias("pv")
            ),
            "vertex",
            "left",
        ).select(
            "vertex", "has_out", F.coalesce("pv", F.lit(0.0)).alias("pv")
        )
    verts = verts.persist()
    n = verts.count()
    # scale-adaptive loop partitioning (guide §2): derive the cached
    # adjacency's partition count from the graph size instead of the
    # session constant — a 7-host or 31-token graph otherwise scans 32
    # near-empty cached partitions in every one of its supersteps (3
    # driver jobs x 32 tasks x tens of rounds of pure scheduling). Only
    # clamps DOWN for small graphs (<=64k vertices); big graphs keep the
    # configured width, and an explicit num_partitions wins either way.
    if np_derived and n <= 65536:
        num_partitions = min(num_partitions, max(1, n // 2048 + 1))

    # Rank vectors far smaller than the adjacency are broadcast into both
    # per-superstep joins: each superstep becomes map-only over the cached
    # edge partitions (no shuffle at all). Above the threshold, shuffle
    # joins against the pre-partitioned adjacency take over.
    bcast = n <= broadcast_threshold

    norm_edges = ebase.join(out_deg, "src").select(
        "src",
        "dst",
        (F.col(weight_col).cast("double") / F.col("out_w")).alias("nw"),
    )
    if salt_buckets > 0 and bcast:
        # hot-SOURCE spreading is only sound in the broadcast regime
        # (map-only contrib join). In the shuffle-join regime the plain
        # (src) partitioning is load-bearing: the per-superstep join on
        # src reuses the cached exchange, and (src, salt) partitioning
        # would force a full O(E) re-shuffle every superstep — strictly
        # worse than the skew it mitigates. There, salting applies to
        # the two-stage aggregation only (below).
        norm_edges = norm_edges.withColumn(
            "salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets))
        ).repartition(num_partitions, "src", "salt")
    else:
        norm_edges = norm_edges.repartition(num_partitions, "src")
    norm_edges = norm_edges.persist()
    norm_edges.count()  # materialize adjacency once
    ebase.unpersist()   # verts + norm_edges now hold everything the loop needs

    if n == 0:
        empty = verts.select(
            F.col("vertex"),
            F.lit(0.0).alias("rank"),
            F.lit(False).alias("dangling"),
        )
        return SuperstepResult(empty, 0, True, []), 0

    if init_scores is None:
        init = verts.select(
            "vertex",
            F.lit(1.0 / n).alias("rank"),  # nx starts uniform, even pers.
            (~F.col("has_out")).alias("dangling"),
            *([F.col("pv")] if personalization is not None else []),
        )
    else:
        # Warm start (incremental recomputation on crawl deltas): seed
        # the iteration from a prior run's scores. Vertices absent from
        # the prior snapshot get the uniform 1/n prior; the whole vector
        # is then renormalized to sum 1 so convergence lands on the SAME
        # fixpoint as a cold start (the stationary distribution is
        # init-independent) — only the superstep count changes. The
        # normalizer is one extra action at startup, not per superstep.
        seeded = verts.join(
            init_scores.select(
                F.col("id").alias("vertex"),
                F.col("rank").cast("double").alias("r0"),
            ),
            "vertex",
            "left",
        ).select(
            "vertex",
            "has_out",
            F.coalesce("r0", F.lit(1.0 / n)).alias("r0"),
            *([F.col("pv")] if personalization is not None else []),
        )
        rsum = seeded.agg(F.sum("r0").alias("s")).collect()[0]["s"]
        if not rsum or rsum <= 0:
            raise ValueError("init_scores must have positive total mass")
        init = seeded.select(
            "vertex",
            (F.col("r0") / F.lit(rsum)).alias("rank"),
            (~F.col("has_out")).alias("dangling"),
            *([F.col("pv")] if personalization is not None else []),
        ).localCheckpoint(eager=True)  # truncate the prior-join lineage

    def _b(df):
        return F.broadcast(df) if bcast else df

    # dangle mass of the *current* state, threaded between supersteps so
    # each superstep needs only one action (the fused delta+dangle agg).
    dangle_cache: dict[int, float] = {}

    def step(state: DataFrame, it: int) -> tuple[DataFrame, float]:
        if "cur" not in dangle_cache:
            row = state.agg(
                F.sum(F.when(F.col("dangling"), F.col("rank"))).alias("d")
            ).collect()[0]
            dangle_cache["cur"] = row["d"] or 0.0
        dangle_sum = dangle_cache["cur"]

        msgs = norm_edges.join(
            _b(state.select(F.col("vertex").alias("src"), "rank")), "src"
        )
        if salt_buckets > 0:
            # explicit two-stage tree aggregation: partials keyed by
            # (dst, hash(src) % S) bound any one reducer partition to
            # ~1/S of a hot destination's messages, then S partials merge.
            partial = msgs.withColumn(
                "rsalt", F.pmod(F.xxhash64("src"), F.lit(salt_buckets))
            ).groupBy("dst", "rsalt").agg(
                F.sum(F.col("nw") * F.col("rank")).alias("pcontrib")
            )
            contribs = partial.groupBy("dst").agg(
                F.sum("pcontrib").alias("contrib")
            )
        else:
            contribs = msgs.groupBy("dst").agg(
                F.sum(F.col("nw") * F.col("rank")).alias("contrib")
            )
        if personalization is None:
            base = F.lit(alpha * dangle_sum / n + (1.0 - alpha) / n)
            carry = []
        else:
            # teleport + dangling mass both follow p(v):
            # alpha*dangle*p + (1-alpha)*p = (alpha*dangle + 1-alpha)*p
            base = F.lit(alpha * dangle_sum + (1.0 - alpha)) * F.col("pv")
            carry = [F.col("pv")]
        # NOTE (measured, this round): fusing the contribution aggregation
        # into the state update (state rows unioned into the message
        # groupBy, dangling/prev_rank carried through max()) looked like
        # it should save the per-superstep contribs join-back, but at the
        # 30M-edge bench scale it ran 2-3x SLOWER per superstep: the
        # per-partition hash-agg buffer for ~1M distinct dsts per task is
        # already at the spill edge with one double-sized sum, and the
        # extra carried buffers pushed the partial aggregation into
        # sort-based fallback. The narrow groupBy(dst) + join-back below
        # is the right shape; keep the contribution aggregation's agg
        # buffer to exactly one double.
        new_state = (
            state.select(
                "vertex", "dangling", F.col("rank").alias("prev_rank"),
                *carry,
            )
            .join(_b(contribs), F.col("vertex") == F.col("dst"), "left")
            .select(
                "vertex",
                "dangling",
                (
                    F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))
                    + base
                ).alias("rank"),
                "prev_rank",
                *carry,
            )
        )
        # persist BEFORE the agg action so the state is computed once; the
        # harness's persist() of the returned df is then a no-op.
        new_state = new_state.persist()
        agg = new_state.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("delta"),
            F.sum(F.when(F.col("dangling"), F.col("rank"))).alias("dangle"),
        ).collect()[0]
        dangle_cache["cur"] = agg["dangle"] or 0.0
        return new_state, float(agg["delta"])

    result = run_supersteps(
        spark,
        init,
        step,
        max_iter=max_iter,
        tolerance=n * tol,
        checkpoint_every=checkpoint_every,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        label="pagerank",
        truncate_every=truncate_every,
    )
    verts.unpersist()
    norm_edges.unpersist()
    return result, n


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    encode_ids: bool = False,
    **kwargs,
) -> DataFrame:
    """PageRank scores: DataFrame ``(vertex, score)``.

    ``encode_ids=True`` dictionary-encodes string vertex ids to dense
    longs before the superstep loop and decodes after — the per-superstep
    shuffles then move 8-byte keys instead of URL/token strings. Scores
    are unaffected (PageRank has no id-order-dependent tie-breaks)."""
    if encode_ids:
        from ..graph import decode_scores, encode_vertices

        enc_edges, vdict = encode_vertices(edges, extra_vertices=vertices)
        init0 = kwargs.pop("init_scores", None)
        if init0 is not None:
            # translate warm-start ids through the same dictionary; ids
            # absent from the graph are dropped (they get the uniform
            # prior inside pagerank_result, same as the plain path).
            renamed0 = vdict.withColumnRenamed("token", "orig0")
            kwargs["init_scores"] = init0.join(
                renamed0, init0["id"] == renamed0["orig0"]
            ).select(renamed0["id"].alias("id"), init0["rank"])
        pers = kwargs.pop("personalization", None)
        if pers is not None:
            # translate personalization ids through the same dictionary.
            # The inner join drops ids absent from the graph — harmless,
            # because pagerank_result normalizes over in-graph ids only
            # (nx semantics), so plain and encoded stay identical.
            renamed = vdict.withColumnRenamed("token", "orig")
            kwargs["personalization"] = pers.join(
                renamed, pers["id"] == renamed["orig"]
            ).select(renamed["id"].alias("id"), pers["weight"])
        result, _ = pagerank_result(
            enc_edges, vdict.select("id"), alpha=alpha, max_iter=max_iter,
            tol=tol, **kwargs,
        )
        scores = result.state.select(
            "vertex", F.col("rank").alias("score")
        )
        return decode_scores(scores, vdict)
    result, _ = pagerank_result(
        edges, vertices, alpha=alpha, max_iter=max_iter, tol=tol, **kwargs
    )
    return result.state.select("vertex", F.col("rank").alias("score"))


def trustrank(
    edges: DataFrame, trusted: DataFrame, **kwargs
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): personalized
    PageRank whose teleport (and dangling-mass) vector is UNIFORM over a
    hand-vetted trusted seed set — trust flows out along links and decays
    with distance from the seeds. ``trusted`` has one column ``id``;
    seeds absent from the graph are ignored (nx normalization semantics).
    Returns ``(vertex, score)``. A thin, documented specialization of
    :func:`pagerank` — same superstep plan, same salting/encoding
    options via kwargs."""
    pers = trusted.select("id", F.lit(1.0).alias("weight"))
    return pagerank(edges, personalization=pers, **kwargs)


def spam_mass(
    edges: DataFrame, trusted: DataFrame, **kwargs
) -> DataFrame:
    """Relative spam mass (Gyöngyi et al. 2005, "Link Spam Detection
    Based on Mass Estimation"): ``(pr - trust) / pr`` per vertex, where
    ``pr`` is plain PageRank and ``trust`` is :func:`trustrank` from the
    seed set — the fraction of a page's rank NOT accounted for by trusted
    sources. Near 1 ⇒ rank comes from the untrusted web (spam-farm
    signature); near or below 0 ⇒ trust-dominated. Returns ``(vertex,
    pr, trust, spam_mass)``. Two superstep runs over the SAME cached
    adjacency shape; the final join is vertex-sized."""
    pr = pagerank(edges, **kwargs).withColumnRenamed("score", "pr")
    tr = trustrank(edges, trusted, **kwargs).withColumnRenamed(
        "score", "trust"
    )
    return pr.join(tr, "vertex").select(
        "vertex",
        "pr",
        "trust",
        ((F.col("pr") - F.col("trust")) / F.col("pr")).alias("spam_mass"),
    )


def pagerank_multi_seed(
    edges: DataFrame,
    seeds,
    alpha: float = 0.85,
    max_iter: int = 20,
    weight_col: str = "weight",
    num_partitions: int | None = None,
    dense: bool = False,
    min_score: float = 0.0,
) -> DataFrame:
    """S concurrent personalized PageRanks — one independent teleport
    vector per seed — vectorized in a single ``(seed, vertex)``-keyed
    state: ``(seed, vertex, score)``.

    This is the "related pages" workhorse (per-seed PPR is the usual
    SimRank stand-in at web scale): instead of S driver-looped solver
    runs, all S power iterations share one plan — the same
    multi-source-vectorization the betweenness module uses. nx
    semantics per seed: teleport mass AND dangling mass go entirely to
    the seed (personalization = {seed: 1}), so per-seed scores equal
    ``nx.pagerank(D, personalization={s: 1})`` at convergence.

    State stays SPARSE — a (seed, vertex) row exists only once the
    vertex is reachable from the seed; unreached vertices hold exactly
    0.0 forever (their teleport term is 0), so sparsity is lossless.
    ``dense=True`` fills the full seeds x vertices grid with 0.0 (the
    oracle-comparison mode).

    ``min_score > 0`` truncates the state after every round (rows below
    the threshold are dropped — the forward-push-style approximation
    every web-scale PPR system uses): per-seed L1 error is bounded by
    ``min_score * |dropped| * alpha/(1-alpha)`` and the state stops
    scaling with the full reach. 0.0 (default) is exact — the
    gate/parity mode.

    Fixed ``max_iter`` supersteps (the gate/bench contract; convergence
    at 0.85 is ~1e-7 by 60 rounds). Per-superstep: one contribution
    aggregation keyed (seed, vertex), one tiny per-seed dangling
    aggregate JOINED in-plan (never collected), lineage truncated every
    round (each round reads the state twice, so an unmaterialized chain
    would recompute exponentially). Scale: state is O(S * reach), shuffles
    are keyed by (seed, vertex) — S is the throughput knob exactly as
    in sampled betweenness."""
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    if isinstance(seeds, DataFrame):
        seed_df = seeds.select(F.col(seeds.columns[0]).alias("s")).distinct()
    else:
        seed_df = spark.createDataFrame(
            [(s,) for s in seeds], ["s"]
        ).distinct()
    seed_df = seed_df.localCheckpoint(eager=True)

    out_deg = edges.groupBy("src").agg(F.sum(weight_col).alias("out_w"))
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .unionByName(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dangling = verts.join(
        out_deg.select(F.col("src").alias("vertex")), "vertex", "left_anti"
    ).localCheckpoint(eager=True)
    # the dangling flag RIDES the state rows (attached to the adjacency's
    # dst side and to the seeds once, then forwarded by the per-round
    # aggregation) so the per-round dangling-mass aggregate is a filter
    # over the state instead of a join against the dangling table —
    # one join fewer per round, same sums (the flag is a per-vertex
    # constant). Guide §2.4: remove per-round work that can be
    # precomputed into the static side.
    ddang = dangling.select(F.col("vertex").alias("dst")).withColumn(
        "ddang", F.lit(True)
    )
    adjn = (
        edges.join(out_deg, "src")
        .join(ddang, "dst", "left")
        .select(
            "src",
            "dst",
            (F.col(weight_col) / F.col("out_w")).alias("prob"),
            F.coalesce("ddang", F.lit(False)).alias("ddang"),
        )
        .repartition(num_partitions, "src")
        .persist()
    )
    seed_dang = seed_df.join(
        dangling.select(F.col("vertex").alias("s")).withColumn(
            "sdang", F.lit(True)
        ),
        "s",
        "left",
    ).select(
        "s",
        # a seed absent from the graph has no out-edges recorded; it is
        # dangling exactly when it has no out_deg row, which the
        # left-anti dangling table only covers for in-graph ids — seeds
        # outside the graph never receive or emit contributions anyway,
        # so their flag only routes their own teleport mass back to the
        # per-seed dangling sum, matching the old join-with-dangling
        # behaviour (absent from `dangling` => not counted).
        F.coalesce("sdang", F.lit(False)).alias("sdang"),
    ).localCheckpoint(eager=True)

    state = seed_dang.select(
        "s",
        F.col("s").alias("vertex"),
        F.lit(1.0).alias("score"),
        F.col("sdang").alias("dang"),
    ).repartition(num_partitions, "s", "vertex").localCheckpoint(eager=True)

    for it in range(1, max_iter + 1):
        # the state grows from S rows to O(S * reach): never let a
        # stale size estimate broadcast it (the adjacency is the cached,
        # partitioned side) — force a shuffled hash join
        contrib = (
            state.hint("shuffle_hash")
            .join(adjn, state["vertex"] == adjn["src"])
            .select(
                "s",
                F.col("dst").alias("vertex"),
                (F.col("score") * F.col("prob") * F.lit(alpha)).alias(
                    "score"
                ),
                F.col("ddang").alias("dang"),
            )
        )
        dang = (
            state.filter(F.col("dang"))
            .groupBy("s")
            .agg(F.sum("score").alias("dm"))
        )
        seed_term = seed_dang.join(dang, "s", "left").select(
            "s",
            F.col("s").alias("vertex"),
            (
                F.lit(alpha) * F.coalesce(F.col("dm"), F.lit(0.0))
                + F.lit(1.0 - alpha)
            ).alias("score"),
            F.col("sdang").alias("dang"),
        )
        state = (
            contrib.unionByName(seed_term)
            .groupBy("s", "vertex")
            .agg(
                F.sum("score").alias("score"),
                F.max("dang").alias("dang"),
            )
        )
        if min_score > 0.0:
            state = state.filter(F.col("score") >= min_score)
        # each round reads `state` TWICE (contrib + dangling agg): an
        # unmaterialized chain would double per round — 2^k recompute
        # between checkpoints — so truncate lineage EVERY round
        state = state.localCheckpoint(eager=True)
    adjn.unpersist()
    out = state.select(F.col("s").alias("seed"), "vertex", "score")
    if dense:
        grid = seed_df.select(F.col("s").alias("seed")).crossJoin(verts)
        out = grid.join(out, ["seed", "vertex"], "left").select(
            "seed",
            "vertex",
            F.coalesce("score", F.lit(0.0)).alias("score"),
        )
    return out
