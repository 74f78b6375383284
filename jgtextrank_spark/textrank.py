"""TextRank keyword pipeline: solve -> top-T -> collapse -> MWT weighting.

DataFrame re-expression of the reference post-processing
(/root/reference/jgtextrank/core.py:711-872, metrics.py:160-369):

* **top-T**: ``top_t = round(N_scored * top_p)`` (Python banker's rounding,
  core.py:858-862); ties at the boundary broken by vertex id (the reference
  inherits dict insertion order — unstable across runs; we are
  deterministic).
* **collapse** (core.py:902-936): gaps-and-islands over the *flattened*
  original token stream — runs cross sentence AND document boundaries, and
  a keyword run that touches the very end of the stream is DROPPED (the
  reference never flushes its last buffer). Both quirks reproduced.
* **MWT weighting** (metrics.py:160-300): all 15 weight_comb variants.
  Within-term repetition normalization means: sum-score = sum of *distinct*
  member scores; max-score = max over distinct members of score/multiplicity.
  sigma for gaussian_norm = population stddev of candidate lengths over ALL
  candidate occurrences (before the top-T connection filter). Final scores
  ``round(x, 5)`` with HALF_EVEN (= Python round) via ``bround``.
* **gcvalue** (metrics.py:303-369): token-set containment self-join via an
  exploded inverted-index join (scale path for the reference's O(C^2)
  nested loop); longer-term multiplicity counts occurrences.

Collapse parity mode uses one global ordering window (fine per document /
small corpora — exactly the reference's regime); ``per_doc=True`` keeps
islands within documents and distributes fully (the scalable mode).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .corpus import explode_tokens
from .graph import cooccurrence_edges, symmetrize, vertices_from_sentences

__all__ = [
    "solve_scores",
    "top_t_vertices",
    "collapse_candidates",
    "weigh_candidates",
    "keywords_from_sentences",
    "SOLVERS",
]

SOLVERS = [
    "pagerank",
    "pagerank_numpy",
    "pagerank_scipy",
    "degree_centrality",
    "neighborhood_size",
    "TeRGraph",
    "coreness",
    "clustering_coefficient",
    "hits",
    "eigenvector_centrality",
    "katz_centrality",
    "betweenness_centrality",
    "edge_betweenness_centrality",
    "closeness_centrality",
    "load_centrality",
    "current_flow_closeness",
    "current_flow_betweenness",
    "edge_current_flow_betweenness",
    "communicability_betweenness",
]

WEIGHT_COMBS = [
    "avg", "norm_avg", "log_norm_avg", "gaussian_norm_avg", "len_log_norm_avg",
    "sum", "norm_sum", "log_norm_sum", "gaussian_norm_sum", "len_log_norm_sum",
    "max", "norm_max", "log_norm_max", "gaussian_norm_max", "len_log_norm_max",
    "gcvalue",
]


def solve_scores(
    edges: DataFrame,
    vertices: DataFrame,
    solver: str = "pagerank",
    max_iter: int = 100,
    tol: float = 1.0e-6,
    directed: bool = False,
    **solver_kwargs,
) -> DataFrame:
    """Dispatch to the graph solvers; returns (vertex, score). ``edges`` is
    the canonical undirected co-occurrence edge table.

    ``directed=True`` mirrors the reference's ``to_directed()`` graph
    (core.py:516-517): the *same* edge set with every edge as a pair of
    reciprocal arcs. For the power-iteration solvers (pagerank family,
    hits, eigenvector, katz) and the neighbour-set solvers
    (neighborhood_size, TeRGraph) that digraph is provably
    score-identical to the undirected graph (the adjacency matrix /
    successor sets are the same), so they run unchanged;
    degree_centrality uses networkx's in+out directed degree; the
    remaining solvers have genuinely different directed semantics in
    networkx and raise rather than silently returning undirected scores.
    """
    from .algos import centrality as C
    from .algos.pagerank import pagerank
    from .algos.smallgraph import nx_fallback_scores

    if directed and solver not in (
        "pagerank", "pagerank_numpy", "pagerank_scipy", "hits",
        "eigenvector_centrality", "katz_centrality", "degree_centrality",
        "neighborhood_size", "TeRGraph",
    ):
        raise ValueError(
            f"directed=True is not supported for solver {solver!r} (its "
            "networkx directed semantics differ; run undirected or use "
            "the dedicated algos module)"
        )
    if solver in ("pagerank", "pagerank_numpy", "pagerank_scipy"):
        # numpy/scipy variants are removed in networkx >= 3; all three are
        # the same converged power iteration (SURVEY.md §4.3).
        return pagerank(
            symmetrize(edges), vertices=vertices, max_iter=max_iter, tol=tol,
            **solver_kwargs,
        )
    if solver == "degree_centrality":
        return C.degree_centrality(edges, vertices, directed=directed)
    if solver == "neighborhood_size":
        return C.neighborhood_size(edges, vertices)
    if solver == "TeRGraph":
        return C.tergraph(edges, vertices)
    if solver == "coreness":
        return C.core_numbers(edges, vertices).select(
            "vertex", F.col("core").cast("double").alias("score")
        )
    if solver == "clustering_coefficient":
        from .algos.triangles import clustering_coefficient

        # nx.clustering on the co-occurrence graph (self-loops contribute
        # nothing in nx.clustering's triangle formula)
        cc = clustering_coefficient(edges)
        return vertices.join(
            cc, vertices["id"] == cc["vertex"], "left"
        ).select(
            vertices["id"].alias("vertex"),
            F.coalesce("clustering", F.lit(0.0)).alias("score"),
        )
    if solver == "hits":
        h = C.hits(
            symmetrize(edges), vertices=vertices, max_iter=max_iter, tol=tol
        )
        # reference avg_dicts(hubs, authorities): per-vertex mean
        return h.select(
            "vertex",
            ((F.col("hub") + F.col("authority")) / 2.0).alias("score"),
        )
    if solver == "eigenvector_centrality":
        return C.eigenvector_centrality(
            symmetrize(edges), vertices=vertices, max_iter=max_iter, tol=tol
        )
    if solver == "katz_centrality":
        return C.katz_centrality(
            symmetrize(edges), vertices=vertices, tol=tol, **solver_kwargs
        )
    # all-pairs / linear-algebra family -> driver fallback (documented)
    return nx_fallback_scores(edges, solver, vertices=vertices)


def top_t_vertices(
    scores: DataFrame, top_p: float = 0.3, top_t: int | None = None
) -> DataFrame:
    """Top-T scored vertices (vertex, score). T = round(N * top_p) with
    banker's rounding when not given (core.py:858-862)."""
    if top_t is None:
        n = scores.count()
        top_t = int(round(n * top_p))  # Python banker's rounding, as ref
    return scores.orderBy(
        F.desc("score"), F.asc("vertex")
    ).limit(int(top_t))


def collapse_candidates(
    sentences: DataFrame,
    scores: DataFrame,
    per_doc: bool = False,
) -> DataFrame:
    """Candidate terms: maximal runs of adjacent *scored* tokens in the
    original normalized token stream. Returns one row per occurrence:
    (cand_id, term_tokens array<string>, term string, n_tokens).

    ``per_doc=False`` reproduces the reference exactly (global stream,
    trailing-run drop); ``per_doc=True`` is the scalable variant (runs
    bounded by documents, windows partitioned by url).
    """
    toks = explode_tokens(sentences, "tokens")
    if per_doc:
        order_win = Window.partitionBy("url").orderBy("sent_id", "pos")
    else:
        order_win = Window.orderBy("url", "sent_id", "pos")

    kw = scores.select(F.col("vertex").alias("token")).distinct()
    marked = toks.join(
        kw.withColumn("is_kw", F.lit(True)), "token", "left"
    ).withColumn("is_kw", F.coalesce("is_kw", F.lit(False)))

    marked = marked.withColumn("gpos", F.row_number().over(order_win))
    marked = marked.withColumn(
        "grp",
        F.sum(F.when(~F.col("is_kw"), 1).otherwise(0)).over(
            order_win.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    part_cols = ["url", "grp"] if per_doc else ["grp"]
    islands = (
        marked.filter(F.col("is_kw"))
        .groupBy(*part_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("gpos", "token"))
            ).alias("run"),
            F.max("gpos").alias("end_gpos"),
        )
        .withColumn(
            "term_tokens", F.transform("run", lambda x: x["token"])
        )
    )
    if not per_doc:
        # reference quirk: the final buffer is never flushed -> a keyword
        # run touching the end of the stream is dropped (core.py:926-934)
        total = marked.agg(F.max("gpos").alias("m"))
        islands = islands.join(F.broadcast(total)).filter(
            F.col("end_gpos") != F.col("m")
        )
    return islands.select(
        F.monotonically_increasing_id().alias("cand_id"),
        "term_tokens",
        F.concat_ws(" ", "term_tokens").alias("term"),
        F.size("term_tokens").alias("n_tokens"),
    )


def _member_scores(candidates: DataFrame, scores: DataFrame) -> DataFrame:
    """Per candidate aggregates of member-vertex scores with within-term
    multiplicity normalization: (cand_id, sum_score, max_score)."""
    ex = candidates.select(
        "cand_id", F.explode("term_tokens").alias("token")
    )
    per_tok = ex.groupBy("cand_id", "token").agg(
        F.count(F.lit(1)).alias("k")
    )
    joined = per_tok.join(
        scores.select(F.col("vertex").alias("token"), "score"), "token"
    )
    return joined.groupBy("cand_id").agg(
        F.sum("score").alias("sum_score"),  # k * (score/k) summed = score
        F.max(F.col("score") / F.col("k")).alias("max_score"),
    )


def _gvalue_expr(weight_comb: str, mu: int):
    """The 15-way weight_comb expression over columns sum_score, max_score,
    n_tokens, sigma (metrics.py:172-229)."""
    n = F.col("n_tokens").cast("double")
    avg = F.col("sum_score") / n
    smm = F.col("sum_score")
    mx = F.col("max_score")
    log2a = F.log2(n + 0.1)

    def log_norm(base):
        return F.when(n > 1, base / (F.log(n) / math.log(mu))).otherwise(base)

    def gaussian_norm(base):
        sigma = F.col("sigma")
        pd = (
            1.0
            / (sigma * math.sqrt(2 * math.pi))
            * F.exp(-F.pow(n - mu, F.lit(2.0)) / (2.0 * sigma * sigma))
        )
        return base * (1.0 - pd)

    table = {
        "avg": avg,
        "norm_avg": avg / n,
        "log_norm_avg": log_norm(avg),
        "gaussian_norm_avg": gaussian_norm(avg),
        "len_log_norm_avg": log2a * avg,
        "sum": smm,
        "norm_sum": smm / n,
        "log_norm_sum": log_norm(smm),
        "gaussian_norm_sum": gaussian_norm(smm),
        "len_log_norm_sum": log2a * smm,
        "max": mx,
        "norm_max": mx / n,
        "log_norm_max": log_norm(mx),
        "gaussian_norm_max": gaussian_norm(mx),
        "len_log_norm_max": log2a * mx,
    }
    if weight_comb not in table:
        raise ValueError(f"Unsupported weight combination: {weight_comb!r}")
    # round(x, 5) half-even == Python round (metrics.py:229)
    return F.bround(table[weight_comb], 5)


def weigh_candidates(
    candidates: DataFrame,
    scores: DataFrame,
    top_t: DataFrame,
    weight_comb: str = "norm_max",
    mu: int = 5,
) -> DataFrame:
    """Candidate occurrences + vertex scores -> distinct (term, score),
    keeping only candidates containing a top-T vertex."""
    if weight_comb == "gcvalue":
        return _gcvalue(candidates, scores, top_t)

    candidates = candidates.persist()
    # sigma over ALL candidate occurrences, population stddev
    # (metrics.py:244-252), computed before the top-T connection filter
    sigma = 0.0
    if "norm" in weight_comb:
        row = candidates.agg(
            F.stddev_pop(F.col("n_tokens").cast("double")).alias("s")
        ).collect()[0]
        sigma = row["s"] or 0.0

    kept = _filter_top_t_connected(candidates, top_t)
    member = _member_scores(kept, scores)
    out = (
        kept.join(member, "cand_id")
        .withColumn("sigma", F.lit(float(sigma)))
        .withColumn("g", _gvalue_expr(weight_comb, mu))
        .select("term", F.col("g").alias("score"))
        .dropDuplicates(["term"])
    )
    return out


def _filter_top_t_connected(
    candidates: DataFrame, top_t: DataFrame
) -> DataFrame:
    """Keep candidates whose token list contains >= 1 top-T vertex
    (metrics.py:231-239). Distributed as explode + semi-join (top-T can be
    millions of vertices at web scale; no literal IN-list)."""
    ex = candidates.select(
        "cand_id", F.explode("term_tokens").alias("token")
    )
    hit = ex.join(
        top_t.select(F.col("vertex").alias("token")), "token", "left_semi"
    ).select("cand_id").distinct()
    return candidates.join(hit, "cand_id", "left_semi")


def _gcvalue(
    candidates: DataFrame, scores: DataFrame, top_t: DataFrame
) -> DataFrame:
    """GCValue (metrics.py:303-369). longer(a) = candidates b (counted per
    occurrence) with token-set(a) ⊆ token-set(b), list(a) != list(b).
    gcvalue(a) = log2(|a|+0.1) * (g(a) - mean over longer-occurrences g(b)),
    g = len_log_norm_avg (already rounded to 5 before combining, as ref)."""
    candidates = candidates.persist()
    member = _member_scores(candidates, scores)
    g = (
        candidates.join(member, "cand_id")
        .withColumn("sigma", F.lit(0.0))
        .withColumn("g", _gvalue_expr("len_log_norm_avg", 5))
        .select("cand_id", "term", "term_tokens", "n_tokens", "g")
        .persist()
    )
    # distinct surface forms with occurrence counts
    forms = g.groupBy("term").agg(
        F.first("term_tokens").alias("term_tokens"),
        F.first("n_tokens").alias("n_tokens"),
        F.first("g").alias("g"),
        F.count(F.lit(1)).alias("occ"),
    ).withColumn(
        "tok_set", F.array_distinct(F.array_sort("term_tokens"))
    ).persist()

    # Containment join (a ⊆ b) via rarest-token prefix filtering: every
    # superset of a must contain a's globally rarest token, so indexing a
    # ONLY under that token generates a complete candidate set whose size
    # is Σ_a df(rarest(a)) — immune to stopword-like hot tokens, which
    # would make a full inverted-index join quadratic (a token present in
    # every candidate → C² intermediate rows). Exact verification is a
    # per-row array_except check, no second join.
    tok_df = (
        forms.select(F.explode("tok_set").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_"))
    )
    a_min = (
        forms.select(
            F.col("term").alias("a_term"),
            F.col("tok_set").alias("a_set"),
            F.col("term_tokens").alias("a_tokens"),
            F.explode("tok_set").alias("token"),
        )
        .join(tok_df, "token")
        .groupBy("a_term")
        .agg(
            F.first("a_set").alias("a_set"),
            F.first("a_tokens").alias("a_tokens"),
            F.min_by("token", F.struct("df_", "token")).alias("token"),
        )
    )
    b_ex = forms.select(
        F.col("term").alias("b_term"),
        F.col("term_tokens").alias("b_tokens"),
        F.col("tok_set").alias("b_set"),
        F.col("g").alias("b_g"),
        F.col("occ").alias("b_occ"),
        F.explode("tok_set").alias("token"),
    )
    containing = (
        a_min.join(b_ex, "token")
        .filter(F.size(F.array_except("a_set", "b_set")) == 0)
        # list inequality (ref uses term != longer_term on token LISTS)
        .filter(F.col("a_tokens") != F.col("b_tokens"))
    )
    longer_agg = containing.groupBy("a_term").agg(
        F.sum("b_occ").alias("p_ta"),
        F.sum(F.col("b_g") * F.col("b_occ")).alias("sum_gb"),
    )

    kept = _filter_top_t_connected(candidates, top_t).select("term").distinct()
    out = (
        forms.join(kept, "term", "left_semi")
        .join(longer_agg, forms["term"] == longer_agg["a_term"], "left")
        .withColumn("log2a", F.log2(F.col("n_tokens").cast("double") + 0.1))
        .withColumn(
            "score",
            F.bround(
                F.when(
                    F.col("p_ta").isNotNull(),
                    F.col("log2a")
                    * (F.col("g") - F.col("sum_gb") / F.col("p_ta")),
                ).otherwise(F.col("log2a") * F.col("g")),
                5,
            ),
        )
        .select("term", "score")
    )
    return out


def keywords_from_sentences(
    sentences: DataFrame,
    window: int = 2,
    top_p: float = 0.3,
    top_t: int | None = None,
    directed: bool = False,
    weighted: bool = False,
    conn_with_original_ctx: bool = True,
    max_iter: int = 100,
    tol: float = 1.0e-6,
    solver: str = "pagerank",
    weight_comb: str = "norm_max",
    mu: int = 5,
    per_doc_collapse: bool = False,
    **solver_kwargs,
) -> DataFrame:
    """Full pipeline mirror of
    ``_keywords_extraction_from_preprocessed_context`` (core.py:711-872):
    sentences -> co-occurrence graph -> solver -> top-T -> collapse ->
    weigh. Returns (term, score) ordered by score desc, term asc."""
    if solver not in SOLVERS:
        raise ValueError(f"Unsupported solver: {solver!r}")
    if weighted:
        raise ValueError(
            "weighted=True is unsupported in the reference pipeline "
            "(core.py:939-942); use cooccurrence_edges(weighted=True) for "
            "the generalized engine."
        )
    # NOTE (measured, r6): the sentence frame is read three times below
    # (edges, vertex universe, collapse), but persisting it is a small net
    # LOSS at sf0.1 cold AND warm (A/B 2x2 cold sessions: persist
    # 20.3/20.0s vs nopersist 19.6/18.1s; warm interleaved avg 9.37 vs
    # 8.75s) — caching the wide nested tagged frame costs more than
    # re-running the Arrow tagger on warm workers. Left unpersisted.
    edges = cooccurrence_edges(
        sentences,
        window=window,
        conn_with_original_ctx=conn_with_original_ctx,
        weighted=False,
    ).persist()
    vertices = vertices_from_sentences(sentences).persist()
    scores = solve_scores(
        edges, vertices, solver=solver, max_iter=max_iter, tol=tol,
        directed=directed, **solver_kwargs,
    ).persist()
    top = top_t_vertices(scores, top_p=top_p, top_t=top_t).persist()
    cands = collapse_candidates(sentences, scores, per_doc=per_doc_collapse)
    weighted_terms = weigh_candidates(
        cands, scores, top, weight_comb=weight_comb, mu=mu
    )
    return weighted_terms.orderBy(F.desc("score"), F.asc("term"))
