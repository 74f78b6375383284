"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the full corpus; dot products via ``zip_with``/``aggregate``
  (JVM-side, no Python); per-query top-k with a window. The baseline /
  verifier.
* ``lsh_topk`` — the scale path: deterministic sign-pattern bucketing on a
  prefix of dimensions (an LSH family for cosine on centered data);
  queries probe only their bucket + optional neighbouring buckets within
  hamming distance 1. Recall < 1 by construction; the exact path is the
  oracle for measuring it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "lsh_topk", "ivf_topk", "pq_topk", "ivfpq_topk"]


def _norm_cols(df: DataFrame, id_col: str, vec_col: str, prefix: str):
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        v.alias(f"{prefix}_vec"),
        F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias(f"{prefix}_nrm"),
    )


def _cosine(a_vec: str, b_vec: str, a_nrm: str, b_nrm: str):
    dot = F.aggregate(
        F.zip_with(a_vec, b_vec, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(a_nrm) * F.col(b_nrm))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """(q_id, n_id, cosine, rank): exact top-k corpus neighbours per query.
    Deterministic tie-break: cosine desc, neighbour id asc."""
    c = _norm_cols(corpus, id_col, vec_col, "n")
    q = _norm_cols(queries, id_col, vec_col, "q")
    joined = c.join(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("q_id") != F.col("n_id"))
    scored = joined.select(
        "q_id",
        "n_id",
        F.round(_cosine("q_vec", "n_vec", "q_nrm", "n_nrm"), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _kmeans_round(c: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd iteration on the (tiny) centroid table: broadcast-assign
    every corpus vector to its nearest centroid (cosine, max-struct
    tie-break — identical semantics to the final IVF assignment), then
    per-dim mean per cluster (posexplode + groupBy(cluster, dim), linear).
    Empty clusters keep their previous centroid. The updated table is
    collected to the driver (n_centroids x dim scalars — the same size
    class as a superstep scalar) so each round's lineage stays flat."""
    scored = c.join(F.broadcast(cents)).select(
        "n_id",
        "n_vec",
        F.round(_cosine("n_vec", "c_vec", "n_nrm", "c_nrm"), 6).alias("cs"),
        "c_id",
    )
    asg = (
        scored.groupBy("n_id")
        .agg(
            F.first("n_vec").alias("n_vec"),
            F.max(F.struct("cs", "c_id")).alias("best"),
        )
        .select(F.col("best.c_id").alias("c_id"), "n_vec")
    )
    means = (
        asg.select("c_id", F.posexplode("n_vec").alias("dim", "v"))
        .groupBy("c_id", "dim")
        .agg(F.avg("v").alias("v"))
        .groupBy("c_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda s: s["v"],
            ).alias("new_vec")
        )
    )
    spark = c.sparkSession
    rows = (
        cents.join(means, "c_id", "left")
        .select(
            "c_id",
            F.coalesce("new_vec", "c_vec").alias("c_vec"),
        )
        .collect()
    )
    out = spark.createDataFrame(
        [(r["c_id"], r["c_vec"]) for r in rows],
        schema=cents.select("c_id", "c_vec").schema,  # keep the id type
    )
    return out.select(
        "c_id",
        "c_vec",
        F.sqrt(
            F.aggregate(
                F.col("c_vec"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("c_nrm"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 2,
    broadcast_probes: bool | int = True,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors are inverted-listed
    under their nearest coarse centroid; each query probes only its
    ``n_probe`` nearest lists, then ranks candidates by exact cosine.

    ``broadcast_probes`` controls the probe-side join strategy: ``True``
    broadcasts the (query x n_probe) probe table — right for the common
    small-query-set case but it ships every query VECTOR to every
    executor, so a huge query set blows the broadcast budget; ``False``
    shuffle-joins on ``cluster`` instead (both sides hash-partitioned —
    the right plan when queries are themselves corpus-scale); an ``int``
    is a row-count threshold (one cheap count against the query table
    picks the strategy).

    Coarse centroids are a DETERMINISTIC seeded sample (the
    ``n_centroids`` corpus vectors with smallest md5(id)) so the whole
    index is engine-replayable — the correctness gate rebuilds it in
    DuckDB. Assignment ties break on rounded cosine then LARGEST centroid
    id (max-struct semantics). Expected candidates per probe ≈
    corpus/n_centroids; at scale, assignment is a broadcast of the tiny
    centroid table against the corpus (map-side), and the inverted lists
    are a hash partition by cluster.

    ``kmeans_iters`` runs that many Lloyd refinement rounds on the seeded
    centroids before building the lists (still fully deterministic —
    deterministic init, cosine assignment with the same max-struct
    tie-break, per-dim mean update; empty clusters keep their previous
    centroid). Each round is one broadcast assignment + one
    ``groupBy(cluster, dim)`` mean — linear passes, no all-pairs. The
    refined centroids land closer to the data's modes, which balances the
    inverted lists and lifts recall at the same ``n_probe`` (measured vs
    the exact oracle in tests/test_functions.py)."""
    c = _norm_cols(corpus, id_col, vec_col, "n")
    cents = (
        c.select(
            F.col("n_id").alias("c_id"),
            F.col("n_vec").alias("c_vec"),
            F.col("n_nrm").alias("c_nrm"),
            F.md5(F.col("n_id").cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_centroids)
        .drop("h")
    )
    for _ in range(kmeans_iters):
        cents = _kmeans_round(c, cents)
    n_scored = c.join(F.broadcast(cents)).select(
        "n_id",
        "n_vec",
        "n_nrm",
        "c_id",
        F.round(_cosine("n_vec", "c_vec", "n_nrm", "c_nrm"), 6).alias("cs"),
    )
    assign = (
        n_scored.groupBy("n_id")
        .agg(
            F.first("n_vec").alias("n_vec"),
            F.first("n_nrm").alias("n_nrm"),
            F.max(F.struct("cs", "c_id")).alias("best"),
        )
        .select(
            "n_id", "n_vec", "n_nrm", F.col("best.c_id").alias("cluster")
        )
    )
    q = _norm_cols(queries, id_col, vec_col, "q")
    q_scored = q.join(F.broadcast(cents)).select(
        "q_id",
        "q_vec",
        "q_nrm",
        "c_id",
        F.round(_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"), 6).alias("cs"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.desc("c_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", "q_vec", "q_nrm", F.col("c_id").alias("cluster"))
    )
    if isinstance(broadcast_probes, bool):
        do_broadcast = broadcast_probes
    else:
        do_broadcast = queries.count() <= int(broadcast_probes)
    probe_side = F.broadcast(probes) if do_broadcast else probes
    cand = assign.join(probe_side, "cluster").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = cand.select(
        "q_id",
        "n_id",
        F.round(_cosine("q_vec", "n_vec", "q_nrm", "n_nrm"), 6).alias(
            "cosine"
        ),
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-pattern
    bucket (optionally +hamming-1 probes), then exact cosine rank within
    candidates. Bucket count = 2^bucket_dims; expected candidate set =
    corpus / 2^bucket_dims per probe — tune bucket_dims to corpus size."""
    def sig(df, prefix):
        base = _norm_cols(df, id_col, vec_col, prefix)
        key = F.concat_ws(
            "",
            *[
                F.when(
                    F.element_at(f"{prefix}_vec", i + 1) >= 0, "1"
                ).otherwise("0")
                for i in range(bucket_dims)
            ],
        )
        return base.withColumn("bkt", key)

    c = sig(corpus, "n")
    q = sig(queries, "q")
    if multiprobe:
        # probe own bucket + all hamming-1 flips
        def flip(s, i):
            pre = F.substring(s, 1, i)
            bit = F.substring(s, i + 1, 1)
            post = F.substring(s, i + 2, bucket_dims - i - 1)
            return F.concat(
                pre,
                F.when(bit == "1", F.lit("0")).otherwise(F.lit("1")),
                post,
            )

        probes = F.array(
            F.col("bkt"), *[flip(F.col("bkt"), i) for i in range(bucket_dims)]
        )
        q = q.withColumn("bkt", F.explode(probes))
    joined = c.join(F.broadcast(q), "bkt").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = joined.select(
        "q_id",
        "n_id",
        F.round(_cosine("q_vec", "n_vec", "q_nrm", "n_nrm"), 6).alias(
            "cosine"
        ),
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _pq_kmeans_round(nblocks, codebook, m_subvectors, sub):
    """One per-block Lloyd iteration for PQ: assign every corpus block to
    its nearest codeword (rounded-distance min-struct — identical to the
    final encode), per-dim mean per (block, codeword); empty codewords
    keep their previous value. Collected to the driver (m x n_codes x
    sub scalars) so each round's lineage stays flat. Deterministic init
    + deterministic assignment, but the mean's FP summation order is
    engine-internal — refinement is for RECALL (measured in tests), the
    replayable gate path runs kmeans_iters=0, the same convention as
    ivf_topk."""
    d2e = F.aggregate(
        F.zip_with(
            F.col("n_sub"), F.col("c_sub"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    asg = (
        nblocks.join(F.broadcast(codebook), "j")
        .select(
            "n_id", "j", "n_sub", F.round(d2e, 6).alias("d"), "c_id"
        )
        .groupBy("n_id", "j")
        .agg(
            F.first("n_sub").alias("n_sub"),
            F.min(F.struct("d", "c_id")).alias("best"),
        )
        .select("j", F.col("best.c_id").alias("c_id"), "n_sub")
    )
    means = (
        asg.select("j", "c_id", F.posexplode("n_sub").alias("dim", "v"))
        .groupBy("j", "c_id", "dim")
        .agg(F.avg("v").alias("v"))
        .groupBy("j", "c_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "v"))),
                lambda s: s["v"],
            ).alias("new_sub")
        )
    )
    spark = nblocks.sparkSession
    rows = (
        codebook.join(means, ["j", "c_id"], "left")
        .select(
            "j", "c_id", F.coalesce("new_sub", "c_sub").alias("c_sub")
        )
        .collect()
    )
    id_type = codebook.schema["c_id"].dataType.simpleString()
    return spark.createDataFrame(
        [(r["j"], r["c_id"], [float(x) for x in r["c_sub"]]) for r in rows],
        f"j int, c_id {id_type}, c_sub array<double>",
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_subvectors: int = 4,
    n_codes: int = 16,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): each vector is
    split into ``m_subvectors`` blocks, each block encoded as its
    nearest codeword from a per-block codebook — the corpus compresses
    to ``m`` small ints per vector, and a query scans it with
    asymmetric-distance (ADC) TABLE LOOKUPS instead of full d-dim math.

    This is the 100 TB memory story the flat/IVF paths lack: the scan
    touches m bytes per vector, not 4d, and the per-query lookup table
    (m x n_codes distances) broadcasts at any corpus size. Plain PQ is
    still a linear scan — compose with :func:`ivf_topk`'s inverted lists
    for the sublinear IVF-PQ layout; rerank survivors with
    :func:`cosine_topk` semantics when exactness at the top matters.

    Determinism/replayability (the engine's ANN conventions): the
    codebook is the ``n_codes`` corpus vectors with smallest
    ``md5(id)`` (their j-th blocks form block-j's codewords, codeword
    id = vector id); encode ties break (rounded distance ASC, codeword
    id ASC) via min-struct; ADC sums fold the per-block distances in
    block order (deterministic FP), rounded to 6 dp before ranking;
    rank ties break on neighbour id. Returns
    ``(q_id, n_id, adc_d2, rank)`` with ``adc_d2`` the ADC squared-L2
    estimate (LOWER is closer, unlike the cosine rows)."""
    sub, blocks, codebook = _pq_build(
        corpus, id_col, vec_col, m_subvectors, n_codes, kmeans_iters
    )
    codes = _pq_codes(blocks(corpus, "n"), codebook)
    lut = _pq_lut(blocks(queries, "q"), codebook)
    adc = _pq_adc(codes.join(F.broadcast(lut), ["j", "code"]))
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_d2"), F.asc("n_id"))
    return adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _pq_build(corpus, id_col, vec_col, m_subvectors, n_codes, kmeans_iters):
    """(sub, blocks, codebook): block width, the block-splitting helper,
    and the (j, c_id, c_sub) codebook (md5-seeded + optional Lloyd)."""
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m_subvectors != 0:
        raise ValueError(
            f"embedding dim {dim} not divisible by m_subvectors="
            f"{m_subvectors}"
        )
    sub = dim // m_subvectors

    def blocks(df: DataFrame, prefix: str) -> DataFrame:
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"), v.alias("v")
        ).select(
            f"{prefix}_id",
            F.explode(F.sequence(F.lit(0), F.lit(m_subvectors - 1))).alias(
                "j"
            ),
            "v",
        ).select(
            f"{prefix}_id",
            "j",
            F.expr(f"slice(v, j * {sub} + 1, {sub})").alias(f"{prefix}_sub"),
        )

    cb = (
        corpus.select(
            F.col(id_col), F.md5(F.col(id_col).cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(n_codes)
        .drop("h")
        .join(corpus, id_col)
    )
    codebook = blocks(cb, "c").withColumnRenamed("c_sub", "c_sub_raw").select(
        "c_id", "j", F.col("c_sub_raw").alias("c_sub")
    )
    for _ in range(kmeans_iters):
        codebook = _pq_kmeans_round(
            blocks(corpus, "n"), codebook, m_subvectors, sub
        )
    return sub, blocks, codebook


def _pq_d2(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_codes(nblocks: DataFrame, codebook: DataFrame) -> DataFrame:
    """(n_id, j, code): nearest codeword per block, min-(rounded d,
    codeword id) tie-break."""
    return (
        nblocks.join(F.broadcast(codebook), "j")
        .select(
            "n_id",
            "j",
            "c_id",
            F.round(_pq_d2("n_sub", "c_sub"), 6).alias("d"),
        )
        .groupBy("n_id", "j")
        .agg(F.min(F.struct("d", "c_id")).alias("best"))
        .select("n_id", "j", F.col("best.c_id").alias("code"))
    )


def _pq_lut(qblocks: DataFrame, codebook: DataFrame) -> DataFrame:
    """(q_id, j, code, d): the per-query distance lookup table."""
    return qblocks.join(F.broadcast(codebook), "j").select(
        "q_id",
        "j",
        F.col("c_id").alias("code"),
        F.round(_pq_d2("q_sub", "c_sub"), 6).alias("d"),
    )


def _pq_adc(pairs: DataFrame) -> DataFrame:
    """Fold (q_id, n_id, j, d) rows into (q_id, n_id, adc_d2): per-pair
    distances summed in block order (deterministic FP), 6-dp rounded."""
    return (
        pairs.filter(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(F.sort_array(F.collect_list(F.struct("j", "d"))).alias("ds"))
        .select(
            "q_id",
            "n_id",
            F.round(
                F.aggregate("ds", F.lit(0.0), lambda acc, x: acc + x["d"]),
                6,
            ).alias("adc_d2"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 2,
    m_subvectors: int = 4,
    n_codes: int = 16,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-PQ: the production 100 TB ANN layout (Jégou et al. 2011) —
    :func:`ivf_topk`'s probed inverted lists make the candidate set
    SUBLINEAR, :func:`pq_topk`'s ADC codes make scoring each candidate
    m table lookups over m-byte codes instead of full d-dim math. Same
    determinism contract as both parents (md5-seeded coarse centroids
    and codebooks, rounded-score tie-breaks, block-ordered ADC folds),
    so the gate oracle replays it end-to-end. ``kmeans_iters`` refines
    the PQ codebook only (the replayable gate path uses 0). Returns
    ``(q_id, n_id, adc_d2, rank)`` — rerank the survivors with exact
    cosine when top-of-list exactness matters."""
    c = _norm_cols(corpus, id_col, vec_col, "n")
    cents = (
        c.select(
            F.col("n_id").alias("c_id"),
            F.col("n_vec").alias("c_vec"),
            F.col("n_nrm").alias("c_nrm"),
            F.md5(F.col("n_id").cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_centroids)
        .drop("h")
    )
    n_scored = c.join(F.broadcast(cents)).select(
        "n_id",
        "c_id",
        F.round(_cosine("n_vec", "c_vec", "n_nrm", "c_nrm"), 6).alias("cs"),
    )
    assign = (
        n_scored.groupBy("n_id")
        .agg(F.max(F.struct("cs", "c_id")).alias("best"))
        .select("n_id", F.col("best.c_id").alias("cluster"))
    )
    q = _norm_cols(queries, id_col, vec_col, "q")
    q_scored = q.join(F.broadcast(cents)).select(
        "q_id",
        "c_id",
        F.round(_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"), 6).alias("cs"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.desc("c_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", F.col("c_id").alias("cluster"))
    )
    cand = (
        assign.join(F.broadcast(probes), "cluster")
        .select("q_id", "n_id")
        .distinct()
    )
    sub, blocks, codebook = _pq_build(
        corpus, id_col, vec_col, m_subvectors, n_codes, kmeans_iters
    )
    codes = _pq_codes(blocks(corpus, "n"), codebook)
    lut = _pq_lut(blocks(queries, "q"), codebook)
    pairs = cand.join(codes, "n_id").join(
        F.broadcast(lut), ["q_id", "j", "code"]
    )
    adc = _pq_adc(pairs)
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_d2"), F.asc("n_id"))
    return adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
