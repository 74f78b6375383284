"""Deterministic corpus-sampling operators for training-mix construction.

A 100 TB corpus is never trained on verbatim: pipelines carve it into
reproducible samples (ablations), per-stratum quotas (language/domain
balance), and temperature-reweighted mixtures (upsampling rare strata).
Every operator here is hash-deterministic — md5-keyed, no RNG state, no
``Date.now``-style nondeterminism — so a sample is a pure function of
(key, seed) and re-runs, backfills, and cross-engine replays (the DuckDB
gate) produce byte-identical memberships. That property is what makes
sampling safe under Spark task retries and speculative execution:
membership cannot depend on which attempt of a task won.

Scale notes: hash sampling is a stateless map-only filter (pushes below
any join Catalyst can reorder it under); quota sampling's window is
PARTITIONED BY STRATUM (never global); mixture weighting aggregates one
row per stratum then broadcasts back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "hash_sample",
    "stratified_quota_sample",
    "temperature_mixture_weights",
    "weighted_sample_k",
]

_SCALE = float(2**48)


def hash_uniform(key, seed: str = "s0") -> Column:
    """Deterministic uniform in [0, 1): first 48 bits of
    ``md5(seed || ':' || key)`` over 2^48. The same construction the
    random-walk sampler uses (algos/walks.py) — one md5 per row, exactly
    replayable in any engine with md5."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), c.cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long").cast("double")
        / F.lit(_SCALE)
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Keep each row iff ``hash_uniform(key) < fraction`` — a stateless
    Bernoulli(fraction) sample that is stable across runs, partitionings,
    task retries, and engines (unlike ``DataFrame.sample``, whose output
    depends on partition layout). Map-only; survives predicate pushdown."""
    return df.filter(hash_uniform(key_col, seed) < F.lit(fraction))


def stratified_quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by ascending
    ``hash_uniform(key)`` (a deterministic uniform draw without
    replacement — the hash order is a random permutation of each
    stratum). Adds ``sample_rank`` (1-based within stratum).

    The window partitions by stratum, so no global sort; a stratum far
    exceeding executor memory would need the standard two-phase top-k
    refinement, but quota ≪ stratum size keeps rank-k scans cheap under
    Spark's window TopK pushdown (WindowGroupLimit)."""
    from pyspark.sql import Window

    u = hash_uniform(key_col, seed)
    w = Window.partitionBy(strata_col).orderBy(
        u.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= quota)
    )


def temperature_mixture_weights(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    round_to: int = 9,
) -> DataFrame:
    """Temperature-sampling mixture over strata (multilingual-LM style,
    cf. the alpha-sampling of mC4/XLM-R): ``(stratum, n_docs, p_raw,
    p_mix, boost)`` where ``p_mix ∝ p_raw^alpha`` normalized and
    ``boost = p_mix / p_raw`` is the per-stratum up/down-sampling factor
    a sampler should apply. One count aggregation, one broadcast 1-row
    normalizer — output is stratum-cardinality-sized."""
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tots = counts.select(
        F.sum("n_docs").cast("double").alias("n_tot"),
        F.sum(
            F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
        ).alias("z"),
    )
    nd = F.col("n_docs").cast("double")
    return counts.crossJoin(F.broadcast(tots)).select(
        "stratum",
        "n_docs",
        F.round(nd / F.col("n_tot"), round_to).alias("p_raw"),
        F.round(F.pow(nd, F.lit(alpha)) / F.col("z"), round_to).alias(
            "p_mix"
        ),
        F.round(
            (F.pow(nd, F.lit(alpha)) / F.col("z")) / (nd / F.col("n_tot")),
            round_to,
        ).alias("boost"),
    )


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: str = "s0",
    strata_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    keep the ``k`` rows maximizing ``u^(1/w)`` — equivalently the ones
    with the LEAST-negative ``ln(u)/w`` — where ``u`` is the
    deterministic md5 uniform of the key. Inclusion probability is
    weight-proportional in the without-replacement sense, and the draw
    is a pure function of (key, seed): retry-safe, backfill-stable,
    engine-replayable like every sampler here.

    Adds ``es_rank`` (1-based, 1 = most favored). Global mode ranks via
    ascending ``-ln(u)/w`` with a key tiebreak — a TakeOrderedAndProject
    top-k, never a single-partition sort; ``strata_col`` switches to a
    per-stratum window (quota k per stratum).

    Rows with weight <= 0 or NULL are excluded (A-ES is undefined
    there); ties at the k-boundary are broken by the key, so the sample
    is total-order deterministic."""
    from pyspark.sql import Window

    u = hash_uniform(key_col, seed)
    w = F.col(weight_col).cast("double")
    neg_key = -(F.log(u) / w)  # ascending = best first (all values > 0)
    base = df.filter(w > 0).withColumn("_nk", neg_key)
    if strata_col is not None:
        win = Window.partitionBy(strata_col).orderBy(
            F.col("_nk").asc(), F.col(key_col).asc()
        )
        out = (
            base.withColumn("es_rank", F.row_number().over(win).cast("long"))
            .filter(F.col("es_rank") <= k)
        )
    else:
        out = (
            base.orderBy(F.col("_nk").asc(), F.col(key_col).asc())
            .limit(k)
            .withColumn(
                "es_rank",
                F.row_number().over(
                    Window.orderBy(F.col("_nk").asc(), F.col(key_col).asc())
                ).cast("long"),
            )
        )
    return out.drop("_nk")
