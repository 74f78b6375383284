"""GCValue containment-join scale bench (NOTES.md #3 / VERDICT #10).

Confirms the rarest-token prefix-filter containment join is (a)
sub-quadratic in the candidate count and (b) robust to a stopword-like
hot token shared by EVERY candidate — the case where a full
inverted-index join degenerates to C^2 intermediate rows.

Synthetic candidates: n forms of 1-4 tokens over a zipf-ish vocabulary
(dst = floor(V * u^3) hashing mass onto low token ids, so popular tokens
are genuinely hot); ``--hot`` appends one universal token to every form.

Usage: python scripts/gcvalue_bench.py [n1 n2 ...] (default 20000 80000)
Prints one JSON line per run: {n, hot, wall_sec, out_rows}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def synth_candidates(spark, n, vocab=5000, max_len=4, hot_token=None):
    ids = spark.range(n)
    ln = (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(max_len)) + 1).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.concat(
            F.lit("t"),
            F.floor(
                F.lit(float(vocab))
                * F.pow(
                    F.pmod(F.xxhash64(F.col("id"), i, F.lit(2)), F.lit(10**9))
                    / 1.0e9,
                    F.lit(3.0),
                )
            ).cast("string"),
        ),
    )
    if hot_token:
        toks = F.concat(toks, F.array(F.lit(hot_token)))
    return ids.select(
        F.col("id").alias("cand_id"),
        toks.alias("term_tokens"),
        F.concat_ws(" ", toks).alias("term"),
        F.size(toks).alias("n_tokens"),
    )


def run(spark, n, hot):
    from jgtextrank_spark.textrank import weigh_candidates

    cands = synth_candidates(
        spark, n, hot_token="the" if hot else None
    ).persist()
    cands.count()
    scores = (
        cands.select(F.explode("term_tokens").alias("vertex"))
        .distinct()
        .withColumn(
            "score",
            (F.pmod(F.xxhash64("vertex"), F.lit(10**6)) / 1.0e6),
        )
        .persist()
    )
    scores.count()
    t0 = time.time()
    out = weigh_candidates(cands, scores, scores, weight_comb="gcvalue")
    rows = out.count()
    wall = time.time() - t0
    cands.unpersist()
    scores.unpersist()
    return {"n": n, "hot": hot, "wall_sec": round(wall, 2), "out_rows": rows}


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 80000]
    from jgtextrank_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for n in sizes:
        for hot in (False, True):
            r = run(spark, n, hot)
            results.append(r)
            print(json.dumps(r), flush=True)
    if len(sizes) >= 2:
        a = next(r for r in results if r["n"] == sizes[0] and not r["hot"])
        b = next(r for r in results if r["n"] == sizes[-1] and not r["hot"])
        ratio_n = sizes[-1] / sizes[0]
        ratio_t = b["wall_sec"] / max(a["wall_sec"], 1e-9)
        print(
            json.dumps(
                {
                    "size_ratio": ratio_n,
                    "time_ratio": round(ratio_t, 2),
                    "quadratic_time_ratio": ratio_n**2,
                    "subquadratic": ratio_t < ratio_n**2 / 2,
                }
            )
        )


if __name__ == "__main__":
    main()
