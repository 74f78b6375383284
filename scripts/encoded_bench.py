"""Encoded-vs-plain PageRank at the 120M-edge tier (VERDICT r2 #9):
quantify what ``encode_ids`` buys in the SHUFFLE-JOIN regime, where the
per-superstep contribution join moves vertex keys through the exchange.

The synthetic power-law graph gets realistic STRING ids (URL-shaped,
~40 bytes) — the north-rule input's vertex type. Two fresh-JVM runs of
the identical fixed-iteration job: plain string keys vs dictionary-
encoded dense longs (encode cost reported separately). Shuffle
read/write bytes come from Spark's own REST status API (UI enabled just
for this bench), summed over the job's stages.

Appends a section to BENCH/BASELINE.md (after the scaling section, which
scripts/scaling_bench.py preserves on rewrite).

Usage: python scripts/encoded_bench.py [--edges E] [--vertices V]
       [--cores C] [--iters K]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_RUNNER = """
import json, os, sys, time, urllib.request
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from jgtextrank_spark.session import get_spark
from bench import synth_powerlaw_edges

# string keys are ~6x fatter than longs: partition the shuffles well
# below the hash-aggregate spill point (this is exactly the knob the
# 100 TB sizing notes prescribe — maxPartitionBytes/shuffle.partitions
# sized to the executor heap)
spark = get_spark(master="local[{cores}]", shuffle_partitions={parts},
                  app_name="encoded-bench",
                  extra_conf={{"spark.ui.enabled": "true"}})
spark.sparkContext.setLogLevel("ERROR")

url = lambda c: F.concat(
    F.lit("https://h"), (F.col(c) % 1000).cast("string"),
    F.lit(".example.org/page/"), F.col(c).cast("string"),
    F.lit(".html"))
edges = synth_powerlaw_edges(spark, {vertices}, {edges}).select(
    url("src").alias("src"), url("dst").alias("dst"), "weight").persist()
edges.count()

from jgtextrank_spark.algos.pagerank import pagerank_result
from jgtextrank_spark.graph import encode_vertices

def shuffle_bytes():
    app = json.load(urllib.request.urlopen(
        "http://localhost:4040/api/v1/applications"))[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"http://localhost:4040/api/v1/applications/{{app}}/stages?status=complete"))
    return (sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(s.get("shuffleReadBytes", 0) for s in stages))

t_enc = 0.0
if {encode}:
    t0 = time.time()
    enc_edges, vdict = encode_vertices(edges)
    enc_edges = enc_edges.persist(); enc_edges.count()
    t_enc = time.time() - t0
    run_edges, run_verts = enc_edges, vdict.select("id")
else:
    run_edges, run_verts = edges, None

sw0, sr0 = shuffle_bytes()  # snapshot: everything up to here is prep
t0 = time.time()
res, n = pagerank_result(run_edges, run_verts, tol=0.0, max_iter={iters},
                         checkpoint_every=0, truncate_every=3,
                         broadcast_threshold=0)  # force shuffle-join regime
wall = time.time() - t0
steps = [m for m in res.metrics if m["event"] == "step"]

sw1, sr1 = shuffle_bytes()

print("RESULT_JSON:" + json.dumps({{
    "vertices": n, "encode": bool({encode}), "encode_sec": round(t_enc, 2),
    "supersteps": len(steps), "wall_sec": round(wall, 2),
    "mean_superstep_sec": round(sum(m["wall_ms"] for m in steps)
                                / len(steps) / 1000.0, 3),
    "prep_shuffle_write_bytes": sw0,
    "loop_shuffle_write_bytes": sw1 - sw0,
    "loop_shuffle_read_bytes": sr1 - sr0,
    "step_walls_sec": [round(m["wall_ms"] / 1000.0, 2) for m in steps],
}}))
"""


def run_one(encode: bool, args) -> dict:
    code = _RUNNER.format(
        repo=str(REPO), cores=args.cores, parts=args.parts,
        vertices=args.vertices, edges=args.edges, iters=args.iters,
        encode=encode,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT_JSON:"):
            return json.loads(line[len("RESULT_JSON:"):])
    raise RuntimeError(
        f"no result (encode={encode}):\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=120_000_000)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    print("run A: plain string ids ...", flush=True)
    plain = run_one(False, args)
    print(json.dumps(plain), flush=True)
    print("run B: encode_ids ...", flush=True)
    enc = run_one(True, args)
    print(json.dumps(enc), flush=True)

    gib = 1024.0**3
    w_ratio = plain["loop_shuffle_write_bytes"] / max(
        1, enc["loop_shuffle_write_bytes"])
    md = f"""

## Encoded vs plain vertex ids — shuffle-join regime, {args.edges:,} edges

`encode_ids` dictionary-encodes URL-shaped string vertex ids (~40 bytes)
to dense longs before the superstep loop (`graph.encode_vertices`), so
the per-superstep contribution join's exchanges move 8-byte keys.
Fixed {args.iters}-iteration weighted PageRank, `broadcast_threshold=0`
(shuffle-join regime forced), local[{args.cores}], fresh JVM per run.
Shuffle bytes from Spark's REST status API, split at a snapshot taken
between prep (edge materialization + normalization + the one-off
encode) and the superstep LOOP — the loop bytes are the per-iteration
recurring cost that dominates at any real iteration count.

| run | encode prep (s) | prep shuffle write | supersteps | mean superstep (s) | loop wall (s) | loop shuffle write | loop shuffle read |
|---|---|---|---|---|---|---|---|
| plain strings | — | {plain['prep_shuffle_write_bytes']/gib:.2f} GiB | {plain['supersteps']} | {plain['mean_superstep_sec']} | {plain['wall_sec']} | {plain['loop_shuffle_write_bytes']/gib:.2f} GiB | {plain['loop_shuffle_read_bytes']/gib:.2f} GiB |
| encode_ids | {enc['encode_sec']} | {enc['prep_shuffle_write_bytes']/gib:.2f} GiB | {enc['supersteps']} | {enc['mean_superstep_sec']} | {enc['wall_sec']} | {enc['loop_shuffle_write_bytes']/gib:.2f} GiB | {enc['loop_shuffle_read_bytes']/gib:.2f} GiB |

Loop shuffle-write reduction: **{w_ratio:.2f}x**; mean superstep
speedup **{plain['mean_superstep_sec']/enc['mean_superstep_sec']:.2f}x**
(first plain superstep includes adjacency first-touch — steady-state
walls, last 3 supersteps, give
**{sum(plain['step_walls_sec'][-3:])/max(1e-9,sum(enc['step_walls_sec'][-3:])):.2f}x**;
both sets listed below so the raw data is inspectable). Scores are
identical — encode/decode parity is gate-checked by the
pagerank_encoded row. Per-superstep walls: plain
{plain['step_walls_sec']}, encoded {enc['step_walls_sec']}. At 10^12
edges the encode prep is one sort-free hash join amortized over every
superstep of every downstream algorithm; the shuffle-byte ratio is the
durable win (network is the cluster bottleneck, not local CPU).
"""
    out = REPO / "BENCH" / "BASELINE.md"
    txt = out.read_text()
    marker = "\n\n## Encoded vs plain vertex ids"
    if marker in txt:
        txt = txt.split(marker, 1)[0]
    out.write_text(txt + md)
    print(f"appended encoded-vs-plain section to {out}")


if __name__ == "__main__":
    main()
