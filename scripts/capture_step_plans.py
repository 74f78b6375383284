"""Capture the PER-ROUND physical plan of the iterative solvers.

The declared queries' final `explain` shows only the post-checkpoint tail
(the superstep harness truncates lineage every round), so the plan-shape
evidence for the solver optimizations lives in the ROUND plan: what one
superstep's new-state DataFrame compiles to. This script intercepts
`run_supersteps`, runs exactly one round, and writes the round's
`explain("formatted")` to plans/r06/.

Usage: python scripts/capture_step_plans.py <repo_root> <suffix>
  repo_root: the tree to load the library from (e.g. /root/repo, or the
             round-start archive for the "before" capture)
  suffix:    appended to the plan file names (before/after)
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path


def main():
    root, suffix = sys.argv[1], sys.argv[2]
    sys.path.insert(0, root)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("step-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024**2))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path("/root/repo/plans/r06")
    out_dir.mkdir(parents=True, exist_ok=True)

    import jgtextrank_spark.supersteps as ss

    captured: dict = {}
    real_run = ss.run_supersteps

    def capturing_run(spark_, initial_state, step, **kw):
        state = initial_state.persist()
        new_state, delta = step(state, 1)
        buf = io.StringIO()
        with redirect_stdout(buf):
            new_state.explain("formatted")
        captured["plan"] = buf.getvalue()
        return ss.SuperstepResult(
            state=new_state, iterations=1, converged=False, metrics=[]
        )

    def synth(n_v, n_e, seed=42):
        ids = spark.range(n_e)
        u_src = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(n_v))
        h = F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1_000_000_007))
        u = h.cast("double") / 1_000_000_007.0
        dst = F.floor(F.lit(float(n_v)) * F.pow(u, F.lit(3.0)))
        w = 1.0 + F.pmod(
            F.xxhash64("id", F.lit(seed + 2)), F.lit(5)
        ).cast("double")
        return ids.select(
            u_src.cast("long").alias("src"),
            dst.cast("long").alias("dst"),
            w.alias("weight"),
        )

    edges = synth(5000, 40000).persist()
    edges.count()

    def cap(name, fn):
        captured.clear()
        ss.run_supersteps = capturing_run
        # the solver modules bound run_supersteps at import time; patch
        # their references too (importlib, because the algos package
        # re-exports a `pagerank` FUNCTION that shadows the module name
        # under plain `import ... as`)
        import importlib

        mods = [
            importlib.import_module(f"jgtextrank_spark.algos.{m}")
            for m in (
                "components", "pagerank", "louvain", "centrality",
                "neighborhood",
            )
        ]

        for mod in mods:
            if hasattr(mod, "run_supersteps"):
                mod.run_supersteps = capturing_run
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            captured.setdefault("plan", f"CAPTURE FAILED: {e}")
        finally:
            ss.run_supersteps = real_run
            for mod in mods:
                if hasattr(mod, "run_supersteps"):
                    mod.run_supersteps = real_run
        path = out_dir / f"step_{name}_{suffix}.txt"
        path.write_text(captured.get("plan", "NO PLAN CAPTURED"))
        print(f"wrote {path.name} ({len(captured.get('plan', ''))} bytes)")

    from jgtextrank_spark.algos.centrality import core_numbers_hindex_result
    from jgtextrank_spark.algos.components import connected_components_result
    from jgtextrank_spark.algos.louvain import louvain_move_phase
    from jgtextrank_spark.algos.neighborhood import hyperball_result
    from jgtextrank_spark.algos.pagerank import pagerank_result

    cap("pagerank", lambda: pagerank_result(
        edges, tol=0.0, max_iter=2, checkpoint_every=0))
    cap("components_hashmin", lambda: connected_components_result(
        edges, checkpoint_every=0))
    cap("coreness_hindex", lambda: core_numbers_hindex_result(
        edges, checkpoint_every=0))
    cap("hyperball", lambda: hyperball_result(
        edges, max_iter=4, lg_k=8, checkpoint_every=0))
    cap("louvain_move", lambda: louvain_move_phase(edges, fixed_rounds=2))
    spark.stop()


if __name__ == "__main__":
    main()
