"""Capture .explain("formatted") for declared queries into plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name becomes plans/r06/<query>_<suffix>.txt)

The explain output is captured WITHOUT executing the query (initial AQE
plan), which is what the plan-shape claims in OPTIMIZATION_r06.md refer
to (Exchange count, join strategy, PushedFilters, codegen spans).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.01"

    from jgtextrank_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)

    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
