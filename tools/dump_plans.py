"""Dump ``explain("formatted")`` for registry queries to files.

Usage:
    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (default: all).
Plan-only — builds each DataFrame and captures the formatted physical
plan without executing it. The optimization-round deliverable
(``plans/r13/<query>_before.txt`` / ``_after.txt``) is produced with
this tool so before/after claims in OPTIMIZATION_r13.md are checkable.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    only = set(sys.argv[4:])
    out_dir.mkdir(parents=True, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from mapreduce_task_spark.registry import all_queries
    from mapreduce_task_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # record the failure, keep dumping
            plan = f"PLAN FAILED: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
