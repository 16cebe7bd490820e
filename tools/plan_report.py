"""Physical-plan inventory for the driver queries.

For every registry query, plan (don't execute) against a data dir and
summarize the properties the scale story rests on:

- ``exchanges``: hash/range/broadcast exchange counts (shuffle shape),
- ``python_stages``: Arrow-batched vs row-wise Python operators (the
  row-wise count must be 0 — also pinned by tests/test_plan_health.py),
- ``cartesian``: CartesianProduct occurrences (0 everywhere; the
  broadcast nested-loop joins similarity uses are NOT cartesian),
- ``pushed_filters`` / ``read_schema_cols``: whether predicates and
  column pruning reach the parquet scans.

(No whole-stage-codegen count: under AQE codegen is inserted per query
stage at execution time, invisible in a pre-execution plan string —
JVM-sidedness is what the python_stages counts capture.)

Emits one JSON object per query (sorted by name) plus a footer with
aggregate counts — a reviewable artifact, not a gate: the hard
assertions live in tests/test_plan_health.py. Usage:

    python tools/plan_report.py [sf_dir] [query ...]   # default sf0.001
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def summarize(plan: str) -> dict:
    return {
        "exchanges": {
            "hash": plan.count("Exchange hashpartitioning"),
            "range": plan.count("Exchange rangepartitioning"),
            "single": plan.count("Exchange SinglePartition"),
            "broadcast": plan.count("BroadcastExchange"),
        },
        "python_stages": {
            "arrow": sum(
                plan.count(s)
                for s in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
            ),
            "rowwise": plan.count("BatchEvalPython"),
        },
        "cartesian": plan.count("CartesianProduct"),
        "pushed_filters": len(
            [
                m
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if m.strip()
            ]
        ),
        "scans": plan.count("FileScan parquet"),
        "read_schema_cols": [
            len(m.split(",")) if m else 0
            for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ],
        # NOTE: no whole-stage-codegen count — under AQE, codegen is
        # inserted per query stage AT EXECUTION, so a pre-execution
        # AdaptiveSparkPlan string carries no codegen markers to count.
        # JVM-sidedness is covered by the python_stages counts above.
    }


def main() -> int:
    from mapreduce_task_spark.registry import all_queries
    from mapreduce_task_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = set(args[1:])

    spark = get_spark()
    rows, totals = [], {"rowwise_python": 0, "cartesian": 0}
    for name, q in sorted(all_queries().items()):
        if names and name not in names:
            continue
        try:
            plan = (
                q.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # a planning failure is itself a finding
            rows.append({"query": name, "error": str(e)[:200]})
            continue
        s = summarize(plan)
        s["query"] = name
        totals["rowwise_python"] += s["python_stages"]["rowwise"]
        totals["cartesian"] += s["cartesian"]
        rows.append(s)
    for r in rows:
        print(json.dumps(r, sort_keys=True))
    print(json.dumps({"total_queries": len(rows), **totals}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
