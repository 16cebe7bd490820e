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


# every Arrow-batched Python physical node Spark can plan — not just
# the ones today's queries use, so a future query with a grouped-agg /
# window / cogroup / mapInArrow pandas stage can't read as "pure JVM"
_ARROW_NODES = (
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "AggregateInPandas",
    "WindowInPandas",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
)


def _top_level_fields(schema: str) -> int:
    """Count top-level fields of a struct<...> body: commas at angle-
    bracket/paren depth 0 (decimal(12,2) and map<k,v> carry commas that
    must NOT count as field separators)."""
    if not schema:
        return 0
    depth, fields = 0, 1
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
    return fields


def summarize(plan: str) -> dict:
    return {
        "exchanges": {
            "hash": plan.count("Exchange hashpartitioning"),
            "range": plan.count("Exchange rangepartitioning"),
            "single": plan.count("Exchange SinglePartition"),
            "broadcast": plan.count("BroadcastExchange"),
        },
        "python_stages": {
            "arrow": sum(plan.count(s) for s in _ARROW_NODES),
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
            _top_level_fields(m)
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
    unknown = names - set(all_queries())
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)}")

    # default explain metadata truncates at 100 chars, silently cutting
    # wide scans' ReadSchema/PushedFilters before their closing bracket
    # — exactly the scans where the pruning story matters
    spark = get_spark(
        extra_conf={"spark.sql.maxMetadataStringLength": "10000"}
    )
    # runtime-settable: also apply when an existing session was reused
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
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
