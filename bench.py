"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"wordcount": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collection). Timings are per-query wall clock.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_task_spark.registry import all_queries  # noqa: E402
from mapreduce_task_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    only = set(sys.argv[1:])

    spark = get_spark(app_name="mapreduce_task_spark-bench")
    timings: dict[str, float] = {}
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query shouldn't kill the bench
            timings[name] = -1.0
            print(f"bench: {name} failed: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    ok = {k: v for k, v in timings.items() if v >= 0}
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": round(sum(ok.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
