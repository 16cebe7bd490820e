"""Engine-wide physical-plan invariants over EVERY registered query.

The two 100 TB plan smells that must never appear in a driver query:

- ``BatchEvalPython``: a row-at-a-time Python UDF in the hot path
  (10-100x slower than JVM codegen or Arrow-batched pandas stages —
  which show up as ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas and ARE allowed where justified);
- ``CartesianProduct``: an unbroadcast cross join that materializes
  |L| x |R| across the cluster (the brute-force similarity scans are
  broadcast nested-loop joins — tiny side replicated, big side
  streamed — which is the documented, bounded shape).
"""

from mapreduce_task_spark.registry import all_queries


def test_no_query_plan_uses_rowwise_python_or_cartesian(spark, sf_small):
    from mapreduce_task_spark.queries.llm_dedup import release_persists

    offenders = {}
    try:
        for name, q in all_queries().items():
            plan = (
                q.fn(spark, sf_small)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            bad = [
                smell
                for smell in ("BatchEvalPython", "CartesianProduct")
                if smell in plan
            ]
            if bad:
                offenders[name] = bad
    finally:
        release_persists()
    assert not offenders, offenders
