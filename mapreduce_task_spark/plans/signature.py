"""Logical-plan signatures — the ``mr.job.signature.v1`` analogue.

The reference fingerprints each job as SHA-256 over the ``|``-joined
names of its mapper/reducer/formats/KV classes plus a reducer-count
bucket (TraceWordCountJob.java:105-130, TraceSortJob.java:114-140,
TraceInsertIndexJob.java:120-147) and ships it to every task so traces
can be grouped by job *shape*.

Our jobs are DataFrames: the structural identity is the analyzed
logical plan. We combine Spark's ``semanticHash`` (stable across
cosmetic differences like alias ids) with a SHA-256 of the schema and
the plan's operator skeleton, bucketed by shuffle-partition count the
way the reference buckets reducer count (``r0``/``r1``/``rmany``).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

SIGNATURE_KEY = "spark.job.signature.v1"


def _partition_bucket(n: int) -> str:
    # reference buckets reducers as r0/r1/rmany (TraceWordCountJob.java:117-120)
    return "r0" if n == 0 else ("r1" if n == 1 else "rmany")


def _plan_skeleton(df: DataFrame) -> str:
    """Operator-name skeleton of the optimized plan (ids stripped)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    ops = [re.sub(r"[^A-Za-z]", "", line.split("(")[0]) for line in plan.splitlines()]
    return "|".join(o for o in ops if o)


def plan_signature(df: DataFrame) -> str:
    """Hex SHA-256 structural signature of a DataFrame's plan."""
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    payload = "|".join(
        [
            str(df.semanticHash()),
            df.schema.simpleString(),
            _plan_skeleton(df),
            _partition_bucket(n),
        ]
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def plan_attributes(df: DataFrame, job_kind: str) -> dict[str, str]:
    """Span attributes mirroring the reference's job-shape attributes
    (TraceWordCountJob.java:133-143)."""
    spark = df.sparkSession
    return {
        "job.kind": job_kind,
        "job.signature.v1": plan_signature(df),
        "job.schema": df.schema.simpleString(),
        "job.semantic_hash": str(df.semanticHash()),
        "job.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions", ""),
    }
