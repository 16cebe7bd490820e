"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated fact-fact join is the
shuffle. Writing both sides bucketed (+ sorted) by the join key lets
Spark plan a sort-merge join with NO Exchange on either side — the
bucketing IS the shuffle, paid once at write time and amortized over
every subsequent join/aggregation on that key.

Rules encoded here:
- same bucket count both sides (or a divisor) or Spark re-shuffles;
- bucket column == join key exactly;
- ``spark.sql.sources.bucketing.enabled`` (default true) and
  ``...bucketing.autoBucketedScan.enabled`` govern whether the scan
  exposes the bucketed distribution.

Bucketed writes go through the session catalog (saveAsTable): the
bucket layout lives in table metadata, which is what the planner
consults — a plain ``.parquet(path)`` write cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table.

    Drops any prior table AND its orphaned warehouse directory first: a
    location left behind by a session that died mid-write blocks
    re-creation (the in-memory catalog forgets the table, the
    filesystem doesn't).
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange
    (hash/range repartitioning — broadcast exchanges don't count;
    test helper for asserting bucketed joins stay shuffle-free)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
