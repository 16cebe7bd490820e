"""Total-order sort — the reference's trace-sort-job re-expressed.

Reference semantics (SURVEY.md §2.3 A3, §3.2): map keys each whole line,
the MR shuffle sorts Text keys byte-lexicographically, reduce emits one
output line per input line (duplicates preserved). With the default 1
reducer the output is globally sorted (TraceSortJob.java:51,109); with
N>1 it is NOT a total order (hash partitioner) — we implement the true
total order, which is strictly stronger.

Spark plan: ``orderBy`` = range-partitioned sort (sample -> range
Exchange -> per-partition sort), Spark's analogue of Hadoop's
TotalOrderPartitioner. Scales to any size: no single-reducer funnel,
each partition sorts locally and spills via UnsafeExternalSorter.

``global_rank`` additionally materializes the global position without
ever putting all rows through one partition: range-partition by key,
rank within partitions, then add broadcast per-partition offsets. This
is the scalable replacement for ``row_number() OVER (ORDER BY ...)``
(whose single-partition window is a 100 TB anti-pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def total_sort(df: DataFrame, *key_cols: str, ascending: bool = True) -> DataFrame:
    """Globally-ordered DataFrame (duplicates preserved, stable for
    reading out in order)."""
    cols = [F.col(c).asc() if ascending else F.col(c).desc() for c in key_cols]
    return df.orderBy(*cols)


def global_rank(
    df: DataFrame,
    *key_cols: str,
    rank_col: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the 1-based global sort position over ``key_cols``.

    Deterministic iff the key is unique (pass tie-breaker columns).
    Three-step scalable plan:
      1. ``repartitionByRange`` on the keys (sampled range Exchange),
      2. ``row_number`` within each physical partition (window keyed on
         ``spark_partition_id`` — partition-local, no global funnel),
      3. join broadcast per-partition row counts, cumulated into offsets
         (the offsets table has O(num_partitions) rows, never data-sized).
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keyed = df.repartitionByRange(n, *key_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*key_cols)
    local = keyed.withColumn("__lrk", F.row_number().over(w_local))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__lrk") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrk", "__off")
    )
