"""Partitioned datasets: hive-style layout, dynamic overwrite, pruning.

At 100 TB the events table is written partitioned by date (and often
sub-bucketed); queries touching a day read one directory, not the
table. This module encodes the three production rules:

- write with ``partitionBy`` -> hive-style ``col=value`` directories;
- overwrite with ``partitionOverwriteMode=dynamic`` so a backfill
  replaces only the partitions present in the incoming frame (static
  mode would wipe the whole table);
- verify pruning: a filtered scan must show the predicate under
  ``PartitionFilters`` (metadata-only pruning), not ``DataFilters``
  (per-file evaluation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], dynamic: bool = True
) -> None:
    """Write (or dynamically overwrite) a hive-partitioned dataset."""
    spark = df.sparkSession
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def with_date_partition(df: DataFrame, ts_col: str = "ts", out_col: str = "dt") -> DataFrame:
    """Derive the date partition column from an event timestamp."""
    return df.withColumn(out_col, F.to_date(ts_col))


def write_sorted_ranges(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Write parquet whose files hold DISJOINT, internally-sorted key
    ranges: ``repartitionByRange`` (sampled range boundaries, one
    shuffle) + ``sortWithinPartitions`` (no global sort barrier).

    The cluster-ordered layout pattern: parquet min/max column stats
    per file become effective zone maps, so a point or range predicate
    on ``sort_cols`` prunes to ~one file at planning time instead of
    scanning the table — the single highest-leverage layout choice for
    a 100 TB fact table queried by time or key. (Total-order output as
    one globally sorted stream is the anti-pattern; disjoint sorted
    ranges give the same pruning without a single-partition sink.)
    """
    out = df.repartitionByRange(*( [num_files] if num_files else [] ), *sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — a
    metadata listing (works for file:/hdfs:/s3a:), never a data scan."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ~``target_file_bytes`` files; returns the file count written.

    The standing ops task of every streaming/incremental pipeline: a
    micro-batch sink or per-task writer accumulates thousands of tiny
    files, and scan planning cost grows with file count (listing +
    footer reads + one task minimum each). File count is sized from
    the INPUT listing (metadata only, no data scan) — an approximation
    that intentionally ignores recompression, which is the standard
    trade. Writes to a NEW directory; swapping it over the source is
    the caller's (atomic-rename or table-metadata) move.
    """
    n_files = max(1, -(-dir_bytes(spark, src_path) // target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the scan (test/diagnostic helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            i = line.index("PartitionFilters")
            return line[i : i + 200]
    return ""
