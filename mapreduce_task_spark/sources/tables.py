"""Parquet table loading for the driver's synthetic star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Scale notes: ``spark.read.parquet`` is the vectorized columnar scan —
predicate pushdown and column pruning reach the file scan for free, and
at 100 TB the same call reads a multi-thousand-file dataset split by
``spark.sql.files.maxPartitionBytes``. Nothing here collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions a planner should always broadcast in a join.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes the events nanosecond timestamp.

    The events parquet stores ``ts`` as INT64 TIMESTAMP(NANOS) which
    Spark's reader rejects; with ``nanosAsLong`` it arrives as int64
    nanoseconds and we convert to microsecond TIMESTAMP_NTZ (matching
    DuckDB's read of the same file).
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV, not `/`: float division of ~1.7e18 nanos exceeds
        # double precision (2^53) and lands a microsecond off.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame that scanned as too few splits.

    Small single-file inputs (like the test parquet) arrive as 1
    partition, serializing every CPU-heavy downstream op. At 100 TB the
    scan already has thousands of splits and this is a no-op — the
    repartition only fires when the scan is narrower than the session's
    parallelism.
    """
    spark = df.sparkSession
    n = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, n // 2):
        return df.repartition(n)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def write_empty_copies(
    spark: SparkSession, src_sf_dir: str, dest: str, names: tuple[str, ...] = TABLES
) -> str:
    """Write schema-correct, zero-row copies of every table to ``dest``.

    The empty-corpus builder behind the totality checks
    (tests/test_empty_inputs.py, tools/empty_sweep.py): schemas come
    from the RAW parquet (not ``load_table``), so quirks like the
    events table's INT64 TIMESTAMP(NANOS) column round-trip exactly as
    the source data stores them. Always overwrites — an empty write is
    seconds, and any caching here would pin a STALE schema after the
    source evolves (the sweep would then green-light queries against
    tables that no longer exist in that shape).
    """
    import os

    os.makedirs(dest, exist_ok=True)
    for name in names:
        raw = spark.read.parquet(os.path.join(src_sf_dir, f"{name}.parquet"))
        raw.limit(0).write.mode("overwrite").parquet(
            os.path.join(dest, f"{name}.parquet")
        )
    return dest


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL API."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
