"""SparkSession construction tuned for both local testing and scale.

Local mode (``local[N]``) is the test bed; the conf choices below are the
ones that also hold on a 1000-executor cluster: AQE on (runtime shuffle
coalescing + skew-join splitting), shuffle partitions sized to the
parallelism rather than the 200 default, Arrow enabled for the few
pandas-UDF code paths, UTC session timezone so timestamp semantics are
deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# SQL confs that are safe (and necessary) to set on an *existing* session,
# e.g. the driver-owned session handed to __spark_entry__.queries().
RUNTIME_CONFS: dict[str, str] = {
    # the synthetic events table stores TIMESTAMP(NANOS) which the parquet
    # reader rejects by default; read as int64 nanos and convert ourselves
    # (sources.tables.load_table does the ns -> us conversion).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deployment-independent timestamp rendering (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # runtime re-planning: coalesce post-shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime row-level bloom pruning: a selective join side injects a
    # bloom filter into the other side's scan (big win for the
    # semi-join-heavy dedup pipelines at scale; no-op on tiny inputs).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Arrow for the pandas-UDF slow path (similarity/multimodal/chaos).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable confs to a session we did not create."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-runtime-settable in some deployments; best effort.
            pass
    return spark


def get_spark(
    app_name: str = "mapreduce_task_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real
    cluster the caller passes a master URL via ``$SPARK_MASTER`` instead.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    parallelism = os.cpu_count() or 8 if cpus in ("*", None) else int(cpus)
    shuffle_partitions = shuffle_partitions or parallelism

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # keep catalog/metastore artifacts (bucketed-table tests) out of cwd
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config(
            "spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/spark_graft_derby"
        )
        # file-source parallelism: default 128m splits are right at scale;
        # local tests read tiny files so leave as-is (openCostInBytes packs them).
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
