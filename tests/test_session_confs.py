"""Session-conf regression tests + an AQE runtime-replan proof.

The conf set in session.RUNTIME_CONFS is the scale contract (AQE,
skew-join splitting, bloom pruning, UTC, Arrow); losing any of these
silently changes plans or timestamp semantics everywhere.
"""

from pyspark.sql import functions as F

from mapreduce_task_spark.session import RUNTIME_CONFS


def test_runtime_confs_active_on_test_session(spark):
    for key, want in RUNTIME_CONFS.items():
        assert spark.conf.get(key) == want, key


def test_aqe_coalesces_shuffle_partitions_at_runtime(spark):
    """AQE's runtime re-plan is the 'tune shuffle.partitions once,
    right-size at runtime' story: a tiny aggregate must NOT produce
    spark.sql.shuffle.partitions output partitions — after execution
    the adaptive plan shows coalesced shuffle reads."""
    df = (
        spark.range(0, 10_000, 1, 8)
        .select((F.col("id") % 50).alias("k"))
        .groupBy("k")
        .count()
    )
    df.collect()  # materialize so AQE finalizes the adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan
    n_parts = df.rdd.getNumPartitions()
    assert n_parts < int(spark.conf.get("spark.sql.shuffle.partitions"))
