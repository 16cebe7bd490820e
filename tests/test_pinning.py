"""Focused tests for operators.pinning — the r14 tiny-pin variant.

``lazy_checkpoint_tiny`` compiles a hyperparameter-bounded frame's pin
with AQE off and a clamped shuffle-partition count so the pin is
genuinely lazy (no eager per-round stage cascade). These pin the three
properties the optimization relies on: result identity with the plain
lazy pin, the partition clamp actually reaching the compiled RDD, and
the session confs being restored afterwards (the pin mutates
session-global confs around the compile — a leak would silently
de-AQE every later query in the session).
"""

from pyspark.sql import functions as F

from mapreduce_task_spark.operators.pinning import (
    lazy_checkpoint,
    lazy_checkpoint_tiny,
)


def _small_agg(spark):
    # a k-group aggregate over a wider input — the codebook/centroid
    # fit shape the tiny pin is for
    return (
        spark.range(0, 10_000)
        .select((F.col("id") % 8).alias("j"), F.col("id").alias("v"))
        .groupBy("j")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )


def test_tiny_pin_results_match_plain_lazy_pin(spark):
    a = sorted(lazy_checkpoint(_small_agg(spark)).collect())
    b = sorted(lazy_checkpoint_tiny(_small_agg(spark)).collect())
    assert a == b


def test_tiny_pin_clamps_partitions_and_restores_confs(spark):
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    sp_before = spark.conf.get("spark.sql.shuffle.partitions")

    pinned = lazy_checkpoint_tiny(_small_agg(spark))
    # the compiled (checkpoint-marked) RDD carries the clamped
    # partition count: its shuffle was planned at <= 8 partitions
    assert pinned.rdd.getNumPartitions() <= 8

    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert spark.conf.get("spark.sql.shuffle.partitions") == sp_before
    # and a frame compiled AFTER the pin is adaptive again
    assert aqe_before == "true"


def test_tiny_pin_restores_confs_on_compile_failure(spark):
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")
    sp_before = spark.conf.get("spark.sql.shuffle.partitions")
    # an unresolvable frame: fails during construction or inside the
    # pin's compile depending on when analysis runs — either way the
    # pin's finally must leave the session confs untouched
    try:
        lazy_checkpoint_tiny(_small_agg(spark).select(F.col("does_not_exist")))
    except Exception:
        pass
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
    assert spark.conf.get("spark.sql.shuffle.partitions") == sp_before
