"""Streaming operators: file-source micro-batches vs batch equivalence,
and the arbitrary-stateful running count."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mapreduce_task_spark.sources.tables import load_table
from mapreduce_task_spark.streaming import (
    stateful_running_count,
    stream_from_directory,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_small):
    """events table re-written as a 4-file parquet directory (so the
    file stream has several input files)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_small, "events").repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_counts_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in tumbling_counts(batch).collect()
    }
    stream = stream_from_directory(spark, events_dir, batch.schema)
    assert stream.isStreaming
    _run_stream(tumbling_counts(stream), "t_tumble")
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("select * from t_tumble").collect()
    }
    assert got == expected and len(got) > 0


def test_stateful_running_count_totals(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stream = stream_from_directory(
        spark, events_dir, batch.schema, maxFilesPerTrigger=1
    )
    q = (
        stateful_running_count(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last update per key == total count
    final = {
        r["event_type"]: r["n"]
        for r in spark.sql(
            "select event_type, max(n) as n from t_state group by event_type"
        ).collect()
    }
    assert final == expected and len(final) > 0
