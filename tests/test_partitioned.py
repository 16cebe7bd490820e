"""Partitioned writes: layout, dynamic overwrite, partition pruning."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from mapreduce_task_spark.sources.partitioned import (
    partition_filters,
    with_date_partition,
    write_partitioned,
)
from mapreduce_task_spark.sources.tables import load_table


def test_partitioned_write_prune_and_dynamic_overwrite(spark, sf_small):
    d = tempfile.mkdtemp(prefix="events_part_")
    try:
        ev = with_date_partition(load_table(spark, sf_small, "events"))
        write_partitioned(ev, d, ["dt"])
        days = sorted(x for x in os.listdir(d) if x.startswith("dt="))
        assert len(days) >= 25  # one directory per event day

        back = spark.read.parquet(d)
        one_day = back.filter(F.col("dt") == days[0].split("=")[1])
        pf = partition_filters(one_day)
        assert "dt" in pf  # predicate reached PartitionFilters -> pruned scan
        assert one_day.count() == ev.filter(F.col("dt") == days[0].split("=")[1]).count()

        # dynamic overwrite: rewriting ONE day's slice must leave others intact
        total_before = back.count()
        day0_count = one_day.count()
        day0 = ev.filter(F.col("dt") == days[0].split("=")[1]).limit(5)
        write_partitioned(day0, d, ["dt"], dynamic=True)
        spark.catalog.refreshByPath(d)  # drop the cached file listing
        after = spark.read.parquet(d)
        assert after.filter(F.col("dt") == days[0].split("=")[1]).count() == 5
        assert after.count() == total_before - day0_count + 5
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_write_sorted_ranges_disjoint_and_internally_sorted(spark, sf_small):
    """Each output file must hold an internally-sorted, pairwise-disjoint
    event_id range (zone-map layout), and a point predicate must prune
    file reads via parquet min/max stats."""
    import pyarrow.parquet as pq

    from mapreduce_task_spark.sources.partitioned import write_sorted_ranges

    d = tempfile.mkdtemp(prefix="events_sorted_")
    try:
        ev = load_table(spark, sf_small, "events").select(
            "event_id", "user_id", "event_type"
        )
        write_sorted_ranges(ev, d, ["event_id"], num_files=8)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert 2 <= len(files) <= 8
        ranges = []
        for f in files:
            ids = pq.read_table(os.path.join(d, f), columns=["event_id"])[
                "event_id"
            ].to_pylist()
            assert ids == sorted(ids)  # internally sorted
            ranges.append((min(ids), max(ids)))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2  # disjoint key ranges across files
        # nothing lost, nothing duplicated
        back = spark.read.parquet(d)
        assert back.count() == ev.count()
        assert back.select(F.sum("event_id")).collect()[0][0] == \
            ev.select(F.sum("event_id")).collect()[0][0]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_compact_parquet_reduces_file_count_losslessly(spark, sf_small):
    from mapreduce_task_spark.sources.partitioned import compact_parquet, dir_bytes

    src = tempfile.mkdtemp(prefix="tiny_files_")
    out = tempfile.mkdtemp(prefix="compacted_")
    try:
        ev = load_table(spark, sf_small, "events")
        ev.repartition(64).write.mode("overwrite").parquet(src)  # tiny-file mess
        n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
        assert n_src == 64

        total = dir_bytes(spark, src)
        assert total > 0
        # target ~ a third of the data -> ~3 output files
        n = compact_parquet(spark, src, out, target_file_bytes=total // 3 + 1)
        n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
        assert n_out == n <= 4 and n_out < n_src

        back = spark.read.parquet(out)
        assert back.count() == ev.count()
        assert (
            back.select(F.sum("event_id")).collect()[0][0]
            == ev.select(F.sum("event_id")).collect()[0][0]
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
