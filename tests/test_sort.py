from pyspark.sql import Row

from mapreduce_task_spark.operators.sortops import global_rank, total_sort

from .fixtures import SORT_GOLDEN, SORT_LINES


def _df(spark, lines):
    return spark.createDataFrame([Row(value=l) for l in lines])


def test_total_sort_golden(spark):
    out = [r["value"] for r in total_sort(_df(spark, SORT_LINES), "value").collect()]
    assert out == SORT_GOLDEN


def test_total_sort_preserves_duplicates(spark):
    # A3: reduce emits one line per input duplicate (TraceSortReducer.java:117-120)
    out = [r["value"] for r in total_sort(_df(spark, SORT_LINES + ["apple"]), "value").collect()]
    assert out == sorted(SORT_LINES + ["apple"])
    assert out.count("apple") == 2


def test_global_rank_matches_sorted_position(spark):
    df = _df(spark, SORT_LINES)
    got = {r["value"]: r["rk"] for r in global_rank(df, "value", num_partitions=4).collect()}
    assert got == {v: i + 1 for i, v in enumerate(SORT_GOLDEN)}


def test_global_rank_many_partitions_larger_than_rows(spark):
    df = _df(spark, ["b", "a"])
    got = sorted((r["rk"], r["value"]) for r in global_rank(df, "value", num_partitions=16).collect())
    assert got == [(1, "a"), (2, "b")]
