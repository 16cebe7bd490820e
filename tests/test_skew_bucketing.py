"""Skew salting preserves results; bucketed joins drop the Exchange."""

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.skew import salted_join, salted_sum_count
from mapreduce_task_spark.sources.bucketing import (
    bucketed,
    plan_has_shuffle,
    write_bucketed,
)


def test_salted_agg_equals_plain(spark):
    # key 'hot' is 100x skewed
    rows = [Row(k="hot", v=i, uid=i) for i in range(500)] + [
        Row(k=f"k{i}", v=i, uid=1000 + i) for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["k"]: (r["sum_v"], r["n"])
        for r in salted_sum_count(df, ["k"], ["v"], "uid", num_salts=8).collect()
    }
    exp = {
        r["k"]: (r["s"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [Row(k="hot", uid=i) for i in range(300)] + [Row(k="cold", uid=900)]
    )
    small = spark.createDataFrame([Row(k="hot", label="H"), Row(k="cold", label="C")])
    got = sorted(
        (r["uid"], r["label"])
        for r in salted_join(big, small, "k", "uid", num_salts=4).collect()
    )
    exp = sorted((r["uid"], r["label"]) for r in big.join(small, "k").collect())
    assert got == exp and len(got) == 301


def test_bucketed_join_has_no_exchange(spark, sf_small):
    from mapreduce_task_spark.sources.tables import load_table

    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b",
        ["o_orderkey"], num_buckets=8,
    )
    # the test tables are tiny enough to broadcast, which would bypass the
    # bucketed sort-merge path entirely; force the fact-fact join shape.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed(spark, "t_orders_b").join(
            bucketed(spark, "t_lineitem_b"), "o_orderkey"
        )
        assert not plan_has_shuffle(joined)
        # the same join on plain (unbucketed) scans must shuffle both sides
        plain = orders.join(li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        assert plan_has_shuffle(plain)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
