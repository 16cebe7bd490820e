"""Relational breadth queries (SURVEY.md §7.2 v4).

The reference has no joins/windows/rollups/set-ops/limits (SURVEY §2.5);
these queries declare-and-test Spark's built-in coverage over the star
schema, each with a DuckDB oracle.

Determinism rules used throughout:
- money/double aggregates computed in DECIMAL, cast to DOUBLE at the
  end (both engines) -> no float accumulation-order sensitivity;
- averages = CAST(decimal_sum AS DOUBLE)/count, never engine avg()
  (decimal-division scale rules differ between engines);
- every ORDER BY ... LIMIT has a unique tie-breaker.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, Window, functions as F

from ..operators.relational import (
    broadcast_join,
    grouped_top_k,
    sessionize,
    top_k,
)
from ..registry import query, t


def _dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent double sum (decimal accumulate, double out)."""
    return F.sum(_dec(col, scale)).cast("double")


# --------------------------------------------------------------------------
# aggregation: TPC-H Q1 analogue
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan -> filter -> partial+final hash aggregate. "
    "Filter and 6-column projection push into the parquet scan.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------
@query(
    "join_broadcast",
    oracle="""
    SELECT r_name, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="Star join with explicitly broadcast dimensions: no shuffle of the "
    "fact side for the join, only for the final tiny aggregation.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str):
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    return (
        broadcast_join(cust, nat, cust.c_nationkey == nat.n_nationkey)
        .transform(lambda df: broadcast_join(df, reg, df.n_regionkey == reg.r_regionkey))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum("c_acctbal").alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


@query(
    "join_topk_orders",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="Fact-fact shuffle join (sort-merge/shuffled-hash under AQE) + "
    "global top-k via TakeOrderedAndProject (k-row heaps, no global window).",
)
def q_join_topk_orders(spark: SparkSession, sf_dir: str):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    rev = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    return top_k(rev, 10, F.col("revenue").desc(), F.col("o_orderkey").asc())


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
    doc="Per-group top-k: window partitioned by the group key — "
    "parallelism scales with group count, no global sort.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str):
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return grouped_top_k(
        orders,
        ["o_custkey"],
        2,
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------
@query(
    "window_ops",
    oracle="""
    SELECT 'funcs' AS leg, event_id, user_id,
           row_number() OVER w AS rn,
           lag(event_type) OVER w AS prev_type,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           CAST(NULL AS VARCHAR) AS window_start, CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS sum_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    UNION ALL
    SELECT 'tumbling' AS leg, CAST(NULL AS BIGINT) AS event_id,
           CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS BIGINT) AS rn,
           CAST(NULL AS VARCHAR) AS prev_type, CAST(NULL AS DOUBLE) AS running_value,
           strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
    doc="Window-function coverage as a two-leg tagged union (merges the "
    "former window_funcs / window_tumbling rows to free a slot inside "
    "the driver's 50-entry cap, round 5). funcs leg: row_number / lag / "
    "running decimal sum over per-user event streams — every window "
    "partitioned by user, parallelism scales with user count. tumbling "
    "leg: 1h tumbling-window aggregation in batch — the same "
    "groupBy(window()) shape Structured Streaming uses "
    "(streaming/windows.py).",
)
def q_window_ops(spark: SparkSession, sf_dir: str):
    ev = t(spark, sf_dir, "events")
    nul_b = F.lit(None).cast("bigint")
    nul_d = F.lit(None).cast("double")
    nul_s = F.lit(None).cast("string")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    funcs = ev.select(
        F.lit("funcs").alias("leg"),
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.sum(_dec("value"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_value"),
        nul_s.alias("window_start"),
        nul_s.alias("event_type"),
        nul_b.alias("n"),
        nul_d.alias("sum_value"),
    )
    tumbling = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("value").alias("sum_value"),
        )
        .select(
            F.lit("tumbling").alias("leg"),
            nul_b.alias("event_id"),
            nul_b.alias("user_id"),
            nul_b.alias("rn"),
            nul_s.alias("prev_type"),
            nul_d.alias("running_value"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return funcs.unionByName(tumbling)


@query(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_idx
    """,
    doc="Sessionization: 30-min inactivity gap -> lag + running conditional "
    "sum, both windows per-user (the batch analogue of session_window).",
)
def q_sessionize(spark: SparkSession, sf_dir: str):
    ev = t(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", 1800, "event_id")
    return s.groupBy("user_id", "session_idx").agg(F.count(F.lit(1)).alias("n_events"))


# --------------------------------------------------------------------------
# grouping sets / rollup / cube
# --------------------------------------------------------------------------
@query(
    "rollup_cube_agg",
    oracle="""
    SELECT 'rollup' AS op, l_returnflag AS k1, l_linestatus AS k2,
           CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS op, o_orderstatus AS k1, o_orderpriority AS k2,
           CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS op, n.n_name AS k1, o.o_orderpriority AS k2,
           CAST(grouping_id(n.n_name, o.o_orderpriority) AS BIGINT) AS gid,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
           count(*) AS n
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
    """,
    doc="ROLLUP (lineitem), CUBE (orders), and explicit GROUPING SETS "
    "(orders x customer x nation, the general form via the SQL API) with "
    "grouping_id in one tagged inventory query (same bitmask semantics in "
    "both engines).",
)
def q_rollup_cube_agg(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    roll = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            _dsum("l_quantity").alias("sum_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("rollup").alias("op"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "gid",
            "sum_val",
            "n",
        )
    )
    cube = (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            _dsum("o_totalprice").alias("sum_val"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.lit("cube").alias("op"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "gid",
            "sum_val",
            "n",
        )
    )
    for name in ("orders", "customer", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"__gs_{name}")
    gsets = spark.sql(
        """
SELECT 'gsets' AS op, n.n_name AS k1, o.o_orderpriority AS k2,
       CAST(grouping_id(n.n_name, o.o_orderpriority) AS BIGINT) AS gid,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
       count(*) AS n
FROM __gs_orders o
JOIN __gs_customer c ON o.o_custkey = c.c_custkey
JOIN __gs_nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
"""
    )
    return roll.unionByName(cube).unionByName(gsets)


# --------------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# scalar function breadth: date / JSON / string+math / array
# --------------------------------------------------------------------------
# (scalar_funcs merged into subqueries.py scalar_json_map_funcs, round 5)


# (window_tumbling merged into window_ops above, round 5)
