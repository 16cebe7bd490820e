"""Subquery shapes, map-type scalars, and two more TPC-H analogues.

SURVEY.md §2.5 lists "Subqueries" and "map scalar functions" among the
categories the reference (oscar-osu/mapreduce-task — three MapReduce jobs,
no query language at all) does not implement; these queries declare-and-test
Spark's built-in coverage with DuckDB oracles, following the determinism
rules of queries/relational.py (decimal accumulation, aliased columns,
unique tie-breakers).

Scale notes (SCALE.md applies):
- scalar subqueries become a 1-row broadcast cross join — no shuffle of
  the probe side, identical plan shape at any fact size;
- IN-subqueries are left-semi joins (only the key column of the subquery
  side shuffles; Catalyst picks broadcast when the build side is small);
- q6 is scan+filter+single partial/final agg: pure map-side until one
  1-row exchange; q10 is the classic fact-fact join + broadcast dims +
  TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, functions as F

from ..registry import query, t


def _dec(col: str | Column, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: highly selective conjunctive filter + ungrouped "
    "aggregate. All four predicates push into the parquet scan "
    "(PushedFilters); the agg is map-side partial + one 1-row exchange.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue by customer. Fact-fact "
    "shuffle join (orders x lineitem) with filters pushed to both scans, "
    "broadcast nation dim, grouped decimal agg, global top-20 via "
    "TakeOrderedAndProject (k-row heaps per partition, no full sort).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    joined = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


@query(
    "subquery_shapes",
    oracle="""
    SELECT 'subq' AS leg, p_partkey AS k, CAST(p_size AS INT) AS v,
           CAST(NULL AS VARCHAR) AS s
    FROM part
    WHERE p_size > (SELECT max(p_size) - 5 FROM part)
      AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 40)
    UNION ALL
    SELECT 'semi' AS leg, c_custkey AS k, CAST(NULL AS INT) AS v, c_name AS s
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'anti' AS leg, c_custkey AS k, CAST(NULL AS INT) AS v, c_name AS s
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    UNION ALL
    SELECT 'set_both' AS leg, n_nationkey AS k, CAST(NULL AS INT) AS v,
           CAST(NULL AS VARCHAR) AS s
    FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'set_customer_only' AS leg, n_nationkey AS k, CAST(NULL AS INT) AS v,
           CAST(NULL AS VARCHAR) AS s
    FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
    doc="Subquery + semi/anti-join + set-operation coverage (absent in the "
    "reference, SURVEY §2.5) as a five-leg tagged union: an uncorrelated "
    "scalar subquery (threshold = max(p_size)-5, realized as a 1-row "
    "broadcast cross join -- no recompute per row, no shuffle of the probe "
    "side) composed with an IN-subquery (left-semi join on the filtered "
    "lineitem keys); a left-semi EXISTS and a left-anti NOT-EXISTS against "
    "a filtered build side (only the key column of orders shuffles for "
    "either branch); INTERSECT and EXCEPT DISTINCT legs over the "
    "customer/supplier nation keys. Merges the former join_semi_anti (r4) "
    "and set_ops (r4) rows to free slots inside the driver's 50-entry "
    "record cap.",
)
def q_subquery_shapes(spark: SparkSession, sf_dir: str):
    from ..operators.relational import anti_join, semi_join

    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    thr = part.agg((F.max("p_size") - F.lit(5)).alias("size_thr"))
    nul_i = F.lit(None).cast("int")
    nul_s = F.lit(None).cast("string")
    big = (
        part.join(F.broadcast(thr))
        .filter(F.col("p_size") > F.col("size_thr"))
        .select("p_partkey", F.col("p_size").cast("int").alias("p_size"))
    )
    sold_heavy = li.filter(F.col("l_quantity") > 40).select("l_partkey")
    subq = (
        big.join(sold_heavy, big.p_partkey == sold_heavy.l_partkey, "left_semi")
        .select(
            F.lit("subq").alias("leg"),
            F.col("p_partkey").alias("k"),
            F.col("p_size").alias("v"),
            nul_s.alias("s"),
        )
    )
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    semi = semi_join(cust, orders, cust.c_custkey == orders.o_custkey).select(
        F.lit("semi").alias("leg"),
        F.col("c_custkey").alias("k"),
        nul_i.alias("v"),
        F.col("c_name").alias("s"),
    )
    heavy = orders.filter(F.col("o_totalprice") > 400000)
    anti = anti_join(cust, heavy, cust.c_custkey == heavy.o_custkey).select(
        F.lit("anti").alias("leg"),
        F.col("c_custkey").alias("k"),
        nul_i.alias("v"),
        F.col("c_name").alias("s"),
    )
    c_nat = cust.select(F.col("c_nationkey").alias("k"))
    s_nat = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    set_both = c_nat.intersect(s_nat).select(
        F.lit("set_both").alias("leg"), "k", nul_i.alias("v"), nul_s.alias("s")
    )
    # subtract = EXCEPT DISTINCT (exceptAll would keep per-copy multiplicity)
    set_conly = c_nat.subtract(s_nat).select(
        F.lit("set_customer_only").alias("leg"),
        "k",
        nul_i.alias("v"),
        nul_s.alias("s"),
    )
    return (
        subq.unionByName(semi)
        .unionByName(anti)
        .unionByName(set_both)
        .unionByName(set_conly)
    )


@query(
    "conditional_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
           count(*) AS n_lines
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shape (adapted to the synthetic schema, which has no "
    "l_shipmode/l_receiptdate): fact-fact join + CASE-WHEN conditional "
    "aggregation. Integer sums -- exact, no float-order sensitivity. "
    "Pivot-style conditional counts are pure map-side exprs before the "
    "partial agg.",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str):
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "scalar_json_map_funcs",
    oracle="""
    SELECT 'scalar' AS leg, p_partkey AS k,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 8) AS name8,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '#', p_type) AS brand_type,
           CAST(abs(p_size - 25) AS INT) AS size_dist,
           CAST(p_size % 7 AS INT) AS size_mod,
           CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * 110 / 100, 2) AS DOUBLE) AS price_plus_10pct,
           CAST(year(ship_ts) AS INT) AS ship_y,
           CAST(month(ship_ts) AS INT) AS ship_m,
           CAST(quarter(ship_ts) AS INT) AS ship_q,
           CAST(NULL AS BIGINT) AS k_json,
           CAST(NULL AS VARCHAR) AS type_from_map,
           CAST(NULL AS VARCHAR) AS k_from_map,
           CAST(NULL AS INT) AS n_entries,
           CAST(NULL AS VARCHAR) AS keys_sorted_csv,
           CAST(NULL AS VARCHAR) AS concat_probe
    FROM (SELECT p.*, TIMESTAMP '1995-01-01' + to_days(CAST(p_partkey % 1461 AS INTEGER)) AS ship_ts
          FROM part p)
    UNION ALL
    SELECT 'jsonmap' AS leg, event_id AS k,
           CAST(NULL AS VARCHAR) AS brand_u, CAST(NULL AS VARCHAR) AS name8,
           CAST(NULL AS INT) AS name_len, CAST(NULL AS VARCHAR) AS brand_type,
           CAST(NULL AS INT) AS size_dist, CAST(NULL AS INT) AS size_mod,
           CAST(NULL AS DOUBLE) AS price_plus_10pct,
           CAST(NULL AS INT) AS ship_y, CAST(NULL AS INT) AS ship_m,
           CAST(NULL AS INT) AS ship_q,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json,
           event_type AS type_from_map,
           json_extract_string(props, '$.k') AS k_from_map,
           CAST(2 AS INT) AS n_entries,
           concat('k,type') AS keys_sorted_csv,
           'marker' AS concat_probe
    FROM events
    """,
    doc="Scalar-function breadth as a two-leg tagged union (merges the "
    "former scalar_funcs / json_map_funcs rows to free a slot inside "
    "the driver's 50-entry cap, round 5). scalar leg: string (upper/"
    "substring/length/concat), math (abs/mod/round — exact decimal "
    "arithmetic), date-part extraction on a derived TIMESTAMP_NTZ. "
    "jsonmap leg: get_json_object over events.props, then "
    "map_from_arrays / element_at / size / map_keys / map_concat — the "
    "map is built and consumed inside the plan (maps never cross the "
    "engine boundary; the oracle checks the extracted scalars), so "
    "Catalyst folds it to pure columnar exprs.",
)
def q_scalar_json_map_funcs(spark: SparkSession, sf_dir: str):
    nul_i = F.lit(None).cast("int")
    nul_b = F.lit(None).cast("bigint")
    nul_d = F.lit(None).cast("double")
    nul_s = F.lit(None).cast("string")

    p = t(spark, sf_dir, "part")
    ship_ts = F.timestamp_add(
        "DAY",
        (F.col("p_partkey") % 1461).cast("int"),
        F.lit("1995-01-01").cast("timestamp_ntz"),
    )
    scalar = p.withColumn("ship_ts", ship_ts).select(
        F.lit("scalar").alias("leg"),
        F.col("p_partkey").alias("k"),
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.round(_dec("p_retailprice") * 110 / 100, 2)
        .cast("double")
        .alias("price_plus_10pct"),
        F.year("ship_ts").cast("int").alias("ship_y"),
        F.month("ship_ts").cast("int").alias("ship_m"),
        F.quarter("ship_ts").cast("int").alias("ship_q"),
        nul_b.alias("k_json"),
        nul_s.alias("type_from_map"),
        nul_s.alias("k_from_map"),
        nul_i.alias("n_entries"),
        nul_s.alias("keys_sorted_csv"),
        nul_s.alias("concat_probe"),
    )

    ev = t(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("k")),
        F.array(F.col("event_type"), F.get_json_object("props", "$.k")),
    )
    merged = F.map_concat(m, F.create_map(F.lit("probe"), F.lit("marker")))
    jsonmap = ev.select(
        F.lit("jsonmap").alias("leg"),
        F.col("event_id").alias("k"),
        nul_s.alias("brand_u"),
        nul_s.alias("name8"),
        nul_i.alias("name_len"),
        nul_s.alias("brand_type"),
        nul_i.alias("size_dist"),
        nul_i.alias("size_mod"),
        nul_d.alias("price_plus_10pct"),
        nul_i.alias("ship_y"),
        nul_i.alias("ship_m"),
        nul_i.alias("ship_q"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_json"),
        F.element_at(m, "type").alias("type_from_map"),
        F.element_at(m, "k").alias("k_from_map"),
        F.size(m).cast("int").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted_csv"),
        F.element_at(merged, "probe").alias("concat_probe"),
    )
    return scalar.unionByName(jsonmap)
