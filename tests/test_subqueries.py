"""Tests for queries/subqueries.py — result sanity + plan-shape assertions.

The oracle gate (tools/oracle_check.py) verifies value-level correctness
against DuckDB; these tests pin the *physical plan* properties that matter
at 100 TB (SCALE.md): pushed-down scan filters for q6, a broadcast (not
shuffled) scalar-subquery threshold, and a semi join for the IN-subquery.
"""

from mapreduce_task_spark.registry import all_queries


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_q6_filters_push_into_scan(spark, sf_small):
    q = all_queries()["q6_forecast_revenue"]
    df = q.fn(spark, sf_small)
    plan = _plan(df)
    # all four predicates reach the parquet reader
    assert "PushedFilters" in plan
    for frag in ["l_shipdate", "l_discount", "l_quantity"]:
        assert frag in plan.split("PushedFilters")[1].split("\n")[0], frag
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["n_items"] > 0


def test_subquery_shapes_broadcasts_threshold(spark, sf_small):
    q = all_queries()["subquery_shapes"]
    df = q.fn(spark, sf_small)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "LeftSemi" in plan
    rows = df.collect()
    assert len(rows) > 0
    # r4: three-leg tagged union — p_size lives in column v on the
    # 'subq' leg (null on the semi/anti legs)
    sizes = {r["v"] for r in rows if r["leg"] == "subq"}
    assert sizes and all(isinstance(s, int) for s in sizes)
    # every surviving size exceeds max-5 by construction
    mx = max(sizes)
    assert all(s > mx - 6 for s in sizes)
    legs = {r["leg"] for r in rows}
    assert legs == {"subq", "semi", "anti", "set_both", "set_customer_only"}


def test_q10_broadcasts_nation_dim(spark, sf_small):
    q = all_queries()["q10_returned_items"]
    df = q.fn(spark, sf_small)
    plan = _plan(df)
    assert "BroadcastExchange" in plan  # nation dim never shuffles the fact side
    assert "TakeOrderedAndProject" in plan  # top-20 via per-partition heaps
    assert df.count() <= 20


def test_json_map_funcs_row_semantics(spark, sf_small):
    q = all_queries()["scalar_json_map_funcs"]
    rows = [
        r for r in q.fn(spark, sf_small).collect() if r["leg"] == "jsonmap"
    ]
    assert rows
    for r in rows[:50]:
        assert r["n_entries"] == 2
        assert r["keys_sorted_csv"] == "k,type"
        assert r["concat_probe"] == "marker"
        # json scalar and map lookup extract the same key
        assert r["k_from_map"] is None or int(r["k_from_map"]) == r["k_json"]
