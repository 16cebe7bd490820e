"""Unit test for tools/plan_report.py's plan-string summarizer — the
tool is a reviewable artifact, so its parsing must not rot silently."""

import importlib.util
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "plan_report", Path(__file__).parent.parent / "tools" / "plan_report.py"
)
plan_report = importlib.util.module_from_spec(spec)
spec.loader.exec_module(plan_report)


_PLAN = """AdaptiveSparkPlan isFinalPlan=false
+- Exchange hashpartitioning(doc_id#1L, 32)
   +- BroadcastExchange HashedRelationBroadcastMode
      +- Exchange rangepartitioning(word#2 ASC NULLS FIRST, 32)
         +- ArrowEvalPython [f(x)#3]
            +- FileScan parquet [doc_id#1L,text#2] ... PushedFilters: [IsNotNull(doc_id)], ReadSchema: struct<doc_id:bigint,text:string>
               +- FileScan parquet [x#9] ... PushedFilters: [], ReadSchema: struct<x:int>
"""


def test_summarize_counts_plan_features():
    s = plan_report.summarize(_PLAN)
    assert s["exchanges"] == {"hash": 1, "range": 1, "single": 0, "broadcast": 1}
    assert s["python_stages"] == {"arrow": 1, "rowwise": 0}
    assert s["cartesian"] == 0
    # only the non-empty PushedFilters list counts
    assert s["pushed_filters"] == 1
    assert s["scans"] == 2
    assert s["read_schema_cols"] == [2, 1]


def test_top_level_field_count_ignores_nested_commas():
    from_schema = plan_report._top_level_fields
    assert from_schema("") == 0
    assert from_schema("a:bigint") == 1
    # decimal(p,s) and map<k,v> commas are NOT field separators
    assert from_schema("o_orderkey:bigint,o_totalprice:decimal(12,2)") == 2
    assert from_schema("m:map<string,int>,a:array<struct<x:int,y:int>>") == 2


def test_python_stage_inventory_covers_future_pandas_nodes():
    plan = "AggregateInPandas [..]\n+- WindowInPandas [..]\n+- PythonMapInArrow [..]"
    s = plan_report.summarize(plan)
    assert s["python_stages"]["arrow"] >= 3
