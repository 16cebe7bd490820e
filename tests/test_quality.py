"""operators.quality: one-pass constraint checks + referential integrity."""

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.quality import (
    completeness,
    in_range,
    is_in,
    matches,
    referential_integrity,
    run_checks,
    uniqueness,
)
from mapreduce_task_spark.sources.tables import load_table


def test_run_checks_single_pass_on_real_tables(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    checks = [
        completeness("event_id"),
        uniqueness("event_id"),
        completeness("event_type"),
        is_in("event_type", ["view", "click", "purchase", "signup", "error"]),
        in_range("value", 0.0, 1e6),
        matches("props", r"\{.*\}"),
    ]
    out = run_checks(ev, checks)
    rows = {(r["check"], r["column"]): r for r in out.collect()}
    assert len(rows) == len(checks)
    # the synthetic events table is clean: everything passes at 1.0
    for r in rows.values():
        assert r["passed"] and abs(r["metric"] - 1.0) < 1e-12
    # exactly ONE scan of the fact side (an executed AQE plan prints
    # Final AND Initial sections — count inside the final plan only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1


def test_checks_fail_on_planted_violations(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=10.0, tag="a"),
            Row(k=1, v=999.0, tag="b"),  # dup key + out-of-range
            Row(k=2, v=None, tag="zzz"),  # null v + disallowed tag
        ]
    )
    out = {
        (r["check"], r["column"]): r
        for r in run_checks(
            df,
            [
                uniqueness("k"),
                completeness("v", min_fraction=0.9),
                in_range("v", 0.0, 100.0),
                is_in("tag", ["a", "b"]),
            ],
        ).collect()
    }
    assert not out[("uniqueness", "k")]["passed"]
    assert abs(out[("uniqueness", "k")]["metric"] - 2 / 3) < 1e-12
    assert not out[("completeness", "v")]["passed"]
    assert not out[("in_range", "v")]["passed"]  # 999 out of [0, 100]
    assert abs(out[("in_range", "v")]["metric"] - 0.5) < 1e-12
    assert abs(out[("is_in", "tag")]["metric"] - 2 / 3) < 1e-12


def test_referential_integrity_counts_orphans(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    cust = load_table(spark, sf_small, "customer")
    [r] = referential_integrity(orders, "o_custkey", cust, "c_custkey").collect()
    assert r["passed"] and r["metric"] == 1.0
    # plant orphans: drop half the customers
    half = cust.filter(F.col("c_custkey") % 2 == 0)
    [r2] = referential_integrity(orders, "o_custkey", half, "c_custkey").collect()
    assert not r2["passed"] and 0.0 < r2["metric"] < 1.0


def test_value_checks_fail_loudly_on_all_null_column(spark):
    """A column that is entirely NULL must FAIL in_range/is_in/matches
    (metric 0.0, passed=false) — not emit NULL passed that a
    `passed == false` gate filter would silently skip."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.quality import (
        in_range,
        is_in,
        matches,
        run_checks,
    )

    df = spark.createDataFrame(
        [Row(v=None), Row(v=None)], schema="v double"
    ).withColumn("s", F.lit(None).cast("string"))
    out = run_checks(
        df,
        [
            in_range("v", 0.0, 1.0),
            is_in("v", [0.0]),
            matches("s", "^a+$"),
        ],
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["metric"] == 0.0
        assert r["passed"] is False


def test_checks_on_empty_table_fail_loudly_not_crash(spark):
    """ANSI mode (Spark 4 default) turns an unguarded 0/0 into a job
    abort — an empty shard must FAIL the gate (metric 0.0, passed
    false), never kill the pipeline. Caught by r8 edge-case audit:
    completeness/uniqueness divided by a raw count(*)."""
    from mapreduce_task_spark.operators.quality import (
        completeness,
        in_range,
        run_checks,
        uniqueness,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    rows = run_checks(
        empty,
        [completeness("doc_id"), uniqueness("doc_id"), in_range("doc_id", 0, 9)],
    ).collect()
    assert [r["metric"] for r in rows] == [0.0, 0.0, 0.0]
    assert all(r["passed"] is False for r in rows)


def test_corpus_report_on_empty_corpus(spark):
    """Empty corpus: global metrics report 0.0 (checks fail loudly,
    dup rate and token total zero), lang mix has no rows."""
    from mapreduce_task_spark.queries.pipeline_e2e import corpus_report

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    rows = {(r["metric"], r["key"]): r["value"] for r in corpus_report(empty).collect()}
    assert rows[("exact_dup_rate", "text")] == 0.0
    assert rows[("total_ws_tokens", "text")] == 0.0
    assert rows[("check:completeness", "doc_id")] == 0.0
    assert not [k for k in rows if k[0] == "lang_docs"]


def test_referential_integrity_duplicate_dim_keys_and_null_facts(spark):
    """The r13 single-aggregate rewrite (left join + conditional count
    instead of count + left-anti count) is only metric-equivalent
    because the key set is DISTINCT before the join — duplicate dim
    keys must not multiply fact rows into the total, and NULL fact
    keys must still count as orphans (a NULL never equi-matches)."""
    fact = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=2), Row(k=None), Row(k=5)]
    )
    dim = spark.createDataFrame([Row(d=1), Row(d=1), Row(d=1), Row(d=2)])
    [r] = referential_integrity(fact, "k", dim, "d").collect()
    # 5 fact rows: k=1 x2 and k=2 resolve; NULL and 5 are orphans
    assert abs(r["metric"] - 3 / 5) < 1e-12
    assert not r["passed"]
