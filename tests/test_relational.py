import datetime as dt

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.relational import (
    anti_join,
    grouped_top_k,
    semi_join,
    sessionize,
    top_k,
)


def test_top_k_deterministic_with_tiebreak(spark):
    df = spark.createDataFrame([Row(k=i % 3, v=float(i % 3), id=i) for i in range(30)])
    out = top_k(df, 5, F.col("v").desc(), F.col("id").asc()).collect()
    assert [(r["v"], r["id"]) for r in out] == [(2.0, 2), (2.0, 5), (2.0, 8), (2.0, 11), (2.0, 14)]


def test_grouped_top_k(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=1), Row(g="a", v=3), Row(g="a", v=2), Row(g="b", v=9)]
    )
    out = grouped_top_k(df, ["g"], 2, F.col("v").desc(), F.col("v").asc())
    got = sorted((r["g"], r["v"], r["rn"]) for r in out.collect())
    assert got == [("a", 2, 2), ("a", 3, 1), ("b", 9, 1)]


def test_semi_anti_partition_rows(spark):
    left = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    right = spark.createDataFrame([Row(k=2), Row(k=2)])
    assert [r["k"] for r in semi_join(left, right, "k").collect()] == [2]
    assert sorted(r["k"] for r in anti_join(left, right, "k").collect()) == [1, 3]


def test_sessionize_gap_splits(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(user_id=1, ts=t0, event_id=1),
        Row(user_id=1, ts=t0 + dt.timedelta(minutes=10), event_id=2),
        Row(user_id=1, ts=t0 + dt.timedelta(minutes=70), event_id=3),  # new session
        Row(user_id=2, ts=t0, event_id=4),
    ]
    df = spark.createDataFrame(rows)
    out = sessionize(df, "user_id", "ts", gap_seconds=1800, tiebreak_col="event_id")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_pivot_matches_conditional_agg(spark, sf_small):
    """groupBy().pivot() (Spark's pivot surface) must agree with the
    explicit CASE-WHEN conditional aggregation shape used by the
    conditional_agg driver query."""
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    types = ["click", "view", "purchase"]
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    manual = ev.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
            for t in types
        ]
    )
    assert sorted(map(tuple, pivoted.collect())) == sorted(map(tuple, manual.collect()))


def test_unpivot_inverts_pivot(spark, sf_small):
    """unpivot/melt (the wide->long inverse of groupBy().pivot()):
    melting the pivoted per-type counts reproduces the original
    (user, type, n) aggregate exactly, nulls dropped."""
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    long_truth = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wide = ev.groupBy("user_id").pivot("event_type", sorted(types)).count()
    melted = wide.unpivot(
        ids=["user_id"],
        values=sorted(types),
        variableColumnName="event_type",
        valueColumnName="n",
    ).filter(F.col("n").isNotNull())
    got = {(r["user_id"], r["event_type"]): r["n"] for r in melted.collect()}
    assert got == long_truth and len(got) > 0


def test_funnel_counts_match_python_replay(spark, sf_small):
    """Ordered funnel vs an exact python replay over the real events
    (per-user timeline sorted by (ts, event_id), cursor advance)."""
    from mapreduce_task_spark.operators.relational import funnel_counts
    from mapreduce_task_spark.sources.tables import load_table

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, sf_small, "events")
    rows = ev.select("user_id", "ts", "event_id", "event_type").collect()
    by_user = {}
    for r in rows:
        if r["event_type"] in steps:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    want = {i + 1: 0 for i in range(len(steps))}
    for tl in by_user.values():
        cur = 0
        for _, _, t in sorted(tl):
            if cur < len(steps) and t == steps[cur]:
                cur += 1
        for i in range(1, cur + 1):
            want[i] += 1

    got = {
        r["step_idx"]: (r["step"], r["n_keys"])
        for r in funnel_counts(ev, steps).collect()
    }
    assert got == {i: (steps[i - 1], want[i]) for i in want}
    # monotone non-increasing
    ns = [got[i][1] for i in sorted(got)]
    assert ns == sorted(ns, reverse=True) and ns[0] > 0


def test_funnel_counts_zero_step_rows_present(spark, sf_small):
    from mapreduce_task_spark.operators.relational import funnel_counts
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    got = funnel_counts(ev, ["view", "click", "signup", "error"]).collect()
    assert [r["step_idx"] for r in got] == [1, 2, 3, 4]


def test_funnel_counts_conversion_window(spark, sf_small):
    """within='1 hour': steps beyond the first only count inside the
    attribution window from the step-1 match — python-replay verified;
    windowed counts are <= unbounded counts step-by-step."""
    from datetime import timedelta

    from mapreduce_task_spark.operators.relational import funnel_counts
    from mapreduce_task_spark.sources.tables import load_table

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, sf_small, "events")
    rows = ev.select("user_id", "ts", "event_id", "event_type").collect()
    by_user = {}
    for r in rows:
        if r["event_type"] in steps:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    want = {i + 1: 0 for i in range(len(steps))}
    horizon = timedelta(hours=1)
    for tl in by_user.values():
        cur, start = 0, None
        for ts, _, t in sorted(tl):
            if cur == 0 and t == steps[0]:
                cur, start = 1, ts
            elif 0 < cur < len(steps) and t == steps[cur] and ts <= start + horizon:
                cur += 1
        for i in range(1, cur + 1):
            want[i] += 1

    got = {
        r["step_idx"]: r["n_keys"]
        for r in funnel_counts(ev, steps, within="1 hour").collect()
    }
    assert got == want
    unbounded = {
        r["step_idx"]: r["n_keys"] for r in funnel_counts(ev, steps).collect()
    }
    assert all(got[i] <= unbounded[i] for i in got)
    assert got[1] == unbounded[1]  # step 1 has no window constraint


def test_sql_frontend_parity_with_dataframe_plan(spark, sf_small):
    """The engine's SQL face: the same logical query written as a SQL
    string over registered views returns exactly the DataFrame API's
    result (Catalyst compiles both to one plan family) — a user can
    drive this engine from pure SQL."""
    from mapreduce_task_spark.sources.tables import load_table

    li = load_table(spark, sf_small, "lineitem")
    li.createOrReplaceTempView("v_lineitem")
    sql_rows = spark.sql(
        """
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM v_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag
        """
    ).collect()
    df_rows = (
        li.filter(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    key = lambda r: r["l_returnflag"]  # noqa: E731
    assert sorted(map(tuple, sql_rows), key=lambda t: t[0]) == sorted(
        map(tuple, df_rows), key=lambda t: t[0]
    )


def test_funnel_counts_max_events_per_key_caps_timeline(spark, sf_small):
    """max_events_per_key=N must equal a python replay over each key's
    FIRST N step events by (ts, event_id); a huge cap equals uncapped."""
    from mapreduce_task_spark.operators.relational import funnel_counts
    from mapreduce_task_spark.sources.tables import load_table

    steps = ["view", "click", "purchase"]
    cap = 5
    ev = load_table(spark, sf_small, "events")
    rows = ev.select("user_id", "ts", "event_id", "event_type").collect()
    by_user = {}
    for r in rows:
        if r["event_type"] in steps:
            by_user.setdefault(r["user_id"], []).append(
                (r["ts"], r["event_id"], r["event_type"])
            )
    want = {i + 1: 0 for i in range(len(steps))}
    for tl in by_user.values():
        cur = 0
        for _, _, t in sorted(tl)[:cap]:
            if cur < len(steps) and t == steps[cur]:
                cur += 1
        for i in range(1, cur + 1):
            want[i] += 1

    got = {
        r["step_idx"]: r["n_keys"]
        for r in funnel_counts(ev, steps, max_events_per_key=cap).collect()
    }
    assert got == want
    uncapped = {
        r["step_idx"]: r["n_keys"] for r in funnel_counts(ev, steps).collect()
    }
    huge = {
        r["step_idx"]: r["n_keys"]
        for r in funnel_counts(ev, steps, max_events_per_key=10**6).collect()
    }
    assert huge == uncapped
    assert all(got[i] <= uncapped[i] for i in got)
