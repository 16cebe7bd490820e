"""operators.timeseries: resample+gap-fill+ffill, MAD outliers, EWMA."""

import math
from datetime import datetime

import pytest
from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.timeseries import (
    ewma,
    mad_outliers,
    resample_ffill,
)
from mapreduce_task_spark.sources.tables import load_table


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=u,
                ts=datetime.fromisoformat(ts),
                value=float(v),
            )
            for i, (u, ts, v) in enumerate(rows)
        ]
    )


def test_resample_dense_spine_and_gap_flags(spark):
    # user 1: events at 00:xx and 13:xx -> 6h grid buckets 00,06,12 (12 covers 13:xx)
    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 00:10:00", 1.0),
            (1, "2024-01-01 00:50:00", 2.0),
            (1, "2024-01-01 13:00:00", 7.0),
            (2, "2024-01-01 05:00:00", 9.0),
        ],
    )
    out = resample_ffill(ev, interval="6 hours").orderBy("user_id", "bucket")
    rows = out.collect()
    u1 = [r for r in rows if r.user_id == 1]
    # spine: 00:00, 06:00, 12:00 — the 06:00 bucket is a generated gap
    assert [r.bucket.hour for r in u1] == [0, 6, 12]
    assert [r.is_gap for r in u1] == [0, 1, 0]
    assert [r.n_events for r in u1] == [2, 0, 1]
    # bucket 0: last event by event_id is value 2.0; gap forward-fills it
    assert [r.filled_value for r in u1] == [2.0, 2.0, 7.0]
    assert u1[1].last_value is None and u1[1].sum_value == 0.0
    # single-bucket user: spine of exactly one row, no gaps
    u2 = [r for r in rows if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_gap == 0 and u2[0].filled_value == 9.0


def test_resample_real_events_spine_is_exact(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    out = resample_ffill(ev, interval="6 hours")
    # total events are conserved by the left join
    assert (
        out.agg(F.sum("n_events")).first()[0] == ev.count()
    )
    # every user's spine length == (max-min)/6h + 1, with min/max on the grid
    spine = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("bucket").alias("b0"),
        F.max("bucket").alias("b1"),
    )
    bad = spine.filter(
        F.expr("timestampdiff(HOUR, b0, b1)") != (F.col("n") - 1) * 6
    )
    assert bad.count() == 0
    # forward fill: after the first bucket (never a gap — it holds the
    # user's first event), filled_value is never null
    assert out.filter(F.col("filled_value").isNull()).count() == 0


def test_mad_outliers_flags_the_planted_point(spark):
    base = [(1, "2024-01-01 00:00:00", 10.0 + (i % 5) / 100) for i in range(40)]
    planted = [(1, "2024-01-01 01:00:00", 99.0)]
    ev = _mk_events(spark, base + planted).select(
        "event_id", F.lit("click").alias("event_type"), "value"
    )
    out = mad_outliers(ev, group_col="event_type", value_col="value").collect()
    assert len(out) == 1
    assert out[0].value == 99.0
    # deviation is |9900 - median_cents| in half-cents (exact integer)
    assert out[0].dev_halfcents == 2 * abs(9900 - 1002)


def test_mad_outliers_oracle_parity_columns(spark, sf_small):
    ev = load_table(spark, sf_small, "events").select(
        "event_id", "event_type", "value"
    )
    out = mad_outliers(ev)
    assert out.columns == ["event_id", "event_type", "value", "dev_halfcents"]
    # outliers are a strict subset
    n = out.count()
    assert 0 < n < ev.count()


def test_ewma_matches_pandas_reference(spark):
    rows = [(1, f"2024-01-01 00:{m:02d}:00", float(v)) for m, v in
            [(0, 10), (1, 12), (2, 8), (3, 30), (4, 9)]]
    rows += [(2, "2024-01-01 00:00:00", 5.0), (2, "2024-01-01 00:01:00", 7.0)]
    ev = _mk_events(spark, rows)
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(ev, "user_id", "event_id", "value", alpha=0.3).collect()
    }
    pdf = ev.toPandas()
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("event_id")
        ref = grp["value"].ewm(alpha=0.3, adjust=False).mean()
        for eid, want in zip(grp["event_id"], ref):
            assert math.isclose(got[(uid, eid)], want, rel_tol=1e-12)


def test_group_trend_matches_numpy_replay(spark, sf_small):
    import numpy as np

    from mapreduce_task_spark.operators.timeseries import group_trend
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events").select(
        "user_id", F.col("event_id").cast("double").alias("x"), "value"
    )
    got = {
        r["user_id"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in group_trend(ev, "user_id", "x", "value").collect()
    }
    rows = ev.collect()
    series = {}
    for r in rows:
        series.setdefault(r["user_id"], []).append((r["x"], r["value"]))
    for uid, pts in list(series.items())[:25]:
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        n, gs, gi, gr2 = got[uid]
        assert n == len(pts)
        assert math.isclose(gs, slope, rel_tol=1e-8)
        assert math.isclose(gi, intercept, rel_tol=1e-8)
        pred = slope * x + intercept
        r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
        assert math.isclose(gr2, r2, rel_tol=1e-8)


def test_group_trend_degenerate_groups_yield_nulls(spark):
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.timeseries import group_trend

    df = spark.createDataFrame(
        [
            Row(k=1, x=1.0, y=5.0),                     # single point
            Row(k=2, x=3.0, y=1.0), Row(k=2, x=3.0, y=9.0),  # zero x-variance
            Row(k=3, x=0.0, y=1.0), Row(k=3, x=1.0, y=3.0),  # exact line
        ]
    )
    got = {r["k"]: r for r in group_trend(df, "k", "x", "y").collect()}
    assert got[1]["slope"] is None and got[1]["n"] == 1
    assert got[2]["slope"] is None
    assert got[3]["slope"] == 2.0 and got[3]["r2"] == 1.0


def test_group_trend_aggregate_matches_pandas_twin(spark, sf_small):
    """The production aggregate form vs the independent per-key numpy
    residual computation (group_trend_pandas) over the real events."""
    from mapreduce_task_spark.operators.timeseries import (
        group_trend,
        group_trend_pandas,
    )
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events").select(
        "user_id", F.col("event_id").cast("double").alias("x"), "value"
    )
    agg = {
        r["user_id"]: r for r in group_trend(ev, "user_id", "x", "value").collect()
    }
    pnd = {
        r["user_id"]: r
        for r in group_trend_pandas(ev, "user_id", "x", "value").collect()
    }
    assert set(agg) == set(pnd) and len(agg) > 0
    for uid in agg:
        a, p = agg[uid], pnd[uid]
        assert a["n"] == p["n"]
        if p["slope"] is None:
            assert a["slope"] is None and a["r2"] is None
        else:
            assert math.isclose(a["slope"], p["slope"], rel_tol=1e-9)
            assert math.isclose(a["intercept"], p["intercept"], rel_tol=1e-9)
            assert math.isclose(a["r2"], p["r2"], rel_tol=1e-9, abs_tol=1e-12)


def test_group_trend_is_python_free(spark, sf_small):
    """The aggregate form must contain no Python/Arrow stage."""
    from mapreduce_task_spark.operators.timeseries import group_trend
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events").select(
        "user_id", F.col("event_id").cast("double").alias("x"), "value"
    )
    plan = group_trend(ev, "user_id", "x", "value")._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan and "ArrowEvalPython" not in plan


def test_ewma_projects_needed_columns_and_survives_struct_input(spark):
    """ewma output is exactly (key, order, value, ewma); a carried
    struct column must not break the schema round-trip (pre-fix the
    whole input schema was re-serialized via simpleString)."""
    df = spark.createDataFrame(
        [
            Row(user_id=1, event_id=1, value=10.0,
                extra=Row(a=1, b="x")),
            Row(user_id=1, event_id=2, value=20.0,
                extra=Row(a=2, b="y")),
        ],
        schema="user_id bigint, event_id bigint, value double, "
        "extra struct<a:int, b:string>",
    )
    out = ewma(df, "user_id", "event_id", "value", alpha=0.5)
    assert out.columns == ["user_id", "event_id", "value", "ewma"]
    got = {r.event_id: r.ewma for r in out.collect()}
    assert got[1] == 10.0 and got[2] == 15.0


def test_group_trend_exact_tracks_float_and_is_partition_invariant(spark, sf_small):
    """group_trend_exact's integer-moment fit must agree with the float
    covar/var fit to numerical tolerance, and — the property that makes
    it oracle-replayable — be BIT-identical under any repartitioning."""
    from pyspark.sql import functions as F

    from mapreduce_task_spark.operators.timeseries import (
        group_trend,
        group_trend_exact,
    )
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    xy = ev.select(
        "user_id",
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.lit(1_704_000_000)
        ).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    exact = {r["user_id"]: r for r in group_trend_exact(xy, "user_id", "x", "y").collect()}
    flt = {r["user_id"]: r for r in group_trend(xy, "user_id", "x", "y").collect()}
    assert set(exact) == set(flt) and exact
    for k in flt:
        fe, fx = exact[k], flt[k]
        assert fe["n"] == fx["n"]
        if fx["slope"] is None:
            assert fe["slope"] is None
            continue
        assert abs(fe["slope"] - fx["slope"]) <= 1e-9 * max(1.0, abs(fx["slope"]))
        assert abs(fe["r2"] - fx["r2"]) <= 1e-6

    again = {
        r["user_id"]: r
        for r in group_trend_exact(xy.repartition(7), "user_id", "x", "y").collect()
    }
    for k in exact:
        assert again[k]["slope"] == exact[k]["slope"]  # bit-equal
        assert again[k]["intercept"] == exact[k]["intercept"]
        assert again[k]["r2"] == exact[k]["r2"]
