"""Temporal join operators: as-of, band, bounded-interval pairs."""

import datetime as dt
import itertools

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.temporal import (
    asof_join,
    band_join,
    interval_pairs_per_key,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=_ts(10), lid="a"), Row(k=1, ts=_ts(30), lid="b"), Row(k=2, ts=_ts(5), lid="c")]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=_ts(0), v=100), Row(k=1, ts=_ts(10), v=200), Row(k=1, ts=_ts(20), v=300)]
    )
    got = {r["lid"]: (r["asof_v"], r["asof_ts"]) for r in
           asof_join(left, right, on="k", ts="ts", right_cols=("v",)).collect()}
    assert got["a"] == (200, _ts(10))  # equal ts counts (<=)
    assert got["b"] == (300, _ts(20))
    assert got["c"] == (None, None)  # no right rows for key 2


def test_band_join_boundaries(spark):
    df = spark.createDataFrame([Row(x=float(v)) for v in (0, 9.9, 10, 19.9, 20)])
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 10.0, 20.0)], "band string, lo double, hi double"
    )
    got = sorted((r["x"], r["band"]) for r in band_join(df, bands, "x").collect())
    # 20 falls outside every band ([lo, hi) is half-open)
    assert got == [(0.0, "lo"), (9.9, "lo"), (10.0, "hi"), (19.9, "hi")]


def test_interval_pairs_matches_bruteforce(spark):
    rows = [
        Row(user_id=u, event_id=i, ts=_ts(m))
        for i, (u, m) in enumerate(
            [(1, 0), (1, 10), (1, 29), (1, 31), (1, 90), (2, 0), (2, 61)]
        )
    ]
    df = spark.createDataFrame(rows)
    got = {r["user_id"]: r["n_pairs"] for r in
           interval_pairs_per_key(df, gap_seconds=1800).collect()}

    def brute(rs):
        out = {}
        for a, b in itertools.permutations(rs, 2):
            if a.user_id != b.user_id:
                continue
            if (a.ts, a.event_id) < (b.ts, b.event_id) and (b.ts - a.ts).total_seconds() <= 1800:
                out[a.user_id] = out.get(a.user_id, 0) + 1
        return out

    assert got == brute(rows)  # user 1: (0,10),(0,29),(10,29),(10,31),(29,31); user 2 none


def test_uniform_band_join_matches_general(spark):
    from mapreduce_task_spark.operators.temporal import uniform_band_join
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(x=float(v)) for v in (0, 5, 10, 39.9, 40, 50, 50.9)])
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 20.0, 30.0),
         ("d", 30.0, 40.0), ("e", 40.0, 51.0)],
        "band string, lo double, hi double",
    )
    uni = sorted((r["x"], r["band"]) for r in
                 uniform_band_join(df, bands, "x", 10.0, 5).collect())
    gen = sorted((r["x"], r["band"]) for r in band_join(df, bands, "x").collect())
    assert uni == gen and (50.9, "e") in uni
