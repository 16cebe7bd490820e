"""approx_sketches has no SQL oracle (HLL/quantile estimates are
engine-specific), so this test gives the rows-only entry teeth: the
estimates must land within their documented error bounds of the exact
twins (distinct_agg / percentile_stats shapes) on real testdata.

- approx_count_distinct: HyperLogLog++ with default rsd = 5%; assert
  within 3x the documented rsd (15%) of the exact distinct count.
- approx_percentile(value, 0.5, 10000): by the accuracy contract the
  returned element's true rank is within n/10000 of the 0.5 quantile;
  assert the estimate lies between the exact 0.45 and 0.55 quantiles
  (vastly looser than n/10000 — stable across data refreshes).
"""

from pyspark.sql import functions as F

from mapreduce_task_spark.sources.tables import load_table


def test_approx_sketches_within_error_bounds(spark, sf_med):
    ev = load_table(spark, sf_med, "events")
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.approx_percentile("value", 0.5, 10000).alias("approx_median_value"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", 0.45).alias("p45"),
            F.percentile("value", 0.55).alias("p55"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and len(approx) > 0
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= 0.15 * e["users"], (
            et,
            a["approx_users"],
            e["users"],
        )
        assert e["p45"] <= float(a["approx_median_value"]) <= e["p55"], (
            et,
            a["approx_median_value"],
            e["p45"],
            e["p55"],
        )


def test_hll_sketch_columns_merge_without_rescan(spark, sf_small):
    """DataSketches HLL columns: per-group estimates within 5% of exact,
    and the union of stored sketches estimates the GLOBAL distinct count
    without touching the source again — the store-once/merge-many
    contract approx_count_distinct cannot provide."""
    from mapreduce_task_spark.operators.sketches import (
        hll_group_sketches,
        hll_rollup_estimate,
    )
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events")
    exact_per = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact_total = ev.select("user_id").distinct().count()

    sk = hll_group_sketches(ev, "event_type", "user_id")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup_estimate(sk, "event_type").collect()
    }
    assert set(got) == set(exact_per) | {"TOTAL"}
    for k, exact in exact_per.items():
        assert abs(got[k] - exact) <= max(2, 0.05 * exact), (k, got[k], exact)
    assert abs(got["TOTAL"] - exact_total) <= max(2, 0.05 * exact_total)


def test_kll_sketch_columns_roll_up_quantiles_without_rescan(spark, sf_med):
    """DataSketches KLL columns: per-group medians within the exact
    p40-p60 band (k=200 => ~1.65% rank error at 99% confidence — the
    band is ~12x looser, stable across refreshes), and the MERGE of
    the stored sketches answers the global median without touching the
    source again — the quantile analogue of the HLL rollup contract."""
    from mapreduce_task_spark.operators.sketches import (
        kll_group_sketches,
        kll_rollup_quantiles,
    )
    from mapreduce_task_spark.sources.tables import load_table

    ev = load_table(spark, sf_med, "events")
    exact_per = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.4).alias("p40"),
            F.percentile("value", 0.6).alias("p60"),
        )
        .collect()
    }
    tot = ev.agg(
        F.percentile("value", 0.4).alias("p40"),
        F.percentile("value", 0.6).alias("p60"),
    ).collect()[0]

    sk = kll_group_sketches(ev, "event_type", "value")
    got = {
        r["event_type"]: r["q50"]
        for r in kll_rollup_quantiles(sk, "event_type", [0.5]).collect()
    }
    assert set(got) == set(exact_per) | {"TOTAL"}
    for k, e in exact_per.items():
        assert e["p40"] <= got[k] <= e["p60"], (k, got[k], e["p40"], e["p60"])
    assert tot["p40"] <= got["TOTAL"] <= tot["p60"]
