"""Misra-Gries heavy hitters: bounds and top-key recovery."""

from pyspark.sql import functions as F

from mapreduce_task_spark.operators.sketches import heavy_hitters
from mapreduce_task_spark.functions.text import words
from mapreduce_task_spark.sources.tables import load_table


def test_heavy_hitters_bounds_and_top_keys(spark, sf_small):
    w = words(load_table(spark, sf_small, "documents"), keep=("doc_id",)).select(
        "word"
    )
    total = w.count()
    k = 32
    exact = {
        r["word"]: r["n"]
        for r in w.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    est = {r["word"]: r["est_count"] for r in heavy_hitters(w, "word", k=k).collect()}
    assert est  # non-empty summary
    bound = total / (k + 1)
    for key, e in est.items():
        assert e <= exact[key]                 # underestimate only
        assert exact[key] - e <= bound         # classic MG error bound
    # the clearly-heavy keys must survive with the right ranking signal
    top_exact = sorted(exact, key=lambda x: (-exact[x], x))[:3]
    for key in top_exact:
        assert key in est and est[key] > 0


def test_heavy_hitters_exact_when_k_exceeds_cardinality(spark):
    from pyspark.sql import Row

    data = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    df = spark.createDataFrame([Row(word=x) for x in data]).repartition(3)
    got = {r["word"]: r["est_count"] for r in heavy_hitters(df, "word", k=16).collect()}
    assert got == {"a": 5, "b": 3, "c": 2}  # no compression ever triggers


class TestCountMin:
    def test_overestimate_only_and_bound(self, spark, sf_small):
        import math

        from mapreduce_task_spark.operators.sketches import cm_estimate, cm_sketch
        from mapreduce_task_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_small, "events")
        depth, width = 4, 256
        sk = cm_sketch(ev, "event_type", depth=depth, width=width)
        true = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        keys = ev.select("event_type").distinct()
        got = {
            r["event_type"]: r["est_count"]
            for r in cm_estimate(sk, keys, "event_type", depth=depth, width=width).collect()
        }
        n_total = ev.count()
        assert set(got) == set(true)
        for k, est in got.items():
            assert est >= true[k], f"CM must never underestimate ({k})"
            # classic bound with huge slack (holds w.h.p.; deterministic here)
            assert est - true[k] <= math.e / width * n_total * 4

    def test_sketch_merges_by_addition(self, spark, sf_small):
        from mapreduce_task_spark.operators.sketches import cm_estimate, cm_sketch
        from mapreduce_task_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_small, "events")
        lo = ev.filter(F.col("event_id") % 2 == 0)
        hi = ev.filter(F.col("event_id") % 2 == 1)
        merged = (
            cm_sketch(lo, "event_type")
            .unionByName(cm_sketch(hi, "event_type"))
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = cm_sketch(ev, "event_type")
        a = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
        b = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
        assert a == b

    def test_missing_key_estimates_small(self, spark):
        from pyspark.sql import Row
        from mapreduce_task_spark.operators.sketches import cm_estimate, cm_sketch

        df = spark.createDataFrame([Row(k=f"key{i % 7}") for i in range(700)])
        sk = cm_sketch(df, "k", depth=4, width=256)
        probe = spark.createDataFrame([Row(k="never-seen")])
        [r] = cm_estimate(sk, probe, "k", depth=4, width=256).collect()
        # 7 distinct keys over 1024 cells: collisions are possible but the
        # min over 4 rows of a sparse grid lands at 0 here (deterministic)
        assert r["est_count"] == 0
