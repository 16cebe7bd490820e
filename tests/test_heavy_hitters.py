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
