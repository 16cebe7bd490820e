"""Learned quality-classifier stage: trains in-engine, separates held-out
good/garbage docs, and scores with a Python-free plan."""

import pytest
from pyspark.sql import functions as F

from mapreduce_task_spark.operators.quality_model import (
    filter_by_quality,
    score_quality,
    train_quality_model,
)
from mapreduce_task_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def labeled(spark, sf_small):
    """Weak-labeled corpus: the real documents are the keep class; a
    deterministic md5-derived garbage twin of each doc (disjoint
    letter-run vocabulary after normalization) is the drop class."""
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    good = docs.withColumn("label", F.lit(1.0))
    bad = docs.select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("zq"),
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                i.cast("string"),
                            )
                        ),
                        1,
                        6,
                    ),
                ),
            ),
        ).alias("text"),
        F.lit(0.0).alias("label"),
    )
    return good.unionByName(bad)


def test_classifier_separates_held_out_docs(spark, labeled):
    train = labeled.filter(F.col("doc_id") % 5 != 0)
    test = labeled.filter(F.col("doc_id") % 5 == 0)
    model = train_quality_model(train, dims_log2=15)

    scored = score_quality(model, test, text_col="text")
    agg = scored.select(
        F.avg(
            (
                (F.col("quality_prob") >= 0.5).cast("int")
                == F.col("label").cast("int")
            ).cast("double")
        ).alias("acc"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["n"] > 50
    assert agg["acc"] >= 0.95, f"held-out accuracy {agg['acc']}"


def test_scoring_plan_is_python_free_and_schema_stable(spark, labeled):
    model = train_quality_model(labeled.limit(200), dims_log2=15)
    docs = labeled.select("doc_id", "text")
    scored = score_quality(model, docs)
    assert scored.columns == ["doc_id", "text", "quality_prob"]
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"Python stage {node} in scoring plan"
    # map-only: scoring introduces no key/range shuffle over the corpus
    # scan (the only Exchange allowed is ensure_parallelism's
    # round-robin split of a tiny test input)
    for bad in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert bad not in plan, f"{bad} in scoring plan:\n{plan}"


def test_filter_by_quality_keeps_mostly_good(spark, labeled):
    model = train_quality_model(labeled, dims_log2=15)
    kept = filter_by_quality(model, labeled, threshold=0.5)
    n_bad_kept = kept.filter(F.col("doc_id") >= 100_000).count()
    n_good_kept = kept.filter(F.col("doc_id") < 100_000).count()
    assert n_good_kept > 0.9 * labeled.filter(F.col("label") == 1.0).count()
    assert n_bad_kept < 0.05 * labeled.filter(F.col("label") == 0.0).count()


def test_model_round_trips_through_save_load(spark, labeled, tmp_path):
    """The train-once / score-many split: the fitted pipeline persists
    and reloads into an identical scorer (bit-equal probabilities —
    same coefficients, same per-row arithmetic)."""
    from pyspark.ml import PipelineModel

    model = train_quality_model(labeled.limit(300), dims_log2=15)
    path = str(tmp_path / "qmodel")
    model.write().save(path)
    reloaded = PipelineModel.load(path)
    probe = labeled.limit(40)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, probe).collect()}
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(reloaded, probe).collect()
    }
    assert a == b and len(a) == 40


def test_in_memory_model_scores_after_session_observe(spark, labeled):
    """The exact interaction _strip_training_summary exists for: once
    ANY ``df.observe`` has registered on the session (the engine's O5
    counters do this constantly), a fitted model that still drags its
    training summary — and through it the session — dies with
    Task-not-serializable at the first scoring action. Guard the strip
    (or its save/load fallback) against Spark renaming the JVM
    setter: observe first, then train, then score the IN-MEMORY model."""
    from pyspark.sql import Observation

    obs = Observation("qm_obs_guard")
    probe = labeled.select("doc_id", "text").limit(50)
    observed = probe.observe(obs, F.count(F.lit(1)).alias("n"))
    assert observed.count() == 50  # registers the observation manager

    model = train_quality_model(labeled.limit(200), dims_log2=15)
    rows = score_quality(model, probe).collect()
    assert len(rows) == 50
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_rescore_replaces_quality_prob_column(spark, labeled):
    """Re-scoring a previously scored frame replaces quality_prob
    instead of appending a duplicate column (which would make any
    downstream F.col('quality_prob') ambiguous at analysis time)."""
    model = train_quality_model(labeled.limit(200), dims_log2=15)
    once = score_quality(model, labeled.select("doc_id", "text").limit(30))
    twice = score_quality(model, once)
    assert twice.columns.count("quality_prob") == 1
    # downstream threshold filter must analyze cleanly
    assert twice.filter(F.col("quality_prob") >= 0.0).count() == 30


def test_summary_strip_fallback_round_trip(spark, labeled):
    """The save/load fallback produces a scorer bit-identical to the
    original — exercised directly so a Spark that breaks the JVM
    setter path still has a verified second path."""
    from mapreduce_task_spark.operators.quality_model import (
        _reload_round_trip,
    )

    model = train_quality_model(labeled.limit(200), dims_log2=15)
    reloaded = _reload_round_trip(model)
    probe = labeled.limit(30)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, probe).collect()}
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(reloaded, probe).collect()
    }
    assert a == b and len(a) == 30


def test_score_quality_total_on_empty_and_tokenless_input(spark, labeled):
    """Scoring is total: an empty frame scores to an empty frame, and a
    tokenless (empty-text) row gets the intercept-only probability
    instead of raising — at crawl scale both arrive routinely."""
    model = train_quality_model(labeled.limit(100), dims_log2=15)
    empty = labeled.select("doc_id", "text").limit(0)
    assert score_quality(model, empty).count() == 0

    tokenless = spark.createDataFrame(
        [(1, ""), (2, "?!?! 123")], "doc_id bigint, text string"
    )
    rows = score_quality(model, tokenless).collect()
    assert len(rows) == 2
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)
