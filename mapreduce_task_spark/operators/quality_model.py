"""Model-based quality filtering: a CCNet/fastText-style document
quality classifier trained and applied in-engine with ``pyspark.ml``.

The heuristic signals in ``textstats``/``quality`` are RULES;
production LLM-data pipelines (CCNet, FineWeb, DCLM) layer a LEARNED
classifier on top — trained on weak labels (a known-good corpus vs
known-bad crawl output), scored over every document, then thresholded
or used as a sampling weight. This module expresses that stage
Spark-first, with zero Python in the scoring hot path:

- **features**: ``normalized_tokens`` (the engine's own P1+P2+P3
  tokenizer, so the classifier sees exactly the tokens every other
  text operator sees) -> ``HashingTF`` over a FIXED feature space
  (the hashing trick: no vocabulary state to fit, ship, or keep in
  sync between train and serve) -> ``IDF``.
- **model**: ``LogisticRegression`` (L2, LBFGS) — the linear
  classifier fastText reduces to for this task.
- **scoring**: ``score_quality`` is ``PipelineModel.transform`` plus a
  vector-slot projection; every stage runs as JVM expressions /
  Scala UDFs — no Python workers (asserted in tests: the scoring
  plan contains no ``BatchEvalPython``/``ArrowEvalPython`` node).

Scale shape: TRAINING runs on a labeled sample (weak labels are cheap;
each LBFGS iteration is one pass over the cached training frame, and
the gradient is a treeAggregate — no driver-side data). SCORING is
embarrassingly parallel map-side work over the corpus scan: the fitted
model is one dense coefficient vector (``2**dims_log2`` doubles, ~2 MB
at the default 2^18) broadcast once per job, and no shuffle is
introduced — at 100 TB it runs at parquet-scan speed.

Determinism: LBFGS over a deterministic cached sample converges to the
same optimum in practice, but float treeAggregate sums are NOT
bit-contracted across layouts — tests therefore gate on held-out
SEPARATION (AUC / threshold accuracy), not on coefficients; the
operator is pytest-verified, not a driver row (no SQL oracle can
replay LBFGS).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF
from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalized_tokens
from ..sources.tables import ensure_parallelism

_TOKS, _TF, _FEAT, _RAWPRED = "__qm_toks", "__qm_tf", "__qm_features", "__qm_raw"
_PROB_VEC = "__qm_prob_vec"


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dims_log2: int = 18,
    reg_param: float = 1e-3,
    max_iter: int = 30,
) -> PipelineModel:
    """Fit the tokenize -> HashingTF -> IDF -> LogisticRegression
    pipeline on a weak-labeled frame (``label_col`` in {0.0, 1.0};
    1.0 = keep-quality). Returns the fitted ``PipelineModel`` —
    persist it with ``model.write().save(path)`` and reload with
    ``PipelineModel.load`` to decouple the (sampled, cheap) training
    job from the (full-corpus) scoring job."""
    base = ensure_parallelism(labeled).withColumn(
        _TOKS, normalized_tokens(text_col)
    )
    pipe = Pipeline(
        stages=[
            HashingTF(inputCol=_TOKS, outputCol=_TF, numFeatures=2**dims_log2),
            IDF(inputCol=_TF, outputCol=_FEAT),
            LogisticRegression(
                featuresCol=_FEAT,
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
                rawPredictionCol=_RAWPRED,
                probabilityCol=_PROB_VEC,
                predictionCol="__qm_pred",
            ),
        ]
    )
    # persist only for the fit's repeated passes (IDF count + LBFGS
    # iterations), then release — the fitted model carries everything
    # scoring needs, and a long-lived session must not accumulate
    # training caches (the pagerank_int retention lesson)
    base = base.persist()
    try:
        model = pipe.fit(base)
    finally:
        base.unpersist()
    if not _strip_training_summary(model):
        model = _reload_round_trip(model)
    return model


def _reload_round_trip(model: PipelineModel) -> PipelineModel:
    """Fallback when the JVM summary setter is unavailable (e.g. a
    Spark upgrade renamed it): a save/load round trip, since a model
    loaded from disk never carries a training summary. The path is
    pinned to the LOCAL filesystem with an explicit ``file://`` scheme
    — without it, ML writers resolve relative to ``fs.defaultFS``, so
    on an HDFS-defaulted cluster the model parquet would land on HDFS
    while the local ``shutil.rmtree`` cleans only the empty temp dir,
    leaking a model directory per fallback run. If even this fails the
    original model is returned and the caller keeps the pre-strip
    behavior."""
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix="qm_strip_")
    try:
        target = f"file://{path}/model"
        model.write().overwrite().save(target)
        return PipelineModel.load(target)
    except Exception as e:
        # leave a breadcrumb: when both the JVM strip AND this fallback
        # fail, the Task-not-serializable failure reappears at first
        # scoring action — without a warning the degraded path is
        # undiagnosable
        import warnings

        warnings.warn(
            "quality_model: save/load summary-strip fallback failed "
            f"({e!r}); returning the original session-entangled model — "
            "scoring may fail with Task-not-serializable if any "
            "df.observe has been registered on the session"
        )
        return model
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _strip_training_summary(model: PipelineModel) -> bool:
    """Drop the fitted LR stage's training summary. The summary holds a
    reference to the SparkSession, and the session's ObservationManager
    is not java-serializable — so the moment ANY ``df.observe`` has
    been registered on the session (the engine's O5 counters do this
    constantly), every later action on ``model.transform`` output dies
    with Task-not-serializable: the scoring UDF closure captures the
    model, the model drags the summary, the summary drags the session.
    Scoring needs only the coefficients; a model loaded from disk never
    has a summary either, so stripping makes the in-memory model match
    the persisted contract. Uses the JVM setter (public at the
    bytecode level); returns False when the strip cannot be PROVEN —
    either a setter failed on a summary-bearing stage, or no stage
    reported a summary at all (a freshly fitted pipeline always has
    one on the classifier stage, so "none found" means the probe API
    itself changed — e.g. hasSummary renamed — not that the model is
    clean). Either way the caller falls back to a save/load round
    trip instead of silently shipping a session-entangled model."""
    try:
        from pyspark import SparkContext

        jvm = SparkContext._active_spark_context._jvm
        empty = jvm.scala.Option.empty()
    except Exception:
        return False
    ok, found = True, False
    for stage in model.stages:
        jo = getattr(stage, "_java_obj", None)
        if jo is None:
            continue
        # py4j resolves members lazily, so probe per stage: stages
        # without a summary API (HashingTF, IDF) raise on hasSummary()
        # and are skipped; only the classifier stage carries one
        try:
            has = jo.hasSummary()
        except Exception:
            continue
        if not has:
            continue
        found = True
        try:
            jo.setSummary(empty)
            ok = ok and not jo.hasSummary()
        except Exception:
            ok = False
    return ok and found


def score_quality(
    model: PipelineModel, df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Append ``quality_prob`` (P(label=1)) to every row of ``df``.
    Map-only: no shuffle, no Python workers; the model broadcast is
    one dense coefficient vector."""
    # re-scoring a previously scored frame must REPLACE quality_prob,
    # not produce a duplicate column name (which would make any later
    # F.col("quality_prob") ambiguous at analysis time)
    if "quality_prob" in df.columns:
        df = df.drop("quality_prob")
    scored = model.transform(
        ensure_parallelism(df).withColumn(_TOKS, normalized_tokens(text_col))
    )
    keep = [c for c in df.columns]
    # vector_to_array is a JVM expression; slot 1 is P(label=1)
    from pyspark.ml.functions import vector_to_array

    return scored.select(
        *keep,
        vector_to_array(F.col(_PROB_VEC)).getItem(1).alias("quality_prob"),
    )


def filter_by_quality(
    model: PipelineModel,
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Keep rows the classifier scores at or above ``threshold`` —
    the filter face of the scorer (the sampling face is
    ``sampling.weighted_sample`` with ``quality_prob`` as weight)."""
    return score_quality(model, df, text_col).filter(
        F.col("quality_prob") >= threshold
    )
