"""Streaming IVF-PQ index maintenance: keep the compressed (codes +
refine vectors) ANN index fresh as embeddings stream in, without
rebuilding or retraining per batch.

The plain-IVF twin (``ivf_ingest.py``) appends assigned vectors under
a frozen quantizer; this module does the same for the IVF-PQ index
(``operators/pq.py:ivfpq_build_index``), whose at-rest artifacts are
the coarse quantizer, the residual codebook, cluster-partitioned
m-code inverted lists, AND (r10) the cluster-partitioned original
vectors the exact-rerank refine stage reads:

- Each micro-batch is encoded against the FROZEN coarse quantizer +
  residual codebook (``ivfpq_encode_batch`` — one shuffle-free
  broadcast projection; no Lloyd rounds anywhere on the hot path) and
  appended to ``<index>/delta``, partitioned by (``__batch``,
  cluster). One delta log carries both payloads per row — the m codes
  for ADC and (qv, nq) for refine — so codes and vectors can never
  drift apart across a crash. Replays are idempotent: the encoding is
  deterministic in (frozen index, batch rows), so a crash-replayed
  batch dynamically overwrites exactly its own partition tree with
  identical rows (the ``batchlog`` protocol).
- ``search_with_delta`` ADC-scores base lists and the delta live view
  through their own broadcast-probe joins (partition pruning holds on
  both sides independently), merges candidates before the top-k
  window, and with ``refine=N`` exact-reranks the merged shortlist
  against base ∪ delta vectors — results identical to a full
  same-quantizer-same-codebook re-encode over base ∪ appended
  (asserted in tests via merge-then-search equality).
- ``compact_delta`` folds committed batch partitions into the
  negative-id partition (bounded file/partition counts).
- ``merge_delta_into_base`` is the offline segment merge: rewrite
  codes = codes ∪ delta codes and vectors = vectors ∪ delta vectors
  (each through a side directory + rename, never through memory),
  then drop the delta. After a merge, an offline
  ``ivfpq_build_index`` retrain can be scheduled if quantizer/codebook
  drift has grown — the same drift tradeoff every frozen-quantizer
  append design carries (see ivf_ingest's module doc; PQ adds
  codebook drift: residuals of drifted data quantize worse, which
  shows up as falling refined-vs-unrefined recall gap, not wrong
  results — the refine stage scores exact distances regardless).

At 100 TB: per-batch cost is O(batch) map-only work; searches stay
partition-pruned on base and delta; merges stream through parquet
writes. Cite: reference has no streaming surface — this extends the
LLM-pipeline extension set (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.pq import (
    _ivfpq_adc_scored,
    _rank_topk_by_distance,
    _refine_stage,
    _vectors_as_cvecs,
    ivfpq_encode_batch,
)
from ..operators.similarity import probe_clusters, with_quantized
from .batchlog import (
    BATCH_COL,
    compact_log,
    log_live,
    merge_log_into_base,
    write_batch_partition,
)


def append_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
    per_list: bool = False,
) -> None:
    """Encode one (micro-)batch against the index's frozen coarse
    quantizer + residual codebook and land it in the delta log's own
    batch partition, sub-partitioned by cluster (same physical shape
    as the base lists, so searches prune identically). ``m``/``dim``/
    ``per_list`` must match the build (same plan-time contract as
    ``ivfpq_search_index``)."""
    spark = batch_df.sparkSession
    coarse = spark.read.parquet(f"{index_path}/coarse")
    cents = spark.read.parquet(f"{index_path}/codebook")
    rows = ivfpq_encode_batch(
        batch_df, coarse, cents, id_col, vec_col, m=m, dim=dim,
        per_list=per_list,
    )
    write_batch_partition(
        rows, batch_id, f"{index_path}/delta", sub_partition_cols=("cluster",)
    )


def streaming_ivfpq_append(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
    per_list: bool = False,
):
    """Attach the append sink to an embedding stream; returns the
    StreamingQuery. The index (``ivfpq_build_index``) must exist."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(
            batch_df, batch_id, index_path, id_col, vec_col,
            m=m, dim=dim, per_list=per_list,
        )

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _delta_live(spark: SparkSession, index_path: str) -> DataFrame | None:
    return log_live(spark, f"{index_path}/delta")


def search_with_delta(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    dim: int = 64,
    per_list: bool = False,
    refine: int = 0,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k over base lists PLUS everything appended since the
    build — identical ADC arithmetic, tie-breaks, and (with
    ``refine=N``) exact-rerank semantics to ``ivfpq_search_index``, so
    the result matches that function run after ``merge_delta_into_
    base`` (asserted in tests).

    Each side is ADC-scored through its own join against the broadcast
    per-(query, probed cluster) distance tables, so partition pruning
    to the probed clusters holds on base AND delta independently; the
    merged candidates feed one top-k window. The refine shortlist is
    taken over the MERGED candidates and re-scored against base ∪
    delta vectors (the delta rows already carry qv/nq — no second
    encode, no corpus read).

    ``filter_ids`` pre-filters candidates on BOTH sides to an
    allow-list before any ranking — the same filtered-search contract
    as ``ivfpq_search_index(filter_ids=)``, here spanning base and
    streamed-in rows alike."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    coarse = spark.read.parquet(f"{index_path}/coarse")
    cents = spark.read.parquet(f"{index_path}/codebook")

    qd = with_quantized(queries, vec_col).select(id_col, "qv", "nq")
    cj = coarse.select(F.col("j").alias("cluster"), "cqv")
    rq = (
        probe_clusters(qd, coarse, id_col, nprobe=nprobe)
        .join(F.broadcast(cj), "cluster")
        .select(
            F.col(id_col).alias("query_id"),
            "cluster",
            F.zip_with("qv", "cqv", lambda a, b: a - b).alias("qv"),
        )
    )
    allowed = (
        None
        if filter_ids is None
        else filter_ids.select(F.col(id_col).alias("cand_id"))
    )
    base_cand = spark.read.parquet(f"{index_path}/codes").select(
        F.col(id_col).alias("cand_id"), "cluster", "codes"
    )
    if allowed is not None:
        base_cand = base_cand.join(allowed, "cand_id", "leftsemi")
    scored = _ivfpq_adc_scored(base_cand, rq, cents, m, dsub, per_list=per_list)
    delta = _delta_live(spark, index_path)
    if delta is not None:
        delta_cand = delta.select(
            F.col(id_col).alias("cand_id"), "cluster", "codes"
        )
        if allowed is not None:
            delta_cand = delta_cand.join(allowed, "cand_id", "leftsemi")
        scored = scored.unionByName(
            _ivfpq_adc_scored(delta_cand, rq, cents, m, dsub, per_list=per_list)
        )
    if refine:
        cvecs = _vectors_as_cvecs(
            spark.read.parquet(f"{index_path}/vectors"), id_col
        )
        if delta is not None:
            cvecs = cvecs.unionByName(
                _vectors_as_cvecs(delta.select(id_col, "cluster", "qv", "nq"), id_col)
            )
        return _refine_stage(scored, qd, cvecs, id_col, k, refine)
    return _rank_topk_by_distance(scored, k).drop("cluster")


def compact_delta(spark: SparkSession, index_path: str, up_to_batch: int) -> int:
    """Fold delta partitions ``__batch <= up_to_batch`` into the
    negative-id partition (rows are immutable encoded vectors — the
    fold re-selects them; the win is bounded partition/file counts).
    Append-only state never read back by the sink body, so
    ``up_to_batch`` need not be checkpoint-committed (see
    ivf_ingest.compact_delta)."""
    return compact_log(
        spark,
        f"{index_path}/delta",
        up_to_batch,
        lambda live: live.drop(BATCH_COL),
        sub_partition_cols=("cluster",),
    )


def merge_delta_into_base(spark: SparkSession, index_path: str) -> int:
    """Rewrite the base ``codes`` AND ``vectors`` datasets as
    base ∪ delta live view and drop the merged delta partitions — the
    offline segment merge, on the shared marker-committed protocol
    (``batchlog.merge_log_into_base``). The marker commit is what
    makes a TWO-dataset base safe: after a crash anywhere past it,
    recovery finishes both swaps from the recorded state, so codes and
    vectors can never end half-swapped (a half-swap would silently
    drop refine candidates at the (cluster, cand_id) join) and a
    committed merge's rows can never be lost to a stale-base re-merge
    even if the append stream was restarted first. Returns the number
    of delta rows merged in (0 on a no-op or resume call)."""

    def write_merged(live: DataFrame, name: str) -> None:
        # each base dataset holds its own column subset of the delta
        # rows ((id, codes) vs (id, qv, nq), cluster-partitioned) —
        # align before the union
        base = spark.read.parquet(f"{index_path}/{name}")
        base.unionByName(live.select(*base.columns)).write.mode(
            "overwrite"
        ).partitionBy("cluster").parquet(f"{index_path}/{name}_merged")

    return merge_log_into_base(
        spark, index_path, "delta", ["codes", "vectors"], write_merged
    )
