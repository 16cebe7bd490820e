"""Streaming IVF-SQ index maintenance: the append-log pattern
(ivf/ivfpq/bm25/sq_ingest) applied to the probe-bounded compressed
index (``operators.sq.ivfsq_*``) — completing the delta-freshness
matrix across every persisted index family.

TWO frozen quantizers govern an append here, and BOTH monitors land
per batch:

- the coarse k-means centroids (frozen, like ivf_ingest) — each batch
  is assigned by one broadcast argmin and the standard
  assignment-distance DRIFT row lands (the ivf_ingest machinery is
  reused verbatim: ``drift``/``drift_base`` logs, trend/signal/
  compact/reset all operate on this index's path);
- the SQ bounds (frozen, 1-row global or k-row per-list) — each batch
  encodes map-only against them and the SATURATION row counts clamped
  components (the sq_ingest machinery reused verbatim on the ``sat``
  log; per-list bounds clamp per list, the join handles it).

Delta rows are (id, cluster, codes[, qv, nq]) in the delta log's own
batch partition sub-partitioned by cluster — the same physical shape
as the base code lists, so ``search_with_delta`` probes BOTH sides
with partition pruning and merges scored candidates before the one
top-k window (the shared ``_ivfsq_score`` tail — results are
bit-for-bit what ``ivfsq_search_index`` returns after
``merge_delta_into_base``, asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.similarity import assign_clusters, probe_clusters, with_quantized
from ..operators.sq import _assert_dim, _codes_expr
from .batchlog import (
    compact_log,
    invalidate_watermark_cache,
    log_live,
    merge_log_into_base,
    write_batch_partition,
)
from .ivf_ingest import (  # noqa: F401 — drift monitors reused verbatim
    _ivf_drift_row,
    compact_drift,
    drift_signal,
    read_drift_trend,
    reset_drift,
)
from .sq_ingest import (  # noqa: F401 — saturation monitors reused verbatim
    _sat_row_from_joined,
    compact_saturation,
    read_saturation_trend,
    reset_saturation,
    saturation_signal,
)


def _meta(spark: SparkSession, index_path: str) -> dict:
    from ..operators.pq import read_index_meta

    return read_index_meta(spark, index_path) or {}


def append_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    monitors: bool = True,
    prequantized: bool = False,
) -> None:
    """Assign one (micro-)batch to the frozen coarse centroids, encode
    against the frozen SQ bounds, and land it in the delta log's own
    batch partition sub-partitioned by cluster. ``monitors=True``
    (default) also lands the assignment-distance drift row AND the
    bounds-saturation row — two extra map-only passes + 1-row
    aggregates, replay-idempotent like the delta write."""
    spark = batch_df.sparkSession
    meta = _meta(spark, index_path)
    kind = meta.get("kind", "ivfsq")
    if kind != "ivfsq":
        raise ValueError(
            f"index at {index_path} is kind={kind!r} — ivfsq_ingest "
            "appends to IVF-SQ indexes only (use sq_ingest for flat SQ8)"
        )
    metric = meta.get("metric", "l2")
    per_list = bool(meta.get("per_list", False))
    cents = spark.read.parquet(f"{index_path}/centroids")
    bounds = spark.read.parquet(f"{index_path}/bounds")
    if prequantized:
        qd = batch_df.select(id_col, "qv", "nq")
    else:
        qd = with_quantized(batch_df, vec_col, metric=metric).select(
            id_col, "qv", "nq"
        )
    assigned = assign_clusters(qd, cents, id_col)
    if per_list:
        joined = assigned.join(F.broadcast(bounds), "cluster")
    else:
        joined = assigned.crossJoin(F.broadcast(bounds))
    joined = joined.select(
        id_col,
        "cluster",
        "nq",
        _assert_dim(F.col("qv"), F.size("minq"), "ivfsq_append").alias("qv"),
        "minq",
        "maxq",
    )
    if meta.get("store_vectors", True):
        rows = joined.select(
            id_col, "cluster", "qv", "nq", _codes_expr().alias("codes")
        )
    else:
        rows = joined.select(id_col, "cluster", _codes_expr().alias("codes"))
    write_batch_partition(
        rows, batch_id, f"{index_path}/delta", sub_partition_cols=("cluster",)
    )
    if monitors:
        write_batch_partition(
            _ivf_drift_row(assigned, cents), batch_id, f"{index_path}/drift"
        )
        write_batch_partition(
            _sat_row_from_joined(joined), batch_id, f"{index_path}/sat"
        )


def streaming_ivfsq_append(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Attach the append sink to an embedding stream; returns the
    StreamingQuery. The index (``ivfsq_build_index``) must exist."""

    for log in ("delta", "drift", "sat"):
        invalidate_watermark_cache(f"{index_path}/{log}")

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(batch_df, batch_id, index_path, id_col, vec_col)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def search_with_delta(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    nprobe: int = 1,
    metric: str = "l2",
    refine: int = 0,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """IVF-SQ top-k over base code lists PLUS everything appended since
    the build — each side scored through its own join against the
    broadcast probe set (partition pruning holds on base AND delta),
    merged before the one top-k window; bit-for-bit what
    ``ivfsq_search_index`` returns after ``merge_delta_into_base``.
    ``refine`` reranks against base ∪ delta vectors and refuses on a
    ``store_vectors=False`` index; ``filter_ids`` pre-filters
    candidates on both sides."""
    from ..operators.pq import _refine_exact, _sub_dist, check_index_meta
    from ..operators.sq import _ivfsq_score

    check_index_meta(spark, index_path, metric=metric, dim=dim, kind="ivfsq")
    meta = _meta(spark, index_path)
    per_list = bool(meta.get("per_list", False))
    cents = spark.read.parquet(f"{index_path}/centroids")
    bounds = spark.read.parquet(f"{index_path}/bounds")
    delta = log_live(spark, f"{index_path}/delta")

    allowed = (
        None
        if filter_ids is None
        else filter_ids.select(F.col(id_col).alias("cand_id"))
    )

    def side(df: DataFrame) -> DataFrame:
        c = df.select(F.col(id_col).alias("cand_id"), "cluster", "codes")
        if allowed is not None:
            c = c.join(allowed, "cand_id", "leftsemi")
        return c

    sides = [side(spark.read.parquet(f"{index_path}/codes"))]
    if delta is not None:
        sides.append(side(delta))
    qd = with_quantized(queries, vec_col, metric=metric).select(
        id_col,
        _assert_dim(F.col("qv"), F.lit(dim), "ivfsq_search_with_delta").alias(
            "qv"
        ),
        "nq",
    )
    probes = probe_clusters(qd, cents, id_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("nq").alias("nq_q"),
        "cluster",
    )
    cvecs = None
    if refine:
        if not meta.get("store_vectors", True):
            raise ValueError(
                f"IVF-SQ index at {index_path} was built store_vectors=False "
                "— it cannot serve refine>0; rebuild with store_vectors=True "
                "or search with refine=0"
            )
        cvecs = spark.read.parquet(f"{index_path}/vectors").select(
            F.col(id_col).alias("cand_id"),
            "cluster",
            F.col("qv").alias("qv_c"),
            F.col("nq").alias("nq_c"),
        )
        if delta is not None:
            cvecs = cvecs.unionByName(
                delta.select(
                    F.col(id_col).alias("cand_id"),
                    "cluster",
                    F.col("qv").alias("qv_c"),
                    F.col("nq").alias("nq_c"),
                )
            )
    return _ivfsq_score(
        probes, sides, bounds, cvecs, k, refine, per_list,
        _sub_dist, _refine_exact,
    )


def compact_delta(spark: SparkSession, index_path: str, up_to_batch: int) -> int:
    """Fold delta partitions into the negative-id partition, keeping
    the cluster sub-partitioning (see ivf_ingest.compact_delta for the
    watermark argument)."""
    from .batchlog import BATCH_COL

    return compact_log(
        spark,
        f"{index_path}/delta",
        up_to_batch,
        lambda live: live.drop(BATCH_COL),
        sub_partition_cols=("cluster",),
    )


def merge_delta_into_base(spark: SparkSession, index_path: str) -> int:
    """Rewrite base codes (and vectors, when stored) as base ∪ delta
    live view and drop the merged delta — the offline segment merge on
    the shared marker-committed protocol. Centroids AND bounds stay
    frozen (a merge is not a retrain/refit)."""
    meta = _meta(spark, index_path)
    targets = ["codes"] + (
        ["vectors"] if meta.get("store_vectors", True) else []
    )

    def write_merged(live: DataFrame, name: str) -> None:
        base = spark.read.parquet(f"{index_path}/{name}")
        base.unionByName(live.select(*base.columns)).write.mode(
            "overwrite"
        ).partitionBy("cluster").parquet(f"{index_path}/{name}_merged")

    return merge_log_into_base(spark, index_path, "delta", targets, write_merged)


def drift_baseline(spark: SparkSession, index_path: str) -> None:
    """Record the build corpus's own mean assignment distance from the
    index's persisted ``vectors`` dataset (requires a
    ``store_vectors=True`` build — the codes alone cannot reproduce
    exact distances). Run once after ``ivfsq_build_index`` or a
    retrain (``reset_drift`` first, see ivf_ingest)."""
    meta = _meta(spark, index_path)
    if not meta.get("store_vectors", True):
        raise ValueError(
            f"IVF-SQ index at {index_path} was built store_vectors=False — "
            "drift_baseline needs the persisted vectors dataset"
        )
    cents = spark.read.parquet(f"{index_path}/centroids")
    vectors = spark.read.parquet(f"{index_path}/vectors")
    _ivf_drift_row(vectors, cents).write.mode("overwrite").parquet(
        f"{index_path}/drift_base"
    )
