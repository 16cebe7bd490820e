"""Streaming dedup ingest: continuous crawl ingestion with exactly-once
cross-batch exact dedup, on plain parquet.

The streaming face of ``operators.dedup.incremental_exact_dedup`` —
the single most production-relevant LLM-pipeline loop: documents
stream in (a crawler, a firehose, incremental extraction), and the
corpus must accumulate each batch's rows deduped against EVERYTHING
already kept, without ever rescanning the historical corpus and
without double-ingesting or losing a batch across crashes.

Two partition-per-batch parquet logs (``batchlog`` protocol):

- ``corpus_path``   — the kept documents, partition per batch;
- ``digest_path``   — 1-column (``text_md5``) content digests of the
  kept documents, partition per batch (16 bytes/doc: the only state
  the dedup ever reads back).

Per micro-batch N, the sink (1) dedups within the batch (null-safe
min-id representative, same key as the batch operators), (2)
anti-joins the batch digests against digests from batches
STRICTLY BEFORE N, (3) overwrites corpus and digest partitions
``__batch=N`` with the survivors.

Replay safety — why "strictly before" is load-bearing: a batch's
digests may already be on disk when the batch replays (crash after
the writes, before the checkpoint committed). If the anti-join could
see the batch's OWN digest partition, every replayed row would look
like a historical duplicate and the replay would overwrite the
corpus partition with ZERO rows — silent loss of the whole batch.
Reading only earlier partitions makes the body a deterministic
function of (batch rows, strictly-earlier state), so a replay
recomputes byte-identical partitions: idempotent by construction.

Cross-batch correctness: batch ids grow monotonically, so "earlier
partitions" is exactly "everything already kept"; two batches that
both introduce the same new text keep only the earlier batch's copy.

Scale shape: the per-batch cost is one digest groupBy within the
batch plus one anti-join whose right side is the digest log — a
fraction of corpus bytes (16 bytes/doc), read with partition pruning
(``__batch < N``). The anti-join shuffles on uniform md5 keys (no
skew). The digest log accrues one partition per batch;
``compact_digests`` folds checkpoint-committed partitions into one
negative-id partition (pure ``distinct`` union — digests are a set)
to keep file counts bounded; at extreme scale the compacted digest
set can instead live in a bucketed table so the per-batch anti-join
exchanges only the batch side (``sources.bucketed.write_bucketed``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import incremental_exact_dedup
from .batchlog import (
    BATCH_COL,
    batch_ids,
    covered_watermark,
    drop_partitions,
    live_view,
    write_batch_partition,
)


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return bool(p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p))


def read_digests(
    spark: SparkSession, digest_path: str, before_batch: int | None = None
) -> DataFrame:
    """The digest set, optionally restricted to batches strictly
    before ``before_batch`` (the replay-safe view batch N must dedup
    against). Compacted (negative-id) partitions always qualify:
    ``compact_digests`` only ever folds checkpoint-committed batches,
    which are < any batch still being (re)played."""
    log = spark.read.parquet(digest_path)
    live = live_view(log, covered_watermark(batch_ids(log)))
    if before_batch is not None:
        live = live.filter(
            (F.col(BATCH_COL) < F.lit(before_batch)) | (F.col(BATCH_COL) < 0)
        )
    return live.select("text_md5")


def read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The deduped corpus as of now (all batch partitions, bookkeeping
    column dropped)."""
    return spark.read.parquet(corpus_path).drop(BATCH_COL)


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    digest_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Dedup one (micro-)batch against all earlier batches and land
    its survivors. Usable directly for batch backfills and as the
    foreachBatch body. Deterministic given (batch rows, earlier
    state) — see module docstring for the replay argument."""
    spark = batch_df.sparkSession
    known = (
        read_digests(spark, digest_path, before_batch=batch_id)
        if _exists(spark, digest_path)
        else None
    )
    fresh, _ = incremental_exact_dedup(
        batch_df, known, id_col=id_col, text_col=text_col, keep_digest=True
    )
    # two consumers (corpus rows + digest delta) of one dedup plan:
    # materialize once, kilobyte-per-row on the digest side and the
    # batch's own survivors on the corpus side — never historical data
    fresh = fresh.localCheckpoint(eager=True)
    write_batch_partition(fresh.drop("text_md5"), batch_id, corpus_path)
    write_batch_partition(
        fresh.select("text_md5").where(F.col("text_md5").isNotNull()).distinct(),
        batch_id,
        digest_path,
    )


def streaming_dedup_ingest(
    stream_df: DataFrame,
    corpus_path: str,
    digest_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Attach the dedup-ingest sink to a document stream; returns the
    StreamingQuery."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch(batch_df, batch_id, corpus_path, digest_path, id_col, text_col)

    return (
        stream_df.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_digests(
    spark: SparkSession, digest_path: str, up_to_batch: int
) -> int:
    """Fold digest partitions ``__batch <= up_to_batch`` into
    ``__batch=-(up_to_batch+1)`` (a pure ``distinct`` union — the
    digest log is a set). Returns superseded directories dropped.

    CONTRACT (stricter than the sketch store's): ``up_to_batch`` must
    be <= the stream's checkpoint-COMMITTED batch id. The ingest
    anti-join treats compacted digests as "strictly earlier than any
    batch", which is only true if no folded batch can ever replay —
    folding an uncommitted batch's digests would make its own replay
    see itself as history and drop every row (the exact loss this
    module's 'strictly before' read exists to prevent). Crash windows
    within compaction itself are read-safe exactly as in the sketch
    store: readers take the deepest negative partition plus only the
    positives above its coverage, so a retry merely reclaims space.
    """
    if up_to_batch < 0:
        raise ValueError(f"up_to_batch must be >= 0 (got {up_to_batch})")
    log = spark.read.parquet(digest_path)
    ids = batch_ids(log)
    covered = covered_watermark(ids)
    effective = max(up_to_batch, covered)
    target = -(effective + 1)
    superseded = [
        b for b in ids if (0 <= b <= effective) or (b < 0 and b != target)
    ]
    if effective > covered:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged = (
            live_view(log, covered)
            .filter(F.col(BATCH_COL) <= F.lit(effective))
            .select("text_md5")
            .distinct()
            .withColumn(BATCH_COL, F.lit(int(target)))
            # sever the file-source lineage before overwriting the
            # path the plan reads from
            .localCheckpoint()
        )
        merged.write.mode("overwrite").partitionBy(BATCH_COL).parquet(digest_path)
    elif not superseded:
        return 0
    return drop_partitions(spark, digest_path, superseded)
