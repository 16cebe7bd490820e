"""Partition-per-batch parquet logs: the shared exactly-once protocol
under the streaming sinks that persist per-micro-batch state as plain
parquet (``sketch_store``, ``dedup_ingest``).

The protocol, in full:

- Each micro-batch dynamically overwrites exactly its OWN partition
  ``__batch=<id>``. Spark batch ids are non-negative and a replayed
  batch recomputes the same rows (foreachBatch bodies here are
  deterministic functions of the batch input and strictly-earlier
  state), so replays are idempotent per partition — the parquet
  answer to exactly-once sinks, no transaction log required.
- Compaction owns the NEGATIVE id space: partition ``__batch=-(u+1)``
  holds the fold of every batch ``<= u``. The two id spaces are
  disjoint, so a replayed micro-batch can never overwrite compacted
  history.
- Readers derive a coverage watermark from the deepest negative id
  and take the ``live_view``: that partition plus only the positive
  batches ABOVE its coverage. Shallower negatives (a crashed
  compaction's predecessor) and covered positives (crash leftovers,
  or a pre-checkpoint batch replayed after compaction re-created its
  partition) are duplicates of content already inside the deepest
  negative — excluded at read, which makes compaction cleanup pure
  space reclamation and both crash windows read-safe.

At 100 TB the listing in ``batch_ids`` stays metadata-sized: one id
per micro-batch or compaction, read from partition directory names
(never the data), and compaction exists precisely to keep that count
bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BATCH_COL = "__batch"


def batch_ids(log: DataFrame) -> list[int]:
    """Distinct ``__batch`` ids — a partition-column listing, no data
    read (bounded: one id per micro-batch/compaction)."""
    return [r[0] for r in log.select(BATCH_COL).distinct().collect()]


def covered_watermark(ids: list[int]) -> int:
    """The deepest compacted partition ``__batch=-(u+1)`` proves every
    batch ``<= u`` is merged into it. Returns -1 when nothing is
    compacted."""
    return max((-b - 1 for b in ids if b < 0), default=-1)


def live_view(log: DataFrame, covered: int) -> DataFrame:
    """Filter to the exactly-once view: the deepest compacted
    partition plus every positive batch above its coverage (see module
    docstring for why the rest are safe to drop)."""
    return log.filter(
        (F.col(BATCH_COL) == F.lit(-(covered + 1)))
        | (F.col(BATCH_COL) > F.lit(covered))
    )


def write_batch_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """(Over)write exactly partition ``__batch=<batch_id>`` with
    ``df``'s rows. ``batch_id`` must be non-negative — the negative id
    space belongs to compaction."""
    if batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}); negative ids are "
            "reserved for compacted partitions"
        )
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .partitionBy(BATCH_COL)
        .parquet(path)
    )


def drop_partitions(spark, path: str, ids: list[int]) -> int:
    """Delete the given partition directories (space reclamation after
    compaction; readers already exclude them). Returns how many
    existed and were dropped."""
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    dropped = 0
    for b in ids:
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{BATCH_COL}={b}")
        if fs.exists(p):
            fs.delete(p, True)
            dropped += 1
    return dropped
