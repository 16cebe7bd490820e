"""Reuse pinning for multi-consumer intermediate frames.

Several library operators build one intermediate DataFrame that feeds
multiple downstream consumers (a BM25 stats frame read by the scorer
and the idf aggregate, a k-means centroid frame re-read every Lloyd
round, a minhash signature table joined from two sides). Left alone,
Spark re-derives the frame's whole lineage per consumer; *pinning* it
evaluates it once. The three reasonable pins trade speed against fault
tolerance differently:

- ``lazy_checkpoint`` — ``localCheckpoint(eager=False)``: truncates
  lineage and stores the blocks UNREPLICATED on executor local
  storage. Fastest (no serialization to a reliable store, and the only
  pin that keeps ITERATIVE plan depth constant), but after any
  executor loss the truncated lineage cannot be recomputed — every
  downstream job over the frame fails and the caller must re-run.
  Right for single-node runs and for clusters where a failed job is
  simply resubmitted (this benchmark driver).
- ``disk_persist`` — ``persist(StorageLevel.DISK_ONLY)``: KEEPS
  lineage, so lost blocks are recomputed transparently; costs a
  serialize/deserialize pass and does not bound iterative plan growth.
  The fault-tolerant default for long multi-tenant cluster jobs.
- ``no_pin`` — identity: recompute per consumer. Always correct;
  the right choice when the caller wants to see (and plan-assert) the
  operator's true unpinned lineage, or pins at a coarser granularity
  itself.

Operators that need a pin take a ``pin`` callback. NON-iterative
operators default to ``no_pin`` so importing the library never
silently changes a caller's failure semantics — the benchmark queries
opt in to ``lazy_checkpoint`` explicitly. ITERATIVE operators
(``pagerank_int``, the PQ/IVF Lloyd loops, ``connected_components``)
default to ``lazy_checkpoint`` because unbounded lineage growth is an
algorithmic non-starter there; pass ``disk_persist`` (or a
``df.checkpoint()`` lambda with a checkpoint dir) on clusters where
executor loss must not kill the job.
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame

Pin = Callable[[DataFrame], DataFrame]


def lazy_checkpoint(df: DataFrame) -> DataFrame:
    """Truncate lineage; blocks unreplicated on executors (see module doc)."""
    return df.localCheckpoint(eager=False)


def disk_persist(df: DataFrame) -> DataFrame:
    """Persist to executor disk, lineage kept — recomputable on loss."""
    return df.persist(StorageLevel.DISK_ONLY)


def no_pin(df: DataFrame) -> DataFrame:
    """Identity: each consumer re-derives the frame from source."""
    return df
