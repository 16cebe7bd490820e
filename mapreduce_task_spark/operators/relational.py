"""Relational operator builders beyond the reference's surface.

The reference implements no joins/windows/rollups (SURVEY.md §2.5) —
Spark built-ins cover the whole category; these helpers encode the
*scale-correct* physical choices so query authors don't re-decide them:

- dimension joins broadcast explicitly (no shuffle for the small side),
- top-k is ``orderBy().limit()`` (TakeOrderedAndProject: per-partition
  heap + driver merge of k rows — never a global window),
- per-group top-k is a window partitioned by the group (scales with
  group count),
- sessionization is lag + running conditional sum (two windows, both
  partitioned by user — no single-partition funnel).

Money/double aggregates: callers should aggregate DECIMAL and cast the
result to DOUBLE (see queries/relational.py) so results are independent
of partition-level float accumulation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join with an explicit broadcast of the dimension side."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of ``left`` with at least one match (no right columns)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match."""
    return left.join(right, on, "left_anti")


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global deterministic top-k: ORDER BY ... LIMIT k.

    Physical plan is TakeOrderedAndProject — each partition keeps a
    k-row heap, the driver merges num_partitions*k rows. O(k) driver
    memory at any scale. Pass a total order (include a tie-breaker).
    """
    return df.orderBy(*order).limit(k)


def grouped_top_k(df: DataFrame, group_cols: list[str], k: int, *order: Column, rank_col: str = "rn") -> DataFrame:
    """Top-k per group via row_number window (scales with #groups)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign 1-based session indexes per user from inactivity gaps.

    lag(ts) + cumulative sum of gap-exceeded flags; both windows are
    partitioned by user, so parallelism scales with user count.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # TIMESTAMP_NTZ has no direct long cast; go via TIMESTAMP (session is
    # pinned UTC by the loaders, so this is the plain epoch second)
    secs = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(secs).over(w)
    new_session = F.when(prev.isNull() | ((secs - prev) > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
