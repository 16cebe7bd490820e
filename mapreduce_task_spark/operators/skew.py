"""Skew mitigation: salted aggregation and salted (replicated) joins.

The reference *injects* skew (heavy key ``the`` sleeping 5000 ms,
run.sh:80-81; SURVEY §2.4 F4) but has no mitigation. At 100 TB a hot
grouping/join key serializes one reducer exactly like that demo; these
operators are the standard fixes, complementing AQE's runtime skew
splitting (which only covers sort-merge joins, not aggregations or
broadcast-ineligible shapes).

- Salted aggregation: two-phase groupBy — partial on (key, salt),
  final on key. Works for any re-aggregatable function (sum/count/
  min/max); the salt spreads a hot key over N reducers.
- Salted join: the big side salts each row; the small-but-skewed side
  is replicated N ways (explode over the salt domain); the join runs
  on (key, salt) so a hot key's rows land on N partitions instead
  of one.

Salts are deterministic (hash of a unique column mod N) so results —
and tests — are reproducible; crc32/xxhash both fine, no oracle
dependency since salting never changes results, only placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def _salt(unique_col: str | Column, n: int) -> Column:
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c.cast("string")), F.lit(n)).cast("int")


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    unique_col: str,
    num_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum(c), count(*)) via two-phase salted agg.

    Phase 1 shuffles on (keys + salt) — a hot key spreads over
    ``num_salts`` partitions; phase 2 re-aggregates the (tiny)
    per-salt partials on the true keys.
    """
    salted = df.withColumn(SALT_COL, _salt(unique_col, num_salts))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("__n"),
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("__n").alias("n"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    big_unique_col: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed key frequencies and ``small``
    is too large (or the join shape wrong) for a plain broadcast.

    big rows get a deterministic salt; small is replicated once per
    salt value; the join key becomes (on, salt). Row multiplicity is
    preserved exactly — each big row matches exactly one replica.
    """
    b = big.withColumn(SALT_COL, _salt(big_unique_col, num_salts))
    s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return b.join(s, on=[on, SALT_COL], how=how).drop(SALT_COL)
