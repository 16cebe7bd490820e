"""Mergeable sketch operators beyond Spark's built-ins.

Spark ships HLL (approx_count_distinct) and KLL-ish quantiles
(approx_percentile) — see queries/advanced.py `approx_sketches`. The
missing classic for training-data pipelines is HEAVY HITTERS: "which
exact tokens / domains / templates dominate this corpus" over
cardinalities where an exact groupBy's shuffle is the bottleneck.

``heavy_hitters`` runs Misra-Gries per partition (k counters, batched
decrements — every compression subtracts the (k+1)-th largest count
from ALL counters and drops the non-positive ones, which decrements
>= k+1 items per unit and preserves the classic bound), then merges
summaries with an exact groupBy over at most k rows per partition.

Guarantees (classic MG, summed across partitions):
- underestimate only: est <= true count, and
- true - est <= total_rows / (k + 1),
so every key with true frequency > total/(k+1) survives with a
positive estimate. Shuffle volume: k rows per partition instead of one
row per distinct key — the 100 TB win.

Everything inside the Arrow batch is vectorized pandas
(value_counts / add / nlargest); no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def heavy_hitters(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """(key_col, est_count) for up to ~k heavy keys. Callers order by
    est_count and cut at their support threshold; est_count is a lower
    bound on the true count (see module docstring for the error bound).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    import pandas as pd

    src = df.select(F.col(key_col).cast("string").alias("key"))

    def mg(it):
        acc = None
        for pdf in it:
            vc = pdf["key"].value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                # subtract the (k+1)-th largest from everything: at
                # least k+1 counters shrink per unit subtracted, and at
                # least one hits zero -> <= k survivors, MG bound holds
                thresh = acc.nlargest(k + 1).iloc[-1]
                acc = acc - thresh
                acc = acc[acc > 0]
        if acc is None or acc.empty:
            yield pd.DataFrame({"key": pd.Series([], dtype="object"),
                                "mg_count": pd.Series([], dtype="int64")})
        else:
            yield pd.DataFrame(
                {"key": acc.index.astype(str), "mg_count": acc.values.astype("int64")}
            )

    summaries = src.mapInPandas(mg, schema="key string, mg_count long")
    return summaries.groupBy("key").agg(F.sum("mg_count").alias("est_count")).select(
        F.col("key").alias(key_col), "est_count"
    )
