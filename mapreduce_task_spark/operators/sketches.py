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


# --------------------------------------------------------------------------
# Count-min sketch: the overestimate-only dual of Misra-Gries above.
# MG answers "which keys dominate" with k rows/partition; CM answers
# "how often does THIS key occur" for any key, from a fixed depth x width
# counter grid that merges by plain addition — the point-query sketch a
# pipeline broadcasts to score arbitrary keys without a corpus shuffle.


def cm_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build a count-min sketch: (row, bucket, cnt), depth x width cells.

    Each record lands in one bucket per hash row (seeded md5 family —
    deterministic, engine-portable, see functions.hashing); cells are
    exact sums, so two sketches of disjoint data MERGE by adding cells
    — the 100 TB contract (one depth*width-cell grid per corpus shard,
    added together, instead of a distinct-key shuffle).

    Guarantees for ``cm_estimate``: est >= true (overestimate only),
    and P[est - true > (e/width) * N] < e^-depth for each key.
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1, width >= 2")
    from ..functions.hashing import minhash_seed_hash

    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (minhash_seed_hash(F.col(key_col), r) % width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("__c"))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-query the sketch for each key: (key_col, est_count).

    The sparse (row, bucket, cnt) sketch rows are scattered ONCE into a
    dense depth*width grid indexed ``row*width + bucket`` (a single
    one-row projection, broadcast), so each key costs ``depth``
    positional ``element_at`` lookups — O(depth) per key, independent
    of how many cells are occupied. Absent cells are materialized as 0
    in the grid (no record ever hashed there). The grid build goes
    through an intermediate map projection (NOT captured inside the
    fill lambda: higher-order functions re-evaluate captured
    non-attribute expressions per element, which would rebuild the map
    depth*width times).
    """
    from ..functions.hashing import minhash_seed_hash

    grid = (
        sketch.agg(F.collect_list(F.struct("row", "bucket", "cnt")).alias("__s"))
        .select(
            F.map_from_entries(
                F.transform(
                    "__s",
                    lambda c: F.struct(
                        (c["row"] * width + c["bucket"]).cast("bigint").alias("k"),
                        c["cnt"].alias("v"),
                    ),
                )
            ).alias("__m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth * width - 1)),
                lambda i: F.coalesce(
                    F.try_element_at("__m", i.cast("bigint")),
                    F.lit(0).cast("bigint"),
                ),
            ).alias("__grid")
        )
    )

    def _cell(r: int):
        # hash64 is non-negative (15 md5 hex digits), so bucket is in
        # [0, width): the 1-based dense position is r*width + bucket + 1
        bucket = minhash_seed_hash(F.col(key_col), r) % width
        return F.element_at("__grid", (bucket + r * width + 1).cast("int"))

    ests = F.array(*[_cell(r) for r in range(depth)])
    return keys.crossJoin(F.broadcast(grid)).select(
        key_col, F.array_min(ests).alias("est_count")
    )


# --------------------------------------------------------------------------
# Mergeable HLL sketch COLUMNS (Spark's Apache DataSketches binding).
# approx_count_distinct collapses to a number at aggregation time;
# hll_sketch_agg keeps the sketch itself as a binary column, so
# per-partition/per-day sketches can be stored, unioned across
# arbitrary group rollups, and only then estimated — the pattern a
# 100 TB metrics store uses (build once per shard, merge many ways).


def hll_group_sketches(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, sketch): one DataSketches HLL per group over key_col."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col).alias("sketch")
    )


def hll_rollup_estimate(sketches: DataFrame, group_col: str) -> DataFrame:
    """Estimate per group AND the all-groups union WITHOUT rescanning
    the source: per-group estimates from the stored sketches, plus a
    'TOTAL' row from hll_union_agg over the same sketch column."""
    per = sketches.select(
        F.col(group_col).cast("string").alias(group_col),
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct")
    ).select(F.lit("TOTAL").alias(group_col), "approx_distinct")
    return per.unionByName(total)


# --------------------------------------------------------------------------
# Mergeable KLL quantile sketch COLUMNS (Spark 4.1's DataSketches
# binding). approx_percentile collapses to numbers at aggregation
# time; kll_sketch_agg_double keeps the KllDoublesSketch itself as a
# binary column — the quantile analogue of the HLL pattern above:
# build one sketch per shard/day/group ONCE, then answer quantile
# queries for ANY rollup of those groups by merging the stored
# sketches, never rescanning the raw values. Rank error is
# ~1.65%/99% confidence at the default k=200, independent of n.


def kll_group_sketches(
    df: DataFrame, group_col: str, val_col: str, k: int = 200
) -> DataFrame:
    """(group, sketch): one KllDoublesSketch per group over val_col.

    ``val_col`` is cast to double — the doubles variant covers the
    int/float columns of the star schema uniformly.
    """
    return df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(val_col).cast("double"), k).alias("sketch")
    )


def kll_rollup_quantiles(
    sketches: DataFrame, group_col: str, ranks: list[float]
) -> DataFrame:
    """Quantiles per group AND for the all-groups merge WITHOUT
    rescanning the source: per-group estimates read the stored
    sketches; the 'TOTAL' row merges them (kll_merge_agg_double) and
    reads quantiles off the merged sketch. Output one row per group
    plus TOTAL, with one ``qN`` double column per requested rank.
    """
    rank_arr = F.array(*[F.lit(float(r)) for r in ranks])
    names = [f"q{int(round(r * 100)):02d}" for r in ranks]

    def unpack(qcol):
        return [qcol.getItem(i).alias(n) for i, n in enumerate(names)]

    per = sketches.select(
        F.col(group_col).cast("string").alias(group_col),
        *unpack(F.kll_sketch_get_quantile_double("sketch", rank_arr)),
    )
    total = sketches.agg(
        F.kll_merge_agg_double("sketch").alias("merged")
    ).select(
        F.lit("TOTAL").alias(group_col),
        *unpack(F.kll_sketch_get_quantile_double("merged", rank_arr)),
    )
    return per.unionByName(total)
