"""Time-series resampling, gap-fill, and robust anomaly detection.

The reference (oscar-osu/mapreduce-task) has no temporal operators at all
(SURVEY.md §2.5 lists windows/temporal logic among its absences); these are
the batch time-series primitives an events pipeline needs, expressed so
Catalyst keeps every stage in whole-stage codegen:

- ``resample_ffill``: per-key fixed-interval resampling. Each key's dense
  bucket spine is generated with ``sequence()`` + ``explode`` from its own
  [min, max] bucket span (no global calendar — a key active for one hour
  generates one hour of buckets), bucket aggregates are left-joined on, and
  gaps are forward-filled with an ``last(ignorenulls)`` running window per
  key. Scale: the spine explode is parallel in the key dimension, the join
  shuffles on (key, bucket) exactly once, and the fill window is per-key —
  state bounded by one key's span / interval, never the corpus.

- ``mad_outliers``: per-group robust z-score outlier flagging via
  median / MAD (median absolute deviation), the standard
  breakdown-point-0.5 alternative to mean/stddev that a quality pipeline
  uses on heavy-tailed signals. Two grouped exact-percentile aggregations
  and one broadcastable stats join; ``approx_percentile`` is the drop-in
  at 100 TB (group count stays small — the stats side broadcasts).

Determinism discipline (registry rules): medians are computed over
integer-quantized values (cents), so interpolated midpoints are exact in
binary floating point and the MAD threshold compare is bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .pinning import Pin


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    interval: str = "6 hours",
    order_col: str = "event_id",
) -> DataFrame:
    """Resample events onto a per-key dense bucket grid and forward-fill.

    Returns one row per (key, bucket) for every bucket between the key's
    first and last event — including empty gap buckets — with:

    - ``n_events``  events landing in the bucket (0 for gaps)
    - ``sum_value`` decimal-exact sum of ``value_col`` (0.0 for gaps)
    - ``last_value`` value of the bucket's latest event by ``order_col``
      (NULL for gaps)
    - ``filled_value`` ``last_value`` forward-filled from the most recent
      non-empty bucket (the resampled series a feature pipeline consumes)
    - ``is_gap`` 1 for generated gap buckets, else 0
    """
    # epoch-anchored tumbling bucket — the same grid shape the streaming
    # path uses (streaming/windows.py) and DuckDB's time_bucket replays.
    # ONE-SCAN plan: the dense spine does NOT join back to the bucket
    # aggregates (that reused the per-bucket lineage and re-scanned the
    # source); instead each key's bucket cells ride ONE (key) row as an
    # array, the spine explodes from that row's own [min, max], and each
    # spine slot looks its cell up in-row. Per-key state = that key's
    # bucket count — exactly the bound the fill window already implies.
    step = F.expr(f"INTERVAL {interval}")
    per_bucket = (
        events.withColumn("bucket", F.window(ts_col, interval).start)
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.max_by(value_col, order_col).alias("last_value"),
        )
    )
    packed = per_bucket.groupBy(key_col).agg(
        F.collect_list(
            F.struct("bucket", "n_events", "sum_value", "last_value")
        ).alias("__cells"),
        F.min("bucket").alias("_b0"),
        F.max("bucket").alias("_b1"),
    )
    # linear in-row merge, NOT per-slot lookup (a filter() per spine
    # slot is O(cells) each -> quadratic per key; a year of minutes
    # would be 1e11 comparisons): gap slots = array_except(spine,
    # cell buckets) — hash-set based, O(n) — wrapped in null-field
    # structs, concatenated with the real cells and sorted once by
    # bucket (array_sort on structs orders by the first field).
    val_type = dict(events.dtypes)[value_col]
    seq = F.sequence("_b0", "_b1", step)
    cell_buckets = F.transform(F.col("__cells"), lambda c: c["bucket"])
    gap_cells = F.transform(
        F.array_except(seq, cell_buckets),
        lambda b: F.struct(
            b.alias("bucket"),
            F.lit(None).cast("bigint").alias("n_events"),
            F.lit(None).cast("double").alias("sum_value"),
            F.lit(None).cast(val_type).alias("last_value"),
        ),
    )
    dense = (
        packed.select(
            key_col,
            F.explode(
                F.array_sort(F.concat(F.col("__cells"), gap_cells))
            ).alias("__c"),
        )
        .select(
            key_col,
            F.col("__c.bucket").alias("bucket"),
            F.col("__c.n_events").alias("n_events"),
            F.col("__c.sum_value").alias("sum_value"),
            F.col("__c.last_value").alias("last_value"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        "last_value",
        F.last("last_value", ignorenulls=True).over(w).alias("filled_value"),
        F.when(F.col("n_events").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_gap"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    k: float = 4.4478,  # 3 * 1.4826 (normal-consistency constant), folded
    pin: "Pin | None" = None,
) -> DataFrame:
    """Flag rows whose |value - median| exceeds ``k`` * MAD within a group.

    Values are quantized to integer cents before the percentile passes, so
    the interpolated median and every |x - med| deviation are exact
    (multiples of 0.5 in double) and the threshold compare is bit-stable.
    Returns only the outlier rows with their deviation; the caller joins
    back on the id column if full rows are needed.

    Standard MAD caveat: if more than half a group's values are
    identical, MAD is 0 and EVERY deviating row is flagged — the
    correct robust-statistics behavior (the group genuinely has a
    degenerate spread), deterministic on both engines.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    with_c = df.withColumn("_cents", cents)
    med = with_c.groupBy(group_col).agg(
        F.percentile("_cents", 0.5).alias("_med")
    )
    # ``dev`` feeds two consumers (the MAD aggregation and the final
    # flag filter); without pinning each re-derives it from the source
    # — 4 scans of a 100 TB corpus instead of 2. ``pin`` (see
    # operators.pinning for the lazy_checkpoint-vs-disk_persist
    # fault-tolerance tradeoff) materializes the deviation projection
    # once; default None keeps the caller's failure semantics.
    dev = with_c.join(F.broadcast(med), group_col).withColumn(
        "_dev", F.abs(F.col("_cents") - F.col("_med"))
    )
    if pin is not None:
        dev = pin(dev)
    mad = dev.groupBy(group_col).agg(F.percentile("_dev", 0.5).alias("_mad"))
    flagged = dev.join(F.broadcast(mad), group_col).filter(
        F.col("_dev") > F.col("_mad") * F.lit(k)
    )
    return flagged.select(
        *[c for c in df.columns],
        (F.col("_dev") * 2).cast("bigint").alias("dev_halfcents"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average via one pandas pass.

    EWMA is inherently sequential per key (y_i = a*x_i + (1-a)*y_{i-1}),
    which SQL window frames cannot express without numerically unstable
    w^-i rescaling — so each key's ordered series runs through one Arrow
    batch in ``applyInPandas``. Parallelism is the key dimension (the same
    contract as any per-key stateful pass); no cross-key state exists.

    Output schema is exactly (key, order, value, ewma) — the needed
    columns are projected BEFORE the pandas stage (narrower Arrow
    batches, and no re-serialization of arbitrary input schemas: a
    carried struct/decimal column would break a simpleString round-trip
    and bloat every batch). Callers wanting other columns join back on
    (key, order).
    """
    sel = df.select(key_col, order_col, value_col)

    def _ewma(pdf):
        pdf = pdf.sort_values(order_col)
        pdf[out_col] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sel.schema.fields
    )
    return sel.groupBy(key_col).applyInPandas(
        _ewma, schema=f"{schema}, {out_col} double"
    )


def group_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Per-key ordinary-least-squares trend: (key, n, slope, intercept,
    r2) — the per-entity drift detector (user spend trend, source
    quality drift) fitted at scale.

    Closed-form OLS IS a reduction, so this is ONE groupBy with five
    moment aggregates and zero Python — no Arrow batch, no per-key
    pandas stage, partial-aggregated map-side like any sum:

        slope     = covar_samp(x, y) / var_samp(x)
        intercept = avg(y) - slope * avg(x)
        r2        = covar_samp(x, y)^2 / (var_samp(x) * var_samp(y))
                    (the corr^2 identity; 1.0 when var(y) == 0 — a
                    constant series is fit exactly by its own mean line)

    Keys with fewer than ``min_points`` points or zero x-variance emit
    NULL slope/intercept/r2 (no fit exists). ``group_trend_pandas`` is
    the per-key numpy twin kept as the parity oracle in tests.
    """
    agg = (
        df.select(key_col, x_col, y_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.covar_samp(x_col, y_col).alias("_sxy"),
            F.var_samp(x_col).alias("_sxx"),
            F.var_samp(y_col).alias("_syy"),
            F.avg(x_col).alias("_xm"),
            F.avg(y_col).alias("_ym"),
        )
    )
    # var_samp is NULL at n=1, 0.0 for a constant column — both mean
    # "no fit"; min_points guards small-n fits the caller distrusts
    fit_ok = (
        (F.col("n") >= F.lit(int(min_points)))
        & F.col("_sxx").isNotNull()
        & (F.col("_sxx") > 0.0)
    )
    slope = F.when(fit_ok, F.col("_sxy") / F.col("_sxx"))
    intercept = F.when(fit_ok, F.col("_ym") - slope * F.col("_xm"))
    r2 = F.when(
        fit_ok,
        F.when(F.col("_syy") == 0.0, F.lit(1.0)).otherwise(
            (F.col("_sxy") * F.col("_sxy")) / (F.col("_sxx") * F.col("_syy"))
        ),
    )
    return agg.select(
        key_col,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def group_trend_exact(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Engine-portable OLS trend over INTEGER x/y columns: (key, n,
    slope, intercept, r2).

    ``group_trend`` above is the production form, but its
    covar_samp/var_samp accumulate doubles, so the result depends on
    accumulation order — a SQL oracle cannot replay it bit-for-bit.
    This variant aggregates the five raw moments as EXACT int64 sums
    (order-free, partition-invariant) and only then combines them in a
    FIXED sequence of double operations:

        num   = n*sxy - sx*sy        den  = n*sxx - sx*sx
        deny  = n*syy - sy*sy
        slope = num/den              intercept = (sy - slope*sx)/n
        r2    = 1.0 if deny == 0 else (num*num)/(den*deny)

    Any engine computing the same expressions over the same exact
    integer sums produces bit-identical doubles (IEEE ops on identical
    inputs). Callers quantize/shift their columns into int64-safe
    ranges (epoch-offset seconds, value cents — see the driver query).
    The five moments accumulate as decimal(38,0), NOT int64: Spark's
    non-ANSI int64 sum WRAPS silently past 2^63 while DuckDB promotes
    to 128-bit, so an int64 formulation would silently diverge beyond
    the |x|/|y|/rows-per-key envelope instead of failing loudly. With
    decimal moments, overflow past 38 digits (astronomically beyond
    any quantized input) yields NULL sums -> NULL fits on the Spark
    side and a cast error on a bigint-casting oracle — loud on both
    engines, never a plausible-looking wrong slope. NULL fit
    (slope/intercept/r2) when n < min_points or x-variance is zero —
    same contract as ``group_trend``.
    """
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    # per-row products in decimal(19,0)*decimal(19,0) -> decimal(38,0):
    # any int64 pair multiplies without wrap; sums stay (38,0)
    xd, yd = F.col("__x").cast("decimal(19,0)"), F.col("__y").cast("decimal(19,0)")
    agg = (
        df.select(F.col(key_col), x.alias("__x"), y.alias("__y"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("_sx"),
            F.sum(yd).alias("_sy"),
            F.sum(xd * yd).alias("_sxy"),
            F.sum(xd * xd).alias("_sxx"),
            F.sum(yd * yd).alias("_syy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    num = nd * sxy - sx * sy
    den = nd * sxx - sx * sx
    deny = nd * syy - sy * sy
    fit_ok = (F.col("n") >= F.lit(int(min_points))) & (den > F.lit(0.0))
    slope = F.when(fit_ok, num / den)
    intercept = F.when(fit_ok, (sy - slope * sx) / nd)
    r2 = F.when(
        fit_ok,
        F.when(deny == F.lit(0.0), F.lit(1.0)).otherwise(
            (num * num) / (den * deny)
        ),
    )
    return agg.select(
        F.col(key_col),
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def group_trend_pandas(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    min_points: int = 2,
) -> DataFrame:
    """Per-key OLS via one numpy pass per key (applyInPandas) — the
    independent-formula parity twin of ``group_trend``, kept so tests
    can cross-check the aggregate form against an explicit
    residual-sum computation. Not the production path (a Python stage
    per key for a closed-form reduction is waste at 100 TB).
    """
    import pandas as pd

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        key = pdf[key_col].iloc[0]
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(pdf)
        if n < min_points or np.ptp(x) == 0.0:
            return pd.DataFrame(
                {
                    key_col: [key],
                    "n": [n],
                    "slope": [None],
                    "intercept": [None],
                    "r2": [None],
                }
            )
        xm, ym = x.mean(), y.mean()
        sxx = ((x - xm) ** 2).sum()
        sxy = ((x - xm) * (y - ym)).sum()
        slope = sxy / sxx
        intercept = ym - slope * xm
        ss_res = ((y - (slope * x + intercept)) ** 2).sum()
        ss_tot = ((y - ym) ** 2).sum()
        r2 = 1.0 if ss_tot == 0.0 else 1.0 - ss_res / ss_tot
        return pd.DataFrame(
            {
                key_col: [key],
                "n": [n],
                "slope": [slope],
                "intercept": [intercept],
                "r2": [r2],
            }
        )

    ktype = dict(df.dtypes)[key_col]
    return df.select(key_col, x_col, y_col).groupBy(key_col).applyInPandas(
        fit,
        schema=f"{key_col} {ktype}, n bigint, slope double, "
        "intercept double, r2 double",
    )
