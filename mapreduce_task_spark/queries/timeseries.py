"""Time-series queries over the events table: resample+gap-fill+ffill and
robust MAD outlier detection (operators.timeseries).

The reference has no temporal logic at all (SURVEY §2.5); these register
the batch time-series surface with full DuckDB oracles. Determinism:
bucket grids are epoch-anchored (Spark ``window()`` == DuckDB
``time_bucket``), bucket timestamps cross the engine boundary as formatted
strings, medians run over integer cents so interpolation is exact, and
forward-fill picks its value by the unique event_id order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.pinning import lazy_checkpoint
from ..operators.timeseries import group_trend_exact, mad_outliers, resample_ffill
from ..registry import query, t


@query(
    "timeseries_shapes",
    oracle="""
    WITH per_bucket AS (
      SELECT user_id, time_bucket(INTERVAL '6 hours', ts) AS bucket,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             max_by(value, event_id) AS last_value
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id,
             unnest(generate_series(min(bucket), max(bucket),
                                    INTERVAL '6 hours')) AS bucket
      FROM per_bucket GROUP BY user_id
    ),
    resample AS (
    SELECT s.user_id,
           strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           coalesce(p.n_events, 0) AS n_events,
           coalesce(p.sum_value, 0.0) AS sum_value,
           p.last_value AS last_value,
           last_value(p.last_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           CAST(CASE WHEN p.n_events IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
    FROM spine s LEFT JOIN per_bucket p USING (user_id, bucket)
    ),
    c AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
            FROM c GROUP BY event_type),
    d AS (SELECT c.*, abs(c.cents - med.med) AS dev
          FROM c JOIN med USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
            FROM d GROUP BY event_type),
    outliers AS (
    SELECT d.event_id, d.event_type, d.value,
           CAST(d.dev * 2 AS BIGINT) AS dev_halfcents
    FROM d JOIN mad USING (event_type)
    WHERE d.dev > mad.mad * 4.4478
    ),
    xy AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) - 1704000000 AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    mo AS (
      SELECT user_id, count(*) AS n,
             CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy,
             CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
             CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM xy GROUP BY user_id
    ),
    trend AS (
      SELECT user_id, n,
             CASE WHEN ok THEN num / den END AS slope,
             CASE WHEN ok THEN (sy - (num / den) * sx) / nd END AS intercept,
             CASE WHEN ok THEN
               CASE WHEN deny = 0.0 THEN 1.0
                    ELSE (num * num) / (den * deny) END
             END AS r2
      FROM (SELECT user_id, n, sx, sy,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(n AS DOUBLE) * sxy - sx * sy AS num,
                   CAST(n AS DOUBLE) * sxx - sx * sx AS den,
                   CAST(n AS DOUBLE) * syy - sy * sy AS deny,
                   (n >= 2 AND CAST(n AS DOUBLE) * sxx - sx * sx > 0.0) AS ok
            FROM mo)
    )
    SELECT 'resample' AS leg, user_id, bucket_start, n_events, sum_value,
           last_value, filled_value, is_gap,
           CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS DOUBLE) AS value, CAST(NULL AS BIGINT) AS dev_halfcents,
           CAST(NULL AS BIGINT) AS trend_n, CAST(NULL AS DOUBLE) AS slope,
           CAST(NULL AS DOUBLE) AS intercept, CAST(NULL AS DOUBLE) AS r2
    FROM resample
    UNION ALL
    SELECT 'outlier' AS leg, CAST(NULL AS BIGINT) AS user_id,
           CAST(NULL AS VARCHAR) AS bucket_start, CAST(NULL AS BIGINT) AS n_events,
           CAST(NULL AS DOUBLE) AS sum_value, CAST(NULL AS DOUBLE) AS last_value,
           CAST(NULL AS DOUBLE) AS filled_value, CAST(NULL AS INT) AS is_gap,
           event_id, event_type, value, dev_halfcents,
           CAST(NULL AS BIGINT) AS trend_n, CAST(NULL AS DOUBLE) AS slope,
           CAST(NULL AS DOUBLE) AS intercept, CAST(NULL AS DOUBLE) AS r2
    FROM outliers
    UNION ALL
    SELECT 'trend' AS leg, user_id,
           CAST(NULL AS VARCHAR) AS bucket_start, CAST(NULL AS BIGINT) AS n_events,
           CAST(NULL AS DOUBLE) AS sum_value, CAST(NULL AS DOUBLE) AS last_value,
           CAST(NULL AS DOUBLE) AS filled_value, CAST(NULL AS INT) AS is_gap,
           CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS event_type,
           CAST(NULL AS DOUBLE) AS value, CAST(NULL AS BIGINT) AS dev_halfcents,
           CAST(n AS BIGINT) AS trend_n, slope, intercept, r2
    FROM trend
    """,
    doc="Batch time-series coverage as a three-leg tagged union (merges the "
    "former resample_ffill / outlier_mad rows, round 6). resample leg: "
    "per-user 6h resampling with gap buckets and forward fill — dense "
    "bucket spine from each user's own [min,max] span via "
    "sequence()+explode, bucket aggregates left-joined on, gaps filled "
    "with a per-user last(ignorenulls) running window; one "
    "(user,bucket) shuffle, fill state bounded per user. outlier leg: "
    "per-event-type robust median/MAD z-score flagging over integer "
    "cents so both exact percentile passes and the 4.4478*MAD compare "
    "are bit-stable; approx_percentile is the 100 TB drop-in. trend "
    "leg (late r6): per-user OLS drift via group_trend_exact — five "
    "exact int64 moment sums (epoch-offset seconds x value cents) "
    "combined in a fixed double sequence, so slope/intercept/r2 are "
    "bit-identical on any engine and partitioning (the float "
    "group_trend's covar/var twin, made oracle-replayable).",
)
def q_timeseries_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    dense = resample_ffill(
        ev,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        interval="6 hours",
        order_col="event_id",
    )
    nul_b = F.lit(None).cast("long")
    nul_s = F.lit(None).cast("string")
    nul_d = F.lit(None).cast("double")
    res_leg = dense.select(
        F.lit("resample").alias("leg"),
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        "sum_value",
        "last_value",
        "filled_value",
        "is_gap",
        nul_b.alias("event_id"),
        nul_s.alias("event_type"),
        nul_d.alias("value"),
        nul_b.alias("dev_halfcents"),
        nul_b.alias("trend_n"),
        nul_d.alias("slope"),
        nul_d.alias("intercept"),
        nul_d.alias("r2"),
    )
    out_leg = mad_outliers(
        ev.select("event_id", "event_type", "value"),
        group_col="event_type",
        value_col="value",
        pin=lazy_checkpoint,
    ).select(
        F.lit("outlier").alias("leg"),
        nul_b.alias("user_id"),
        nul_s.alias("bucket_start"),
        nul_b.alias("n_events"),
        nul_d.alias("sum_value"),
        nul_d.alias("last_value"),
        nul_d.alias("filled_value"),
        F.lit(None).cast("int").alias("is_gap"),
        "event_id",
        "event_type",
        "value",
        "dev_halfcents",
        nul_b.alias("trend_n"),
        nul_d.alias("slope"),
        nul_d.alias("intercept"),
        nul_d.alias("r2"),
    )
    xy = ev.select(
        "user_id",
        # NTZ -> LTZ under the pinned-UTC session, then epoch seconds
        # (floor) — DuckDB replays as floor(epoch(ts)); the 1.704e9
        # offset keeps per-key int64 moment sums far from overflow
        (
            F.unix_timestamp(F.col("ts").cast("timestamp"))
            - F.lit(1_704_000_000)
        ).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    trend_leg = group_trend_exact(xy, "user_id", "x", "y").select(
        F.lit("trend").alias("leg"),
        "user_id",
        nul_s.alias("bucket_start"),
        nul_b.alias("n_events"),
        nul_d.alias("sum_value"),
        nul_d.alias("last_value"),
        nul_d.alias("filled_value"),
        F.lit(None).cast("int").alias("is_gap"),
        nul_b.alias("event_id"),
        nul_s.alias("event_type"),
        nul_d.alias("value"),
        nul_b.alias("dev_halfcents"),
        F.col("n").cast("long").alias("trend_n"),
        "slope",
        "intercept",
        "r2",
    )
    return res_leg.unionByName(out_leg).unionByName(trend_leg)


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(row(ts, event_id)) AS m1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(row(e.ts, e.event_id)) AS m2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND row(e.ts, e.event_id) > s1.m1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND row(e.ts, e.event_id) > s2.m2
      GROUP BY e.user_id
    )
    SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
           CAST(n_keys AS BIGINT) AS n_keys
    FROM (VALUES
      (1, 'view',     (SELECT count(*) FROM s1)),
      (2, 'click',    (SELECT count(*) FROM s2)),
      (3, 'purchase', (SELECT count(*) FROM s3))
    ) t(step_idx, step, n_keys)
    """,
    doc="Ordered view->click->purchase funnel (operators/relational.py "
    "funnel_counts): one groupBy over step-typed events, sorted per-user "
    "timeline + codegen cursor fold. The oracle replays it as cascaded "
    "first-match CTEs — the cursor's 'first step-k event strictly after "
    "the step-(k-1) match' is exactly min(row(ts, event_id)) with a "
    "row-tuple comparison, so both formulations are equivalent for any "
    "tie pattern. The only shuffle carries step-typed events; per-user "
    "state is that user's step events — the product-analytics shape at "
    "any log size.",
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import funnel_counts

    return funnel_counts(
        t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )
