"""Windowed + stateful streaming operators.

Every transformation here is written against a plain DataFrame so the
SAME function serves batch and streaming plans (Structured Streaming's
core design: incrementalize the batch plan). Watermarks bound state:
without one, windowed state grows forever on an unbounded stream —
the 100 TB/day failure mode.

Scale notes:
- Tumbling/sliding windows + counts are partial-aggregated per
  micro-batch; state lives in the state store keyed by (window, key).
- ``dropDuplicates`` with a watermark keeps only in-horizon keys in
  state (exact streaming dedup needs a key horizon).
- ``applyInPandasWithState`` is the arbitrary-stateful escape hatch
  (reference's reducer model generalized); state is per-key, Arrow
  batches in, incremental updates out.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Event-time watermark (streaming only). Watermarks require the
    zoned TIMESTAMP type, so an NTZ event-time column is cast first
    (session timezone is pinned to UTC — see session.RUNTIME_CONFS —
    making the cast value-preserving)."""
    if not df.isStreaming:
        return df
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def stream_from_directory(
    spark: SparkSession, path: str, schema, fmt: str = "parquet", **options
) -> DataFrame:
    """File-source stream: processes files as they land in ``path``.

    The canonical bridge from a batch table to a stream in tests and
    backfills (one file = one micro-batch with availableNow).
    """
    reader = spark.readStream.schema(schema).format(fmt)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window per-key event counts (works on batch AND streaming
    input; on streams the watermark lets closed windows emit + evict)."""
    src = _with_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Overlapping-window counts (each event lands in window/slide panes)."""
    src = _with_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of key silence.

    The streaming analogue of operators.relational.sessionize (which
    is the batch lag/cumsum formulation).
    """
    src = _with_watermark(df, ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n",
        )
    )


def running_dedupe(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exact dedup on ``keys`` — same key set in batch and streaming.

    Streams use ``dropDuplicatesWithinWatermark``: two events with the
    same keys but different event times still dedupe (batch-equivalent
    within the horizon), while state for a key is evicted once the
    watermark passes it — bounded state on an unbounded stream. Plain
    streaming ``dropDuplicates(keys)`` would keep every key forever;
    adding ``ts`` to the keys (the previous formulation) silently
    changed the dedup semantics between batch and stream.
    """
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    src = _with_watermark(df, ts_col, watermark)
    return src.dropDuplicatesWithinWatermark(keys)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join (impressions x conversions
    shape): pairs rows with equal ``key_col`` where ``right_ts`` falls
    in [left_ts, left_ts + within].

    ``how="left_outer"`` additionally emits each unmatched left row
    once — with null right columns — after the watermark passes its
    match horizon (the funnel question: which impressions never
    converted). ``how="full_outer"`` does the same for BOTH sides
    (unmatched conversions surface too — attribution debugging).
    Outer results are inherently watermark-delayed: a row can only be
    declared unmatched once no in-range partner can still arrive.

    Both inputs carry event-time watermarks AND the join carries the
    closed time-range condition — exactly the two ingredients that let
    Structured Streaming bound BOTH join states: a buffered left row
    is evictable once the right watermark passes left_ts + within, a
    right row once the left watermark passes right_ts - within. The
    analyzer rejects an append-mode stream-stream join without them
    (unbounded state — the 100 TB/day failure mode), so merely running
    in append mode proves the state bound. The same function joins
    batch frames identically (watermarks no-op), which is the
    equivalence oracle in tests.

    Column contract: ``left`` and ``right`` share only ``key_col``;
    timestamp columns are pre-renamed by the caller so the output
    carries both sides' times unambiguously.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError("how must be 'inner', 'left_outer', or 'full_outer'")
    lw = _with_watermark(left, left_ts, watermark)
    rw = _with_watermark(right, right_ts, watermark).withColumnRenamed(
        key_col, "__rkey"
    )
    cond = (
        (F.col(key_col) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop("__rkey")


_STATE_SCHEMA = "n bigint"
_OUT_SCHEMA = "event_type string, n bigint"


def _cents_half_up(values) -> int:
    """Sum of per-row integer cents, rounded HALF UP — the same
    convention as Spark's ``F.round`` (and the batch oracles built on
    it). pandas ``.round()`` is banker's half-to-even, which diverges
    by 1 on exactly-representable .5-cent values (e.g. 0.125 * 100 =
    12.5: pandas -> 12, Spark -> 13)."""
    import numpy as np

    c = values.to_numpy(dtype="float64") * 100.0
    # nulls/NaN must not reach the int64 cast: astype on non-finite
    # floats yields platform-dependent garbage (typically INT64_MIN)
    # silently. Match the batch oracle (F.sum skips nulls) by masking.
    c = c[np.isfinite(c)]
    half_up = np.where(c >= 0, np.floor(c + 0.5), np.ceil(c - 0.5))
    return int(half_up.astype("int64").sum())


def stateful_running_count(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Custom stateful operator: cumulative per-key count across
    micro-batches via applyInPandasWithState.

    Demonstrates the arbitrary-state API the reference's reducer model
    maps onto when a built-in aggregate won't do (per-key model state,
    online algorithms, ...).
    """
    import pandas as pd

    def update(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"event_type": [key[0]], "n": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_key_stats(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, exact cent sum, max) across micro-batches
    via ``transformWithStateInPandas`` — the Spark 4 arbitrary-state API
    that supersedes ``applyInPandasWithState`` (typed state handles,
    TTL, timers; requires the RocksDB state store provider).

    Kept alongside ``stateful_running_count`` so both stateful APIs stay
    covered. Values are summed as per-row-rounded integer cents, so the
    running sum is exact regardless of batch slicing — the same
    quantization discipline the batch operators use.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class KeyStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "agg", "n bigint, cents bigint, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as _np
            import pandas as pd

            n, cents, mx = 0, 0, None
            if self._st.exists():
                prev = self._st.get()
                n, cents, mx = int(prev[0]), int(prev[1]), float(prev[2])
            for pdf in rows:
                n += len(pdf)
                cents += _cents_half_up(pdf[value_col])
                # same non-finite contract as the v1 twin below: mask
                # non-finite ROWS (exactly like the cent sum) before
                # taking the chunk max — a chunk-level isfinite test
                # would throw away finite values that merely SHARE a
                # chunk with an inf/null
                vals = pdf[value_col].to_numpy(dtype="float64")
                vals = vals[_np.isfinite(vals)]
                if vals.size:
                    m = float(vals.max())
                    mx = m if mx is None else max(mx, m)
            self._st.update((n, cents, mx))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "n": [n],
                    "sum_cents": [cents],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        KeyStats(),
        outputStructType=f"{key_col} string, n bigint, sum_cents bigint, max_value double",
        outputMode="Update",
        timeMode="None",
    )


def stateful_key_stats_v1(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """``stateful_key_stats`` on the ``applyInPandasWithState`` API:
    identical output schema and per-key running (count, exact cent sum,
    max) semantics, runnable on the default HDFS-backed state store
    with no extra runtime dependencies.

    Null/NaN contract: NULL values are skipped in both the cent sum
    and the running max — matching the batch oracle's F.sum/F.max.
    A GENUINE double NaN (not null) is treated the same as NULL here,
    because the Arrow-to-pandas conversion makes the two
    indistinguishable in the worker — whereas batch F.sum would
    propagate NaN and F.max would rank it greatest. Corpora that
    encode missing-as-NaN get the oracle-matching skip; corpora that
    use NaN as a real sentinel value diverge from the batch twin on
    exactly those rows (the one place "identical semantics" has an
    environment-imposed asterisk).

    Why both exist: the ``transformWithStateInPandas`` variant covers
    the Spark 4 typed-state API (state handles, TTL, timers) but its
    Python runner needs google.protobuf and the RocksDB provider —
    absent in some environments (this container, where its runner test
    is a recorded skip). This v1 twin pins the OPERATOR'S semantics
    end-to-end wherever Arrow works: the batch-equivalence test drives
    it against the same oracle aggregate, so the behavior contract the
    TWS variant claims is verified even where its runner cannot start.
    """
    import numpy as _np
    import pandas as pd

    def update(
        key, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            n, cents, mx = state.get
            n, cents = int(n), int(cents)
            mx = None if mx is None else float(mx)
        else:
            n, cents, mx = 0, 0, None
        for pdf in pdfs:
            n += len(pdf)
            # per-row-rounded integer cents: the running sum is exact
            # regardless of how rows slice into micro-batches
            cents += _cents_half_up(pdf[value_col])
            # non-finite ROWS are masked before the chunk max with
            # the same per-row isfinite test the cent sum uses, so the
            # two stats stay mutually consistent: non-finite values
            # are ignored EVERYWHERE, per row — a chunk-level test
            # would throw away finite values sharing a chunk with an
            # inf, and an unguarded pandas .max() would let an
            # all-null chunk's NaN poison the running max. (Documented
            # divergence from batch F.sum/F.max, which would propagate
            # a pathological inf instead of int64 garbage.)
            vals = pdf[value_col].to_numpy(dtype="float64")
            vals = vals[_np.isfinite(vals)]
            if vals.size:
                m = float(vals.max())
                mx = m if mx is None else max(mx, m)
        state.update((n, cents, mx))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "sum_cents": [cents], "max_value": [mx]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} string, n bigint, sum_cents bigint, max_value double"
        ),
        stateStructType="n bigint, cents bigint, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Real-time ordered-funnel tracking: per-key step cursor carried
    across micro-batches via applyInPandasWithState, emitting each
    key's current furthest step on every update — the streaming face of
    ``operators.relational.funnel_counts`` (same cursor semantics).

    Contract: cursor order is (ts, order) WITHIN a batch (the group's
    rows are sorted before folding) and batch arrival order ACROSS
    batches — correct under per-key in-order delivery (e.g. a
    time-partitioned ingest); a late step-1 event cannot rewind an
    already-advanced cursor, exactly like any streaming funnel built on
    at-least-once logs. State per key is two small ints — bounded by
    key cardinality, never by event volume.
    """
    import pandas as pd

    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("steps must be non-empty")

    def update(key, pdfs, state: GroupState):
        reached = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, order_col])
        for t in batch[type_col]:
            if reached < n_steps and t == steps[reached]:
                reached += 1
        state.update((reached,))
        yield pd.DataFrame({key_col: [key[0]], "reached": [reached]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, reached int",
        stateStructType="reached int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
