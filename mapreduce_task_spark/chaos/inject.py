"""Fault injection — straggler/skew simulation (SURVEY §2.4 F1-F6).

The reference's distinguishing chaos surface, config-key-compatible with
its ``insertindex.slow.*`` namespace (shared across all three jobs,
noted at TraceSortMapper.java:31):

- F1 slow map partitions: ``insertindex.slow.map.partitions`` (csv of
  partition ids), ``.sleep.ms``, ``.eachN`` — sleep per Nth record
  (TraceWordCountMapper.java:74-76,117-126)
- F2 slow map by input path substring:
  ``insertindex.slow.map.input.contains`` (TraceWordCountMapper.java:78-83)
- F3 slow reduce partitions: ``insertindex.slow.reduce.partitions`` +
  ``.sleep.ms`` + ``.eachN``, plus a one-time setup sleep
  (TraceWordCountReducer.java:79-84; TraceSortReducer.java:108-115)
- F4 heavy-key delay: ``insertindex.slow.reduce.heavy.key`` /
  ``.heavy.sleep.ms`` — models data skew (TraceWordCountReducer.java:106-113)
- F5 injection observability: hit counters (SLOW_INJECT_HITS et al.)
  surface through ``DataFrame.observe``

Design: injection is an *optional* ``mapInPandas`` barrier stage gated
on ``TaskContext.partitionId()`` / the input file path — when the config
is empty the wrapper returns the input DataFrame untouched, so the hot
path carries zero Python overhead. Sleeps are batched (one sleep per
Arrow batch of ``hits * sleep_ms``) — same injected latency as the
reference's per-record sleep without per-row Python dispatch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, functions as F

HITS_COL = "__slow_inject_hits"

# reference presets (BASELINE.md): e.g. run-slow.sh:70-72 slows map
# partitions 0-5 by 1200 ms/record.
PRESET_WORDCOUNT_SLOW_MAPS = {
    "insertindex.slow.map.partitions": "0,1,2,3,4,5",
    "insertindex.slow.map.sleep.ms": "1200",
    "insertindex.slow.map.eachN": "1",
}
PRESET_HEAVY_KEY_THE = {
    "insertindex.slow.reduce.heavy.key": "the",
    "insertindex.slow.reduce.heavy.sleep.ms": "5000",
}


def _parse_ids(csv: str | None) -> frozenset[int]:
    if not csv:
        return frozenset()
    return frozenset(int(x) for x in csv.split(",") if x.strip() != "")


@dataclass(frozen=True)
class ChaosConfig:
    """Parsed ``insertindex.slow.*`` chaos settings."""

    map_partitions: frozenset[int] = field(default_factory=frozenset)
    map_sleep_ms: int = 0
    map_each_n: int = 1
    map_input_contains: str | None = None
    reduce_partitions: frozenset[int] = field(default_factory=frozenset)
    reduce_sleep_ms: int = 0
    reduce_each_n: int = 1
    reduce_setup_sleep_ms: int = 0
    heavy_key: str | None = None
    heavy_sleep_ms: int = 0

    @classmethod
    def from_conf(cls, conf: dict[str, str]) -> "ChaosConfig":
        g = conf.get
        return cls(
            map_partitions=_parse_ids(g("insertindex.slow.map.partitions")),
            map_sleep_ms=int(g("insertindex.slow.map.sleep.ms", "0")),
            map_each_n=max(1, int(g("insertindex.slow.map.eachN", "1"))),
            map_input_contains=g("insertindex.slow.map.input.contains"),
            reduce_partitions=_parse_ids(g("insertindex.slow.reduce.partitions")),
            reduce_sleep_ms=int(g("insertindex.slow.reduce.sleep.ms", "0")),
            reduce_each_n=max(1, int(g("insertindex.slow.reduce.eachN", "1"))),
            reduce_setup_sleep_ms=int(g("insertindex.slow.reduce.setup.sleep.ms", "0")),
            heavy_key=g("insertindex.slow.reduce.heavy.key"),
            heavy_sleep_ms=int(g("insertindex.slow.reduce.heavy.sleep.ms", "0")),
        )

    @property
    def map_enabled(self) -> bool:
        return bool(self.map_sleep_ms and (self.map_partitions or self.map_input_contains))

    @property
    def reduce_enabled(self) -> bool:
        return bool(
            (self.reduce_sleep_ms and self.reduce_partitions) or self.reduce_setup_sleep_ms
        )

    @property
    def heavy_enabled(self) -> bool:
        return bool(self.heavy_key is not None and self.heavy_sleep_ms)


def _slow_stage(
    df: DataFrame,
    partitions: frozenset[int],
    sleep_ms: int,
    each_n: int,
    setup_sleep_ms: int,
    path_contains: str | None,
) -> DataFrame:
    """Insert an identity mapInPandas stage that sleeps like the
    reference's mapper/reducer hooks and emits a hit-count column."""
    file_gated = path_contains is not None
    src = df.withColumn("__file", F.input_file_name()) if file_gated else df
    schema_out = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema_out += f", {HITS_COL} bigint"
    cols = [f.name for f in df.schema.fields]

    def gen(iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        partition_gated = pid in partitions
        did_setup = False
        seen = 0
        for pdf in iterator:
            gated = partition_gated or (
                file_gated and bool(len(pdf)) and path_contains in str(pdf["__file"].iloc[0])
            )
            if file_gated:
                pdf = pdf.drop(columns=["__file"])
            hits = 0
            if gated and len(pdf):
                if setup_sleep_ms and not did_setup:
                    time.sleep(setup_sleep_ms / 1000.0)
                    did_setup = True
                if sleep_ms:
                    # every Nth record, counted across batches like the
                    # reference's per-record counter
                    hits = len(range((-seen) % each_n, len(pdf), each_n))
                    if hits:
                        time.sleep(hits * sleep_ms / 1000.0)
            seen += len(pdf)
            pdf = pdf.assign(**{HITS_COL: 0})
            if hits:
                pdf.loc[pdf.index[: 1], HITS_COL] = hits  # batch-level count
            yield pdf

    return src.mapInPandas(gen, schema=schema_out).select(*cols, HITS_COL)


def _finish(
    df: DataFrame, observation: Observation | str | None, counter: str
) -> DataFrame:
    # str observation = streaming-friendly named metric: Observation
    # objects only work on batch queries, while a name string surfaces
    # the counters in every StreamingQueryProgress.observedMetrics.
    if observation is not None:
        df = df.observe(observation, F.sum(F.col(HITS_COL)).alias(counter))
    return df.drop(HITS_COL)


def inject_map_chaos(
    df: DataFrame, cfg: ChaosConfig, observation: Observation | str | None = None
) -> DataFrame:
    """F1/F2: slow down scan-side partitions. No-op when disabled."""
    if not cfg.map_enabled:
        return df
    out = _slow_stage(
        df, cfg.map_partitions, cfg.map_sleep_ms, cfg.map_each_n, 0, cfg.map_input_contains
    )
    return _finish(out, observation, "SLOW_INJECT_MAP_HITS")


def inject_reduce_chaos(
    df: DataFrame, cfg: ChaosConfig, observation: Observation | str | None = None
) -> DataFrame:
    """F3: slow down post-shuffle partitions (apply after the groupBy)."""
    if not cfg.reduce_enabled:
        return df
    out = _slow_stage(
        df,
        cfg.reduce_partitions,
        cfg.reduce_sleep_ms,
        cfg.reduce_each_n,
        cfg.reduce_setup_sleep_ms,
        None,
    )
    return _finish(out, observation, "SLOW_INJECT_HITS")


def inject_heavy_key(
    df: DataFrame,
    key_col: str,
    cfg: ChaosConfig,
    observation: Observation | str | None = None,
) -> DataFrame:
    """F4: sleep whenever the configured hot key is reduced — creates the
    skew the reference demos with key ``the`` @5000 ms (run.sh:80-81)."""
    if not cfg.heavy_enabled:
        return df
    sleep_s = cfg.heavy_sleep_ms / 1000.0
    heavy = cfg.heavy_key
    schema_out = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema_out += f", {HITS_COL} bigint"
    cols = [f.name for f in df.schema.fields]

    def gen(iterator):
        for pdf in iterator:
            hits = int((pdf[key_col].astype(str) == heavy).sum())
            if hits:
                time.sleep(hits * sleep_s)
            pdf = pdf.assign(**{HITS_COL: 0})
            if hits:
                pdf.loc[pdf.index[:1], HITS_COL] = hits
            yield pdf

    out = df.mapInPandas(gen, schema=schema_out).select(*cols, HITS_COL)
    return _finish(out, observation, "SLOW_INJECT_HEAVY_KEY")
