import time

from pyspark.sql import Observation, Row

from mapreduce_task_spark.chaos.inject import (
    ChaosConfig,
    inject_heavy_key,
    inject_map_chaos,
    inject_reduce_chaos,
)
from mapreduce_task_spark.operators.wordcount import wordcount

from .fixtures import WORDCOUNT_LINES


def _docs(spark):
    return spark.createDataFrame([Row(text=l) for l in WORDCOUNT_LINES])


def test_disabled_config_is_identity(spark):
    df = _docs(spark)
    cfg = ChaosConfig.from_conf({})
    assert inject_map_chaos(df, cfg) is df
    assert inject_reduce_chaos(df, cfg) is df
    assert inject_heavy_key(df, "text", cfg) is df


def test_map_chaos_preserves_results_and_counts_hits(spark):
    df = _docs(spark).repartition(2)
    baseline = {(r["word"], r["cnt"]) for r in wordcount(df).collect()}
    cfg = ChaosConfig.from_conf(
        {
            "insertindex.slow.map.partitions": "0,1",
            "insertindex.slow.map.sleep.ms": "50",
            "insertindex.slow.map.eachN": "3",
        }
    )
    obs = Observation("chaos_map")
    slowed = inject_map_chaos(df, cfg, observation=obs)
    t0 = time.perf_counter()
    got = {(r["word"], r["cnt"]) for r in wordcount(slowed).collect()}
    elapsed = time.perf_counter() - t0
    assert got == baseline  # F-invariant: chaos changes timing, not results
    assert obs.get["SLOW_INJECT_MAP_HITS"] >= 3  # 9 lines / eachN=3 across parts
    assert elapsed >= 0.1


def test_reduce_chaos_with_setup_sleep(spark):
    wc = wordcount(_docs(spark), sort=False)
    baseline = {(r["word"], r["cnt"]) for r in wc.collect()}
    cfg = ChaosConfig.from_conf(
        {
            "insertindex.slow.reduce.partitions": "0,1,2,3,4,5,6,7",
            "insertindex.slow.reduce.sleep.ms": "10",
            "insertindex.slow.reduce.eachN": "5",
            "insertindex.slow.reduce.setup.sleep.ms": "20",
        }
    )
    obs = Observation("chaos_reduce")
    got = {
        (r["word"], r["cnt"])
        for r in inject_reduce_chaos(wc, cfg, observation=obs).collect()
    }
    assert got == baseline
    assert obs.get["SLOW_INJECT_HITS"] >= 1


def test_heavy_key_skew(spark):
    wc = wordcount(_docs(spark), sort=False)
    baseline = {(r["word"], r["cnt"]) for r in wc.collect()}
    cfg = ChaosConfig.from_conf(
        {
            "insertindex.slow.reduce.heavy.key": "the",
            "insertindex.slow.reduce.heavy.sleep.ms": "150",
        }
    )
    obs = Observation("chaos_heavy")
    t0 = time.perf_counter()
    got = {
        (r["word"], r["cnt"])
        for r in inject_heavy_key(wc, "word", cfg, observation=obs).collect()
    }
    elapsed = time.perf_counter() - t0
    assert got == baseline
    assert obs.get["SLOW_INJECT_HEAVY_KEY"] == 1  # 'the' is one group row
    assert elapsed >= 0.15


def test_input_path_contains_gate(spark, tmp_path):
    p = tmp_path / "slowfile"
    p.mkdir()
    (p / "data.txt").write_text("\n".join(WORDCOUNT_LINES))
    df = spark.read.text(str(p))
    cfg = ChaosConfig.from_conf(
        {
            "insertindex.slow.map.input.contains": "slowfile",
            "insertindex.slow.map.sleep.ms": "30",
            "insertindex.slow.map.eachN": "9",
        }
    )
    obs = Observation("chaos_file")
    out = inject_map_chaos(df, cfg, observation=obs)
    assert out.count() == len(WORDCOUNT_LINES)
    assert obs.get["SLOW_INJECT_MAP_HITS"] >= 1


def test_funnel_invariant_under_map_chaos(spark, sf_small):
    """F1 straggler injection upstream of the funnel changes timing,
    never conversion counts — the result-invariance contract extended
    to the round-4 analytics surface."""
    from mapreduce_task_spark.operators.relational import funnel_counts
    from mapreduce_task_spark.sources.tables import load_table

    steps = ["view", "click", "purchase"]
    ev = load_table(spark, sf_small, "events")
    baseline = {
        (r["step_idx"], r["n_keys"]) for r in funnel_counts(ev, steps).collect()
    }
    cfg = ChaosConfig.from_conf(
        {
            "insertindex.slow.map.partitions": "0",
            "insertindex.slow.map.sleep.ms": "20",
            "insertindex.slow.map.eachN": "500",
        }
    )
    obs = Observation("chaos_funnel")
    slowed = inject_map_chaos(ev, cfg, observation=obs)
    got = {
        (r["step_idx"], r["n_keys"])
        for r in funnel_counts(slowed, steps).collect()
    }
    assert got == baseline and len(got) == 3
    assert obs.get["SLOW_INJECT_MAP_HITS"] >= 1
