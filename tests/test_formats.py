"""CSV / JSON-lines / ORC source+sink round-trips, malformed-record
accounting, and pushdown parity with parquet."""

import pytest
from pyspark.sql import Observation

from mapreduce_task_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)
from mapreduce_task_spark.sources.tables import load_table

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _events(spark, sf_small):
    return load_table(spark, sf_small, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_round_trip_value_exact(spark, sf_small, tmp_path):
    src = _events(spark, sf_small)
    p = str(tmp_path / "ev_csv")
    write_csv(src, p, num_files=3)
    back = read_csv(spark, p, _EVENTS_SCHEMA)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_jsonl_round_trip_value_exact(spark, sf_small, tmp_path):
    src = _events(spark, sf_small)
    p = str(tmp_path / "ev_json")
    write_jsonl(src, p, num_files=3)
    back = read_jsonl(spark, p, _EVENTS_SCHEMA)
    assert _rows(back.select(*src.columns)) == _rows(src)


def test_orc_round_trip_value_exact(spark, sf_small, tmp_path):
    src = _events(spark, sf_small)
    p = str(tmp_path / "ev_orc")
    write_orc(src, p, num_files=3)
    back = read_orc(spark, p)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_csv_malformed_records_counted_and_dropped(spark, tmp_path):
    p = str(tmp_path / "bad_csv")
    lines = [
        "a,b",          # header
        "1,x",          # ok
        "notanint,y",   # malformed: a is bigint
        "2,z",          # ok
    ]
    (tmp_path / "bad_csv").mkdir()
    (tmp_path / "bad_csv" / "part-0.csv").write_text("\n".join(lines) + "\n")
    obs = Observation("csv_obs")
    got = read_csv(spark, p, "a bigint, b string", observation=obs).collect()
    assert sorted((r["a"], r["b"]) for r in got) == [(1, "x"), (2, "z")]
    assert obs.get["MALFORMED_RECORDS"] == 1
    assert obs.get["RAW_RECORDS"] == 3


def test_jsonl_malformed_records_counted_and_dropped(spark, tmp_path):
    p = str(tmp_path / "bad_json")
    lines = ['{"a": 1, "b": "x"}', "{not json at all", '{"a": 2, "b": "y"}']
    (tmp_path / "bad_json").mkdir()
    (tmp_path / "bad_json" / "part-0.json").write_text("\n".join(lines) + "\n")
    obs = Observation("json_obs")
    got = read_jsonl(spark, p, "a bigint, b string", observation=obs).collect()
    assert sorted((r["a"], r["b"]) for r in got) == [(1, "x"), (2, "y")]
    assert obs.get["MALFORMED_RECORDS"] == 1
    assert obs.get["RAW_RECORDS"] == 3


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_small, tmp_path):
    src = _events(spark, sf_small)
    p = str(tmp_path / "push_orc")
    write_orc(src, p)
    q = (
        read_orc(spark, p)
        .filter("event_type = 'click'")
        .select("event_id", "event_type")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "event_type" in plan.split("PushedFilters")[1][:120]
    read_schema = plan.split("ReadSchema")[1][:160]
    assert "event_id" in read_schema and "user_id" not in read_schema


def test_csv_reader_requires_schema(spark, tmp_path):
    with pytest.raises(TypeError):
        read_csv(spark, str(tmp_path))  # no schema -> hard error


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on the lake path: a later batch adds a column;
    mergeSchema reads the union schema with nulls for early files, and
    the default read (no merge) still serves the footer-sampled schema
    — the operational contract for additive evolution at 100 TB (no
    rewrite of historical files)."""
    from pyspark.sql import Row, functions as F

    d = str(tmp_path / "evolve")
    spark.createDataFrame(
        [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta")]
    ).write.mode("append").parquet(d)
    spark.createDataFrame(
        [Row(doc_id=3, text="gamma", lang="en")]
    ).write.mode("append").parquet(d)

    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}
    # filters on the evolved column behave (null-safe)
    assert merged.filter(F.col("lang").isNull()).count() == 2
