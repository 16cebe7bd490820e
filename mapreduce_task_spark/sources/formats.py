"""Structured source/sink format breadth: CSV, JSON-lines, ORC.

Production discipline baked in (the points that matter at 100 TB):

- **Schema-on-read, always.** ``inferSchema``/sampled JSON inference
  scans the data once before the real job — readers here REQUIRE an
  explicit schema. (Parquet/ORC carry their own schema.)
- **Malformed-record accounting** (the structured-format face of the
  reference's P7 malformed-line counters, SURVEY §2.4 O5): CSV/JSON
  read in PERMISSIVE mode with a ``_corrupt_record`` column; the
  ``observe`` metric MALFORMED_RECORDS counts them executor-side with
  no extra action, and the parsed output drops them.
- **Splittable where the format allows.** ORC/parquet split by stripe/
  row-group; uncompressed or bzip2 CSV/JSON split by byte range; gzip
  does NOT split (one task per file — the classic ingest bottleneck),
  so sinks default to uncompressed CSV/JSON parts sized by upstream
  partitioning.
- Timestamps are written/parsed with an explicit UTC-stable format so
  CSV round-trips are value-exact under the session's pinned UTC zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_CORRUPT = "_corrupt_record"


def _schema_with_corrupt(schema: str):
    from pyspark.sql.types import StringType, StructType

    st = (
        StructType.fromDDL(schema)
        if isinstance(schema, str)
        else schema
    )
    if _CORRUPT not in st.fieldNames():
        st = st.add(_CORRUPT, StringType())
    return st


def _drop_malformed(df: DataFrame, observation: Observation | None) -> DataFrame:
    bad = F.col(_CORRUPT).isNotNull()
    if observation is not None:
        df = df.observe(
            observation,
            F.sum(bad.cast("long")).alias("MALFORMED_RECORDS"),
            F.count(F.lit(1)).alias("RAW_RECORDS"),
        )
    return df.filter(~bad).drop(_CORRUPT)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    observation: Observation | None = None,
    **options,
) -> DataFrame:
    """CSV with explicit schema, header, and corrupt-record counting."""
    reader = (
        spark.read.schema(_schema_with_corrupt(schema))
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampNTZFormat", _TS_FMT)
        .option("timestampFormat", _TS_FMT)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _drop_malformed(reader.csv(path), observation)


def write_csv(df: DataFrame, path: str, num_files: int | None = None) -> None:
    if num_files:
        df = df.repartition(num_files)
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampNTZFormat", _TS_FMT)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    observation: Observation | None = None,
    **options,
) -> DataFrame:
    """JSON-lines with explicit schema and corrupt-record counting."""
    reader = (
        spark.read.schema(_schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampNTZFormat", _TS_FMT)
        .option("timestampFormat", _TS_FMT)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _drop_malformed(reader.json(path), observation)


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    if num_files:
        df = df.repartition(num_files)
    (
        df.write.mode("overwrite")
        .option("timestampNTZFormat", _TS_FMT)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (schema self-describing; filters/column pruning push
    into the stripe reader exactly like parquet — plan-asserted in
    tests)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, num_files: int | None = None) -> None:
    if num_files:
        df = df.repartition(num_files)
    df.write.mode("overwrite").orc(path)
