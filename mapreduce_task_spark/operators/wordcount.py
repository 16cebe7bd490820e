"""WordCount — the reference's trace-wordcount-job re-expressed in Spark.

Reference semantics (SURVEY.md §2.2 P1-P4, §2.3 A1/A4):
- tokenize each line on ``\\s+``  (TraceWordCountMapper.java:108-109)
- lowercase + strip ``[^a-z]``    (TraceWordCountMapper.java:110)
- drop empty tokens               (TraceWordCountMapper.java:111)
- per-word sum of 1s              (TraceWordCountReducer.java:115-117)
- output sorted by word within a partition (MR shuffle contract A4)

Spark plan: FileScan(text col only, pruned) -> Project(explode/split)
-> Filter -> partial HashAggregate -> Exchange hashpartitioning(word)
-> final HashAggregate. Catalyst's partial aggregation is the combiner
the reference never installed (TraceWordCountJob.java:112 sets none),
so the shuffle carries one row per (partition, word) instead of one per
token — strictly less data at any scale. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import words


def wordcount(
    df: DataFrame,
    text_col: str = "text",
    word_col: str = "word",
    count_col: str = "cnt",
    sort: bool = True,
) -> DataFrame:
    """word -> count over a text column.

    ``sort=True`` reproduces the reference's sorted-by-key output (A4);
    at scale the sort is a range-partition exchange — skip it when the
    consumer doesn't need ordered output.
    """
    out = (
        words(df, text_col=text_col)
        .groupBy(F.col("word").alias(word_col))
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return out.orderBy(word_col) if sort else out
