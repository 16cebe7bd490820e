"""The three reference-job dataflows over the driver tables.

SURVEY.md §3 maps them onto the synthetic schema (FIXTURES.md):
wordcount/inverted_index -> ``documents``, sort -> ``lineitem`` string
projection.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..operators.inverted_index import inverted_index_from_text
from ..operators.sortops import global_rank
from ..operators.wordcount import wordcount
from ..functions.text import words
from ..registry import query, t

# Shared oracle fragment: normalized non-empty tokens of documents.text,
# exactly the reference tokenizer (split \s+, lower, strip [^a-z], drop '').
_TOKENS_SQL = """
  SELECT doc_id,
         regexp_replace(lower(unnest(regexp_split_to_array(text, '\\s+'))), '[^a-z]', '', 'g') AS word
  FROM documents
"""


@query(
    "wordcount",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_TOKENS_SQL})
    WHERE word <> ''
    GROUP BY word
    ORDER BY word
    """,
    doc="A1: tokenize documents.text, normalize, group-count (trace-wordcount-job).",
)
def q_wordcount(spark: SparkSession, sf_dir: str):
    return wordcount(t(spark, sf_dir, "documents"), text_col="text")


@query(
    "tokenize",
    oracle=f"""
    SELECT doc_id, word
    FROM ({_TOKENS_SQL})
    WHERE word <> ''
    """,
    doc="P1-P3: the mapper-side projection alone (explode/normalize/filter).",
)
def q_tokenize(spark: SparkSession, sf_dir: str):
    return words(t(spark, sf_dir, "documents"), text_col="text", keep=("doc_id",))


@query(
    "sort",
    oracle="""
    SELECT sort_key, row_number() OVER (ORDER BY sort_key) AS rk
    FROM (
      SELECT concat(l_returnflag, l_linestatus,
                    lpad(CAST(l_orderkey AS VARCHAR), 12, '0'),
                    lpad(CAST(l_linenumber AS VARCHAR), 2, '0')) AS sort_key
      FROM lineitem
    )
    """,
    doc=(
        "A3: total-order sort with materialized global position, computed "
        "scalably (range partition + per-partition rank + offsets), not a "
        "single-partition window (trace-sort-job)."
    ),
)
def q_sort(spark: SparkSession, sf_dir: str):
    li = t(spark, sf_dir, "lineitem").select(
        F.concat(
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
            F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
        ).alias("sort_key")
    )
    return global_rank(li, "sort_key", rank_col="rk")


@query(
    "inverted_index",
    oracle=f"""
    SELECT word,
           array_to_string(list_sort(list_distinct(list(CAST(doc_id AS VARCHAR)))), ',') AS doc_ids,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM ({_TOKENS_SQL})
    WHERE word <> ''
    GROUP BY word
    ORDER BY word
    """,
    doc="A2/A6: word -> sorted distinct doc-id list (trace-insertindex-job).",
)
def q_inverted_index(spark: SparkSession, sf_dir: str):
    return inverted_index_from_text(t(spark, sf_dir, "documents"))
