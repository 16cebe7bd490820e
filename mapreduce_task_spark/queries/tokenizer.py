"""Tokenizer-training driver query — BPE merges driver-verified.

``operators/bpe.py`` was pytest-only through round 7 (r6/r7 verdict
item #1): the merge loop is iterative, but — exactly like the PageRank
unroll in ``graph_analytics`` (queries/graph_analytics.py) — a FIXED
round count lets the oracle replay every round as a CTE chain:
pair-count, argmax, merge-fold.

The non-obvious SQL piece is the merge fold. Spark folds the symbol
array with ``F.aggregate`` (operators/bpe.py:_merge_fold); DuckDB's
``list_reduce`` constrains the accumulator to the element type, so the
oracle encodes the accumulator symbol LIST as a chr(31)-joined STRING:
merging (a, b) when the accumulator ends with element ``a`` and the
next element is ``b`` is just ``acc || b`` (the separator before ``a``
stays, ``a``'s text is the merged token's prefix), otherwise
``acc || sep || b``. chr(31) can never occur inside a symbol — words
are normalized to [a-z]+ (functions/text.py) — so ``ends_with(acc,
sep || a)`` tests exactly "last element == a". Left-to-right greedy
run semantics ('aaaa' + (a,a) -> aa,aa) fall out of the fold order on
both engines.

Integer counts and lexicographic (count DESC, a, b) tie-breaks make
every round's argmax engine-independent — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.bpe import _merge_fold, bpe_train, word_freq_table
from ..registry import query, t

_N_MERGES = 6


def _round_ctes(i: int) -> str:
    p = f"wf{i - 1}"
    return f"""
pc{i} AS (SELECT p.a AS a, p.b AS b, CAST(sum(cnt) AS BIGINT) AS n
          FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
                       j -> struct_pack(a := syms[j], b := syms[j+1]))) AS p
                FROM {p}) GROUP BY p.a, p.b),
m{i} AS (SELECT a, b, n FROM pc{i} ORDER BY n DESC, a, b LIMIT 1),
wf{i} AS (SELECT word, cnt,
            string_split(list_reduce(syms, (acc, x) ->
              CASE WHEN x = m.b AND (acc = m.a OR ends_with(acc, chr(31) || m.a))
                   THEN acc || x ELSE acc || chr(31) || x END), chr(31)) AS syms
          FROM {p} CROSS JOIN m{i} m)"""


_MERGE_LEGS = " UNION ALL ".join(
    f"SELECT {i} AS i, a, b, n FROM m{i}" for i in range(1, _N_MERGES + 1)
)


@query(
    "bpe",
    oracle=f"""
WITH toks AS (
  SELECT regexp_replace(lower(unnest(regexp_split_to_array(text, '\\s+'))),
                        '[^a-z]', '', 'g') AS word
  FROM documents),
wf0 AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt, split(word, '') AS syms
        FROM toks WHERE word <> '' GROUP BY word),
{",".join(_round_ctes(i) for i in range(1, _N_MERGES + 1))}
SELECT 'merge' AS leg, CAST(i AS INT) AS round, a, b, n,
       CAST(NULL AS VARCHAR) AS word, CAST(NULL AS BIGINT) AS cnt,
       CAST(NULL AS VARCHAR) AS pieces
FROM ({_MERGE_LEGS})
UNION ALL
SELECT 'vocab' AS leg, CAST(NULL AS INT) AS round,
       CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b,
       CAST(NULL AS BIGINT) AS n, word, cnt,
       array_to_string(syms, ' ') AS pieces
FROM wf{_N_MERGES}
""",
    doc="BPE tokenizer training driver-verified (operators/bpe.py, "
    "pytest-only r4-r7). merge leg: the ordered training log — round, "
    f"merged pair, weighted corpus count — for {_N_MERGES} merges, each "
    "round ONE vocabulary-sized pair-count shuffle plus a 1-row argmax "
    "collect (the documented iterative exception, same shape as the "
    "connected-components fixpoint). vocab leg: the final word table "
    "segmented by replaying all merges as chained fold expressions "
    "(space-joined for a hashable column). Scale: rounds touch the "
    "word-frequency table (|vocab|, not |corpus|), persisted with a "
    "per-round swap; pair counts reduce map-side; driver traffic is "
    "one row per round. The oracle unrolls the same rounds as CTEs "
    "with the merge fold replayed via a chr(31)-encoded list_reduce "
    "(see module docstring) — integer counts and (n DESC, a, b) "
    "tie-breaks make every round bit-replayable.",
)
def q_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=_N_MERGES, with_counts=True)

    merge_schema = StructType(
        [
            StructField("round", IntegerType()),
            StructField("a", StringType()),
            StructField("b", StringType()),
            StructField("n", LongType()),
        ]
    )
    merge_leg = spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)], merge_schema
    )

    syms = F.col("syms")
    for a, b, _n in merges:
        syms = _merge_fold(syms, a, b)
    vocab_leg = word_freq_table(docs).select(
        "word", "cnt", F.array_join(syms, " ").alias("pieces")
    )

    nul_s = F.lit(None).cast("string")
    return merge_leg.select(
        F.lit("merge").alias("leg"), "round", "a", "b", "n",
        nul_s.alias("word"), F.lit(None).cast("long").alias("cnt"),
        nul_s.alias("pieces"),
    ).unionByName(
        vocab_leg.select(
            F.lit("vocab").alias("leg"),
            F.lit(None).cast("int").alias("round"),
            nul_s.alias("a"), nul_s.alias("b"),
            F.lit(None).cast("long").alias("n"),
            "word", "cnt", "pieces",
        )
    )
