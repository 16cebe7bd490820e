from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.wordcount import wordcount
from mapreduce_task_spark.functions.text import words

from .fixtures import WORDCOUNT_GOLDEN_SPOT, WORDCOUNT_LINES, WORDCOUNT_TOTAL_TOKENS


def _lines_df(spark, lines, col="text"):
    return spark.createDataFrame([Row(**{col: l}) for l in lines])


def test_wordcount_golden(spark):
    out = wordcount(_lines_df(spark, WORDCOUNT_LINES)).collect()
    counts = {r["word"]: r["cnt"] for r in out}
    for w, c in WORDCOUNT_GOLDEN_SPOT.items():
        assert counts[w] == c, (w, counts.get(w))
    assert sum(counts.values()) == WORDCOUNT_TOTAL_TOKENS
    # output sorted by word (A4 parity)
    ws = [r["word"] for r in out]
    assert ws == sorted(ws)
    # normalization killed all non-letters
    assert all(w.isalpha() and w == w.lower() for w in ws)


def test_tokenizer_edge_cases(spark):
    df = _lines_df(spark, ["Don't stop 123 αβγ 中文 mornin9's  A-B"])
    toks = [r["word"] for r in words(df).collect()]
    # digits/unicode-only tokens vanish; mixed tokens keep letters only
    assert toks == ["dont", "stop", "mornins", "ab"]


def test_wordcount_empty_input(spark):
    df = _lines_df(spark, [""]).filter(F.col("text") != "")
    assert wordcount(df).count() == 0
