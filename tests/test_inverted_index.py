from pyspark.sql import Observation, Row

from mapreduce_task_spark.operators.inverted_index import inverted_index
from mapreduce_task_spark.sources.text import read_tab_pairs

from .fixtures import INSERTINDEX_GOLDEN, INSERTINDEX_LINES


def _lines_df(spark, lines):
    return spark.createDataFrame([Row(value=l) for l in lines])


def test_inverted_index_golden(spark):
    pairs = read_tab_pairs(spark, _lines_df(spark, INSERTINDEX_LINES))
    out = {r["word"]: r["doc_ids"] for r in inverted_index(pairs).collect()}
    assert out == INSERTINDEX_GOLDEN


def test_duplicate_pairs_dedupe(spark):
    pairs = read_tab_pairs(spark, _lines_df(spark, ["a\td1", "a\td1", "a\td2"]))
    out = inverted_index(pairs).collect()
    assert [(r["word"], r["doc_ids"], r["n_docs"]) for r in out] == [("a", "d1,d2", 2)]


def test_malformed_lines_dropped_and_counted(spark):
    # P6/P7: blank lines and lines without a tab are dropped + counted
    # (TraceInsertIndexMapper.java:102-115)
    lines = ["a\td1", "", "   ", "no-tab-here", "b\td2\textra"]
    obs = Observation("ii")
    pairs = read_tab_pairs(spark, _lines_df(spark, lines), observation=obs)
    rows = sorted((r["word"], r["doc_id"]) for r in pairs.collect())
    # split("\t", 2) keeps the remainder in the value, like Java split
    assert rows == [("a", "d1"), ("b", "d2\textra")]
    assert obs.get["MALFORMED_LINES"] == 3
    assert obs.get["RAW_LINES"] == 5
