"""Composed corpus-cleaning pipeline semantics."""

from pyspark.sql import Row

from mapreduce_task_spark.queries.pipeline_e2e import (
    q_embedding_norms,
    q_pipeline_clean_corpus,
)


def test_clean_corpus_drops_dups_keeps_lowest_id(spark, sf_small):
    out = q_pipeline_clean_corpus(spark, sf_small)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    assert len(ids) == len(rows)  # one row per surviving doc
    assert all(r["quality_score"] >= 0.45 for r in rows)
    # sf0.001 documents: 500 docs, 28 verified dup pairs -> some id_b docs removed
    assert 400 < len(rows) < 500


def test_embedding_norms_positive_and_bounded(spark, sf_small):
    rows = q_embedding_norms(spark, sf_small).collect()
    assert len(rows) == 500
    assert all(0.0 < r["qnorm"] < 100.0 for r in rows)
