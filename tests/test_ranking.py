"""operators.ranking: term frequencies + BM25 top-k vs a python replay."""

import math

from pyspark.sql import Row

from mapreduce_task_spark.operators.ranking import (
    B,
    K1,
    bm25_topk,
    term_frequencies,
)
from mapreduce_task_spark.sources.tables import load_table

TERMS = ["spark", "join", "query"]


def test_term_frequencies_counts_and_omits_zero_rows(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark join spark"),
            Row(doc_id=1, text="nothing relevant here"),
            Row(doc_id=2, text="query"),
        ]
    )
    tf = {
        (r.doc_id, r.term): (r.tf, r.dl)
        for r in term_frequencies(docs, spark, TERMS).collect()
    }
    assert tf == {
        (0, "spark"): (2, 3),
        (0, "join"): (1, 3),
        (2, "query"): (1, 1),
    }


def _python_bm25(rows, terms, k):
    """Independent replay: same formula, same flooring discipline."""
    toks = {d: t.split(" ") for d, t in rows}
    dls = {d: len(t) for d, t in toks.items()}
    n_docs = float(len(rows))
    avgdl = float(sum(dls.values())) / n_docs
    tf = {
        (d, term): toks[d].count(term)
        for d in toks
        for term in terms
        if toks[d].count(term) > 0
    }
    dfreq = {
        term: float(sum(1 for (d, t2) in tf if t2 == term)) for term in terms
    }
    scores = {}
    hits = {}
    for (d, term), f in tf.items():
        idf = (n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5)
        s = idf * (
            (float(f) * (K1 + 1.0))
            / (float(f) + K1 * ((1.0 - B) + B * (float(dls[d]) / avgdl)))
        )
        scores[d] = scores.get(d, 0) + math.floor(s * 1_000_000.0)
        hits[d] = hits.get(d, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {d: (hits[d], s) for d, s in ranked}


def test_bm25_matches_python_replay_on_real_docs(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    got = {
        r.doc_id: (r.n_terms_hit, r.score_micro)
        for r in bm25_topk(docs, spark, TERMS, k=25).collect()
    }
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    want = _python_bm25(rows, TERMS, k=25)
    assert got == want


def test_bm25_ranking_is_deterministic_and_bounded(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    a = [tuple(r) for r in bm25_topk(docs, spark, TERMS, k=10).collect()]
    b = [tuple(r) for r in bm25_topk(docs, spark, TERMS, k=10).collect()]
    assert a == b and len(a) == 10
    # scores are non-increasing in rank order
    micros = [s for (_, _, s) in a]
    assert micros == sorted(micros, reverse=True)
