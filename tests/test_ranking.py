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


def test_rrf_fuse_matches_hand_computation(spark):
    """RRF against a hand-computed fusion: a candidate in BOTH lists
    accumulates both reciprocal contributions; single-list candidates
    get one; ties break to the smaller candidate id."""
    from mapreduce_task_spark.operators.ranking import rrf_fuse

    lex = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q2", 20, 1)],
        ["query_id", "cand_id", "rank"],
    )
    ann = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 13, 2), ("q2", 21, 1), ("q2", 20, 2)],
        ["query_id", "cand_id", "rank"],
    )
    out = {
        (r["query_id"], r["cand_id"]): (r["n_lists"], r["rrf_micro"], r["rank"])
        for r in rrf_fuse([lex, ann], k=10, k0=60).collect()
    }

    c = lambda rank: int(1_000_000_000.0 // (60 + rank))
    import collections

    want = collections.defaultdict(lambda: [0, 0])
    for df_rows in (
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q2", 20, 1)],
        [("q1", 11, 1), ("q1", 13, 2), ("q2", 21, 1), ("q2", 20, 2)],
    ):
        for q, d, rk in df_rows:
            want[(q, d)][0] += 1
            want[(q, d)][1] += c(rk)
    assert set(out) == set(want)
    for key, (n, micro) in want.items():
        assert out[key][0] == n and out[key][1] == micro, key

    # cand 11 (in both lists) must outrank every single-list candidate
    ranks_q1 = {d: out[("q1", d)][2] for _, d in out if _ == "q1"}
    assert ranks_q1[11] == 1


def test_rrf_fuse_topk_and_tiebreak(spark):
    from mapreduce_task_spark.operators.ranking import rrf_fuse

    # identical fused scores -> smaller cand_id wins the rank
    a = spark.createDataFrame([("q", 5, 1), ("q", 3, 2)], ["query_id", "cand_id", "rank"])
    b = spark.createDataFrame([("q", 3, 1), ("q", 5, 2)], ["query_id", "cand_id", "rank"])
    rows = rrf_fuse([a, b], k=1).collect()
    assert len(rows) == 1 and rows[0]["cand_id"] == 3 and rows[0]["rank"] == 1


def test_bm25_index_reproduces_inline_topk(spark, sf_small, tmp_path):
    """bm25_build_index + bm25_search_index must reproduce bm25_topk
    bit-for-bit (shared bm25_term_micro expression, same corpus
    scalars including no-posting docs, same floor-before-sum and
    tie-break) — the build-once/search-many split for lexical
    retrieval, mirroring the IVF one."""
    from mapreduce_task_spark.operators.ranking import (
        bm25_build_index,
        bm25_search_index,
    )
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "bm25")
    bm25_build_index(docs, spark, path)

    want = [tuple(r) for r in bm25_topk(docs, spark, TERMS, k=25).collect()]
    got = [tuple(r) for r in bm25_search_index(spark, path, TERMS, k=25).collect()]
    assert got == want and len(got) > 0

    # search-many: a different query reuses the same index files
    got2 = [
        tuple(r) for r in bm25_search_index(spark, path, ["data", "the"], k=10).collect()
    ]
    want2 = [tuple(r) for r in bm25_topk(docs, spark, ["data", "the"], k=10).collect()]
    assert got2 == want2


def test_bm25_index_search_pushes_term_filter(spark, sf_small, tmp_path):
    """The search-cost claim plan-asserted: the postings scan must push
    the term IN (...) predicate into the parquet source (row-group
    skipping over the term-clustered layout), and must read only the
    posting columns."""
    from mapreduce_task_spark.operators.ranking import (
        bm25_build_index,
        bm25_search_index,
    )
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "bm25")
    bm25_build_index(docs, spark, path)

    res = bm25_search_index(spark, path, TERMS, k=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    pushed = [
        ln for ln in plan.splitlines()
        if "PushedFilters" in ln and "In(term, [" in ln
    ]
    assert pushed, "term IN predicate not pushed to the postings scan"
    assert "text" not in plan  # the corpus is never touched at search time


def test_bm25_search_index_filter_ids_prefilters_docs(spark, sf_small, tmp_path):
    """Filtered lexical search: the allow-list must equal post-filtering
    the exhaustive ranking of the same index with ranks renumbered —
    per-doc scores unchanged (corpus statistics stay frozen corpus-wide,
    the standard pre-filter semantics), every query fills its top-k
    from allowed docs, duplicates in the allow-list are harmless."""
    from pyspark.sql import functions as F

    from mapreduce_task_spark.operators.ranking import (
        bm25_build_index,
        bm25_search_index,
    )
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    allow = docs.select("doc_id").filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "bm25_filter")
    bm25_build_index(docs, spark, path)

    got = [
        (r["doc_id"], r["n_terms_hit"], r["score_micro"])
        for r in bm25_search_index(
            spark, path, TERMS, k=10, filter_ids=allow
        ).collect()
    ]
    full = bm25_search_index(spark, path, TERMS, k=n).collect()
    want = [
        (r["doc_id"], r["n_terms_hit"], r["score_micro"])
        for r in full
        if r["doc_id"] % 2 == 0
    ][:10]
    assert got == want and len(got) == 10
    assert all(d % 2 == 0 for d, _, _ in got)
    dup = [
        (r["doc_id"], r["n_terms_hit"], r["score_micro"])
        for r in bm25_search_index(
            spark, path, TERMS, k=10, filter_ids=allow.union(allow)
        ).collect()
    ]
    assert dup == got


def test_filtered_hybrid_retrieval_composes(spark, sf_small, tmp_path):
    """Filtered hybrid search composes from the filtered single-modality
    paths: BM25 and IVF lists both restricted to one allow-list fuse
    through rrf_fuse into a result containing ONLY allowed candidates —
    the quality-gated retrieval pattern (search only docs that passed
    the gate) needs no special-case fusion code."""
    from pyspark.sql import Window, functions as F

    from mapreduce_task_spark.operators.ranking import (
        bm25_build_index,
        bm25_search_index,
        rrf_fuse,
    )
    from mapreduce_task_spark.operators.similarity import (
        ivf_build_index,
        ivf_search_index,
    )
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    emb = load_table(spark, sf_small, "embeddings")
    allow_docs = docs.select("doc_id").filter(F.col("doc_id") % 2 == 0)
    allow_vecs = emb.select("vec_id").filter(F.col("vec_id") % 2 == 0)

    bpath = str(tmp_path / "bm25")
    bm25_build_index(docs, spark, bpath)
    lex = (
        bm25_search_index(spark, bpath, TERMS, k=10, filter_ids=allow_docs)
        .select(
            F.lit(0).alias("query_id"),
            F.col("doc_id").alias("cand_id"),
            F.row_number()
            .over(Window.orderBy(F.desc("score_micro"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    vpath = str(tmp_path / "ivf")
    ivf_build_index(emb, vpath, n_clusters=8, dim=64, rounds=1)
    queries = emb.filter(F.col("vec_id") == 0)
    ann = ivf_search_index(
        spark, vpath, queries, k=10, nprobe=2, filter_ids=allow_vecs
    ).select(F.lit(0).alias("query_id"), "cand_id", "rank")

    lex_ids = {r["cand_id"] for r in lex.collect()}
    ann_ids = {r["cand_id"] for r in ann.collect()}
    assert lex_ids and ann_ids  # both filtered modalities returned rows
    fused = rrf_fuse([lex, ann], k=10).collect()
    assert fused and all(r["cand_id"] % 2 == 0 for r in fused)
    # both modalities actually contribute rows to the fused list, and
    # nothing outside the two input lists appears
    fused_ids = {r["cand_id"] for r in fused}
    assert fused_ids <= lex_ids | ann_ids
    assert fused_ids & lex_ids and fused_ids & ann_ids
    assert {r["rank"] for r in fused} == set(range(1, len(fused) + 1))


def test_retrieval_metrics_hand_computed(spark):
    """MRR/recall/NDCG@k against a fully hand-computed fixture,
    including a query the run never retrieved (scores 0, drags the
    macro average down instead of shrinking the denominator)."""
    import math

    import pytest as _pytest

    from mapreduce_task_spark.operators.ranking import retrieval_metrics

    runs = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "d", 1), ("q2", "e", 2)],
        "query_id string, cand_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "b"), ("q1", "z"), ("q2", "d"), ("q3", "x")],
        "query_id string, cand_id string",
    )
    got = {r["query_id"]: r for r in retrieval_metrics(runs, qrels, k=3).collect()}
    assert set(got) == {"q1", "q2", "q3", "MACRO"}

    # q1: relevant b found at rank 2 (z missed); n_rel=2 <= k
    dcg1 = 1.0 / math.log2(3.0)
    idcg1 = 1.0 / math.log2(2.0) + 1.0 / math.log2(3.0)
    assert got["q1"]["mrr_at_k"] == _pytest.approx(0.5)
    assert got["q1"]["recall_at_k"] == _pytest.approx(0.5)
    assert got["q1"]["ndcg_at_k"] == _pytest.approx(dcg1 / idcg1)
    # q2: its one relevant at rank 1 — perfect
    for m in ("mrr_at_k", "recall_at_k", "ndcg_at_k"):
        assert got["q2"][m] == _pytest.approx(1.0), m
    # q3: never retrieved — all zeros
    for m in ("mrr_at_k", "recall_at_k", "ndcg_at_k"):
        assert got["q3"][m] == 0.0, m
    # macro = plain average over the three qrel queries
    assert got["MACRO"]["mrr_at_k"] == _pytest.approx((0.5 + 1.0 + 0.0) / 3)
    assert got["MACRO"]["recall_at_k"] == _pytest.approx((0.5 + 1.0 + 0.0) / 3)
    assert got["MACRO"]["ndcg_at_k"] == _pytest.approx(
        (dcg1 / idcg1 + 1.0 + 0.0) / 3
    )

    # n_rel > k: the ideal DCG (and recall denominator) truncate at k
    qrels_many = spark.createDataFrame(
        [("q2", c) for c in ("d", "e", "f", "g")],
        "query_id string, cand_id string",
    )
    r2 = {
        r["query_id"]: r
        for r in retrieval_metrics(runs, qrels_many, k=2).collect()
    }
    assert r2["q2"]["recall_at_k"] == _pytest.approx(1.0)  # 2 hits / min(4,2)
    idcg2 = 1.0 / math.log2(2.0) + 1.0 / math.log2(3.0)
    assert r2["q2"]["ndcg_at_k"] == _pytest.approx(1.0)  # dcg == idcg
    assert r2["q2"]["mrr_at_k"] == _pytest.approx(1.0)
    assert idcg2 > 0


def test_retrieval_metrics_on_search_stack(spark, sf_small):
    """Composed with a real search surface: grading brute-force top-k
    against its own top-1 as the relevance set must score a perfect
    MRR/recall/NDCG macro (the self-consistency anchor)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mapreduce_task_spark.operators.ranking import retrieval_metrics
    from mapreduce_task_spark.operators.similarity import brute_force_topk
    from mapreduce_task_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 8)
    run = brute_force_topk(emb, qids, k=5)
    qrels = run.filter(F.col("rank") == 1).select("query_id", "cand_id")
    macro = (
        retrieval_metrics(run, qrels, k=5)
        .filter(F.col("query_id") == "MACRO")
        .collect()[0]
    )
    for m in ("mrr_at_k", "recall_at_k", "ndcg_at_k"):
        assert macro[m] == _pytest.approx(1.0), m
