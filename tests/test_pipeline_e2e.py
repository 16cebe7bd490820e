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


def test_clean_corpus_by_components_matches_union_find(spark, sf_small):
    """Component-based cleaning must keep exactly the min-id
    representative of every connected component of the verified pair
    graph (union-find replay over the same pairs), and all isolated
    docs."""
    from mapreduce_task_spark.operators.dedup import (
        jaccard_verify,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature,
        shingles,
    )
    from mapreduce_task_spark.queries.pipeline_e2e import clean_corpus_by_components
    from mapreduce_task_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    sh = shingles(docs)
    pairs = [
        (r["id_a"], r["id_b"])
        for r in jaccard_verify(
            lsh_candidate_pairs(lsh_bands(minhash_signature(sh))), sh
        )
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    ]
    assert pairs  # the fixture plants near-dups

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {v for v in parent if find(v) != v}

    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    expected = all_ids - drop
    got = {r["doc_id"] for r in clean_corpus_by_components(docs).collect()}
    assert got == expected


def test_corpus_report_composes_engine_pieces(spark, sf_small):
    from mapreduce_task_spark.queries.pipeline_e2e import corpus_report
    from mapreduce_task_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    rows = {(r["metric"], r["key"]): r["value"] for r in corpus_report(docs).collect()}
    # constraint gate: clean synthetic table passes at 1.0
    for col in ("doc_id", "text", "lang"):
        assert rows[("check:completeness", col)] == 1.0
    assert rows[("check:uniqueness", "doc_id")] == 1.0
    # exact-dup rate matches an independent computation
    n = docs.count()
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert abs(rows[("exact_dup_rate", "text")] - (1.0 - n_distinct / n)) < 1e-12
    # language mix sums to the doc count
    langs = {k: v for (m, k), v in rows.items() if m == "lang_docs"}
    assert sum(langs.values()) == n and len(langs) >= 1
    assert rows[("total_ws_tokens", "text")] > 0
