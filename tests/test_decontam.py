"""N-gram benchmark decontamination: planted-contamination recovery."""

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.decontam import contaminated_ids, decontaminate

BENCH_SENTENCE = "the quick brown fox jumps over the lazy sleeping dog tonight"


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            # doc 0 embeds the full benchmark sentence mid-text
            Row(doc_id=0, text="intro words here " + BENCH_SENTENCE + " outro words"),
            # doc 1 shares only a 4-word prefix (< n) — clean
            Row(doc_id=1, text="the quick brown fox went home early and slept well"),
            # doc 2 totally unrelated
            Row(doc_id=2, text="completely different content about spark engines"),
            # doc 3 contains the sentence with different CASE/punct
            # (normalization must still catch it)
            Row(doc_id=3, text="The QUICK, brown fox JUMPS over the lazy sleeping dog tonight!"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(text=BENCH_SENTENCE), Row(text="another benchmark prompt nobody copied")]
    )
    return docs, bench


def test_planted_contamination_flagged_exactly(spark):
    docs, bench = _fixture(spark)
    bad = sorted(r["doc_id"] for r in contaminated_ids(docs, bench, n=8).collect())
    assert bad == [0, 3]  # full-sentence carriers only, case/punct-insensitive
    clean = sorted(r["doc_id"] for r in decontaminate(docs, bench, n=8).collect())
    assert clean == [1, 2]


def test_short_overlap_not_flagged_and_threshold_dials(spark):
    docs, bench = _fixture(spark)
    # at n=4 the shared 4-gram prefix of doc 1 becomes contamination
    bad4 = sorted(r["doc_id"] for r in contaminated_ids(docs, bench, n=4).collect())
    assert bad4 == [0, 1, 3]
    # shuffle-join variant agrees with the broadcast one
    bad_shuffle = sorted(
        r["doc_id"]
        for r in contaminated_ids(docs, bench, n=8, broadcast_bench=False).collect()
    )
    assert bad_shuffle == [0, 3]


def test_corpus_side_check_is_broadcast_semi_join(spark):
    """The 100 TB contract: the corpus side must NOT shuffle — the
    benchmark shingle set broadcasts into a map-side semi-join."""
    docs, bench = _fixture(spark)
    plan = (
        contaminated_ids(docs, bench, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_semantic_contamination_matches_numpy_oracle(spark, sf_small):
    """The semantic rung flags exactly the docs a numpy float-cosine
    replay flags (the quantized-integer arithmetic agrees with float
    cosine far from the threshold; the planted copies sit at 1.0),
    NULL embeddings are never flagged, and the corpus-side plan is a
    broadcast nested-loop with no corpus shuffle."""
    import numpy as np

    from mapreduce_task_spark.operators.decontam import (
        decontaminate_semantic,
        semantic_contaminated_ids,
    )
    from mapreduce_task_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    # benchmark = exact copies of three corpus vectors (leaked eval
    # items), plus one NULL row the guard must skip
    bench = emb.filter(F.col("vec_id").isin(10, 20, 30)).select(
        "embedding"
    ).unionByName(
        spark.createDataFrame([(None,)], "embedding array<float>")
    )
    t = 0.98
    flagged = {
        r["vec_id"]
        for r in semantic_contaminated_ids(
            emb, bench, threshold=t, id_col="vec_id"
        ).collect()
    }
    assert {10, 20, 30} <= flagged

    # numpy replay over the full corpus x bench grid
    rows = emb.collect()
    bvecs = [
        np.array(r["embedding"], dtype=np.float64)
        for r in bench.collect()
        if r["embedding"] is not None
    ]

    def q(v):
        return np.floor(np.array(v, dtype=np.float64) * 1e6)

    want = set()
    for r in rows:
        if r["embedding"] is None:
            continue
        dv = q(r["embedding"])
        nd = dv @ dv
        if nd == 0:
            continue
        for b in bvecs:
            qb = q(b)
            nb = qb @ qb
            if nb > 0 and (dv @ qb) / (np.sqrt(nd) * np.sqrt(nb)) >= t:
                want.add(r["vec_id"])
                break
    assert flagged == want

    clean = decontaminate_semantic(emb, bench, threshold=t, id_col="vec_id")
    assert {r["vec_id"] for r in clean.collect()} == {
        r["vec_id"] for r in rows
    } - flagged

    plan = (
        semantic_contaminated_ids(emb, bench, threshold=t, id_col="vec_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "rangepartitioning" not in plan


def test_semantic_decontam_total_on_empty_sides(spark, sf_small):
    """Totality: an EMPTY benchmark flags nothing (decontamination is a
    no-op, not an error), and an empty corpus survives the scan."""
    from mapreduce_task_spark.operators.decontam import (
        decontaminate_semantic,
        semantic_contaminated_ids,
    )
    from mapreduce_task_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    no_bench = emb.select("embedding").limit(0)
    assert semantic_contaminated_ids(emb, no_bench, id_col="vec_id").count() == 0
    assert (
        decontaminate_semantic(emb, no_bench, id_col="vec_id").count()
        == emb.count()
    )
    empty_corpus = emb.limit(0)
    assert (
        semantic_contaminated_ids(
            empty_corpus, emb.select("embedding").limit(3), id_col="vec_id"
        ).count()
        == 0
    )
