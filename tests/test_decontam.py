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


# ---------------------------------------------------------------------------
# split_leakage: near-dup leakage across the deterministic train/test split


def test_split_leakage_agrees_with_exhaustive_cross_pairs(spark, sf_small):
    """Every (test, train) pair the banded-LSH audit reports must also
    clear the EXHAUSTIVE cross-split exact-Jaccard bar, and the audit's
    per-doc dup counts must match the exhaustive counts restricted to
    LSH candidates' recall — verified the other way: every exhaustive
    pair whose signature collides in some band is found. On the
    sf0.001 corpus the planted near-dups are close enough (j >= 0.5
    with 16 hashes / 8 bands -> candidate probability ~0.90+ per pair)
    that the two agree exactly; a miss here means the band join or the
    split predicate drifted."""
    from mapreduce_task_spark.operators.dedup import all_pairs_jaccard, shingles
    from mapreduce_task_spark.operators.decontam import split_leakage
    from mapreduce_task_spark.operators.sampling import _BUCKETS, _bucket
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    got = {
        r["doc_id"]: r["n_train_dups"]
        for r in split_leakage(
            docs, test_fraction=0.3, salt="split", threshold=0.5
        ).collect()
    }

    # exhaustive oracle: all cross-split pairs at the same threshold
    thr = int(round(0.3 * _BUCKETS))
    sides = docs.select(
        "doc_id", (_bucket("doc_id", "split") < thr).alias("is_test")
    )
    pairs = all_pairs_jaccard(shingles(docs), min_jaccard=0.5)
    sym = pairs.unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "jaccard"
        )
    )
    crossed = (
        sym.join(sides.select(F.col("doc_id").alias("id_a"), "is_test"), "id_a")
        .filter(F.col("is_test"))
        .drop("is_test")
        .join(
            sides.select(F.col("doc_id").alias("id_b"), "is_test"), "id_b"
        )
        .filter(~F.col("is_test"))
    )
    want = {
        r["id_a"]: r["n"]
        for r in crossed.groupBy("id_a")
        .agg(F.count_distinct("id_b").alias("n"))
        .collect()
    }
    # LSH is a candidate filter: got ⊆ want always; equality holds on
    # this corpus because planted dups collide in >=1 of the 8 bands
    assert got == want and len(got) > 0


def test_split_leakage_total_on_empty_and_disjoint_input(spark):
    """Empty corpus -> empty audit; a corpus whose docs share nothing
    across the split -> empty audit (no false leaks)."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.decontam import split_leakage

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert split_leakage(empty).count() == 0

    # letter-only words: token normalization strips [^a-z], so digit
    # suffixes would collapse every doc to the same shingles
    def letters(n: int) -> str:
        return "".join(chr(ord("a") + int(d)) for d in str(n))

    distinct_docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=" ".join(f"w{letters(i)}x{letters(j)}" for j in range(12)),
            )
            for i in range(40)
        ]
    )
    assert split_leakage(distinct_docs, test_fraction=0.5).count() == 0


def _py_bucket(doc_id: int, salt: str = "split") -> int:
    """Python twin of sampling._bucket: md5-ppm over 'salt:id'."""
    import hashlib

    h = int(hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16)
    return h % 1_000_000


def _py_shingles(text: str, k: int = 3) -> set:
    import re as _re

    toks = [
        t
        for t in (
            _re.sub("[^a-z]", "", w.lower())
            for w in _re.split(r"\s+", text, flags=_re.ASCII)
        )
        if t
    ]
    return {
        " ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))
    }


def test_split_leakage_sound_and_complete_on_planted_duplicates(spark):
    """Soundness: every reported test doc has, per a pure-Python
    reference, at least one TRAIN doc with exact shingle-Jaccard >=
    threshold (the audit never invents leaks, never reports a
    train-side or within-split doc). Completeness for true duplicates:
    an EXACT copy shares the full signature, so it collides in every
    band — whenever an (original, copy) pair straddles the split, the
    test-side member MUST be reported. Uses planted exact dups over
    letter-only words (token normalization strips digits)."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.decontam import split_leakage

    def letters(n: int) -> str:
        return "".join(chr(ord("a") + int(d)) for d in str(n))

    texts = {}
    rows = []
    for i in range(30):
        base = " ".join(f"q{letters(i)}z{letters(j)}" for j in range(10))
        texts[i] = base
        texts[100 + i] = base  # exact duplicate under a different id
        rows.append(Row(doc_id=i, text=base))
        rows.append(Row(doc_id=100 + i, text=base))
    docs = spark.createDataFrame(rows)

    frac, thr_j = 0.5, 0.5
    got = {
        r["doc_id"]: r["n_train_dups"]
        for r in split_leakage(
            docs, test_fraction=frac, salt="split", threshold=thr_j
        ).collect()
    }

    cut = int(round(frac * 1_000_000))
    is_test = {d: _py_bucket(d) < cut for d in texts}
    sh = {d: _py_shingles(t) for d, t in texts.items()}

    def jac(a, b):
        inter = len(sh[a] & sh[b])
        u = len(sh[a] | sh[b])
        return inter / u if u else 0.0

    # soundness: every reported doc is test-side with a real train dup
    for d in got:
        assert is_test[d], f"{d} reported but not test-side"
        mates = [
            o
            for o in texts
            if o != d and not is_test[o] and jac(d, o) >= thr_j
        ]
        assert mates, f"{d} reported with no qualifying train mate"
        assert got[d] <= len(mates)

    # completeness on exact dups: straddling (i, 100+i) must be caught
    expected_caught = {
        (a if is_test[a] else b)
        for a, b in ((i, 100 + i) for i in range(30))
        if is_test[a] != is_test[b]
    }
    assert expected_caught, "fixture degenerate: no pair straddles the split"
    missing = expected_caught - set(got)
    assert not missing, f"exact dups across the split not reported: {missing}"


def test_split_leakage_drop_then_reaudit_is_clean(spark, sf_small):
    """The audit-then-act loop closes: anti-join the reported test docs
    out of the corpus and re-run the audit — zero leaks remain. (Only
    TEST-side docs are dropped, so the train side — and therefore the
    training corpus — is untouched; this is the consumer contract the
    operator's output shape exists for.)"""
    from mapreduce_task_spark.operators.decontam import split_leakage
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    kw = dict(test_fraction=0.3, salt="split", threshold=0.5)
    leaked = split_leakage(docs, **kw).select("doc_id")
    assert leaked.count() > 0  # fixture must actually exercise the loop
    cleaned = docs.join(leaked, "doc_id", "left_anti")
    assert split_leakage(cleaned, **kw).count() == 0
