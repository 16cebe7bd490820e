"""Text-analysis operator semantics on micro-data."""

from pyspark.sql import Row

from mapreduce_task_spark.operators.dedup import shingles
from mapreduce_task_spark.operators.textstats import (
    fingerprints,
    language_id,
    quality_features,
    token_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_quality_features_values(spark):
    r = quality_features(_docs(spark, ["the cat sat"])).collect()[0]
    assert r["n_words"] == 3 and r["n_chars"] == 11
    assert r["avg_word_len"] == 9 / 3
    assert r["alpha_ratio"] == 9 / 11
    assert r["stopword_ratio"] == 1 / 3  # 'the'
    assert 0 <= r["quality_score"] <= 1


def test_lang_id_votes(spark):
    df = _docs(spark, ["the cat and the dog", "der hund ist nicht hier", "zzz qqq"])
    got = {r["doc_id"]: r for r in language_id(df).collect()}
    assert got[0]["pred_lang"] == "en" and got[0]["en_hits"] == 3
    assert got[1]["pred_lang"] == "de" and got[1]["de_hits"] == 3
    assert got[2]["pred_lang"] == "en"  # zero votes everywhere -> en precedence


def test_token_counts(spark):
    r = token_counts(_docs(spark, ["Hello, world 42!"])).collect()[0]
    assert r["n_ws_tokens"] == 3
    assert r["n_norm_words"] == 2  # '42!' normalizes to empty
    # lower: 'hello' ',' 'world' '42' '!'
    assert r["n_bpe_ish"] == 5
    assert r["est_tokens_char4"] == 4  # ceil(16/4)


def test_fingerprints_subset_of_shingle_hashes(spark):
    df = _docs(spark, ["a b c d e f g h i j k l m n o p q r s t u v w x y z"])
    sh = shingles(df)
    fp = fingerprints(sh, mod=2).collect()
    assert len(fp) > 0
    assert all(r["fp"] % 2 == 0 for r in fp)


def test_repetition_signals_exact_and_short_doc_safe(spark):
    """Gopher-style repetition: hand-computed fractions on a crafted
    doc, NULL-free zeros absent on sub-n-gram docs (the sequence()
    descent / ANSI element_at hazard)."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.textstats import quality_features

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spam ham spam ham spam"),
            Row(doc_id=1, text="one"),
            Row(doc_id=2, text=""),
        ]
    )
    got = {r["doc_id"]: r for r in quality_features(docs).collect()}
    r0 = got[0]
    # 5 words, 2 distinct -> dup 3/5; bigrams: [spam ham, ham spam]x2 -> top 2/4
    assert r0["dup_word_frac"] == 1.0 - 2.0 / 5.0
    assert r0["top_bigram_frac"] == 2.0 / 4.0
    # trigrams: 'spam ham spam' x2, 'ham spam ham' x1 -> top 2/3
    assert r0["top_trigram_frac"] == 2.0 / 3.0
    # one-word / empty docs: no n-grams, no crash, NULL fractions
    assert got[1]["top_bigram_frac"] is None and got[1]["dup_word_frac"] == 0.0
    assert got[2]["dup_word_frac"] is None and got[2]["top_trigram_frac"] is None


def test_collocations_pmi_matches_python_replay(spark, sf_small):
    """Counts exact vs a python replay; PMI/NPMI close (both engines
    compute from the same exact integers)."""
    import math

    from mapreduce_task_spark.operators.textstats import collocations_pmi
    from mapreduce_task_spark.functions.text import normalized_tokens
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    tok_lists = [
        r["t"] for r in docs.select(normalized_tokens("text").alias("t")).collect()
    ]
    uni, bi, total = {}, {}, 0
    for toks in tok_lists:
        total += len(toks)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    eligible = {p: n for p, n in bi.items() if n >= 5}
    want_top = sorted(eligible.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = collocations_pmi(docs, top_k=20, min_count=5).collect()
    assert [((r["w1"], r["w2"]), r["n_pair"]) for r in got] == want_top
    for r in got:
        assert r["n_w1"] == uni[r["w1"]] and r["n_w2"] == uni[r["w2"]]
        p_ab = r["n_pair"] / total
        p_a, p_b = r["n_w1"] / total, r["n_w2"] / total
        want_pmi = math.log(p_ab / (p_a * p_b))
        assert math.isclose(r["pmi"], want_pmi, rel_tol=1e-12)
        assert math.isclose(r["npmi"], want_pmi / -math.log(p_ab), rel_tol=1e-12)


def test_compression_ratio_matches_zlib_replay(spark, sf_small):
    import zlib

    from mapreduce_task_spark.operators.textstats import compression_ratio
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    got = {
        r["doc_id"]: (r["raw_bytes"], r["compressed_bytes"], r["compression_ratio"])
        for r in compression_ratio(docs).collect()
    }
    sample = docs.limit(20).collect()
    for r in sample:
        raw = r["text"].encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        rb, cb, ratio = got[r["doc_id"]]
        assert rb == len(raw) and cb == comp
        assert abs(ratio - comp / len(raw)) < 1e-12
    # repetitive text compresses deeper than the corpus norm
    from pyspark.sql import Row

    rep = spark.createDataFrame(
        [Row(doc_id=0, text="spam " * 500), Row(doc_id=1, text=sample[0]["text"])]
    )
    rr = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(rep).collect()}
    assert rr[0] < rr[1]


def test_unigram_logprob_matches_python_replay(spark, sf_small):
    import math

    from mapreduce_task_spark.functions.text import normalized_tokens
    from mapreduce_task_spark.operators.textstats import unigram_logprob_score
    from mapreduce_task_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    tok_rows = docs.select("doc_id", normalized_tokens("text").alias("t")).collect()
    counts, total = {}, 0
    for r in tok_rows:
        for w in r["t"]:
            counts[w] = counts.get(w, 0) + 1
            total += 1
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob_score(docs).collect()
    }
    for r in tok_rows[:50]:
        if not r["t"]:
            continue
        want = sum(
            math.log(counts[w]) - math.log(total) for w in r["t"]
        ) / len(r["t"])
        n, avg = got[r["doc_id"]]
        assert n == len(r["t"])
        assert math.isclose(avg, want, rel_tol=1e-9)
    # a doc of corpus-common words must outscore one of near-unique words
    common = max(counts, key=counts.get)
    rare_doc = docs.orderBy(F.length("text").desc()).first()
    assert got[rare_doc["doc_id"]][1] < math.log(counts[common]) - math.log(total)
