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
