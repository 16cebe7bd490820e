"""operators.fuzzy: symmetric-delete edit-distance join + typo tables."""

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.fuzzy import (
    deletion_variants,
    symdelete_pairs,
    typo_clusters,
)
from mapreduce_task_spark.sources.tables import load_table


def _brute_pairs(words):
    def lev1(a, b):
        # distance <= 1 check (lengths differ by more than 1 -> no)
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        s, l = (a, b) if la < lb else (b, a)
        for i in range(len(l)):
            if l[:i] + l[i + 1 :] == s:
                return True
        return False

    ws = sorted(set(words))
    return {
        (a, b) for i, a in enumerate(ws) for b in ws[i + 1 :] if lev1(a, b)
    }


def test_deletion_variants_shape(spark):
    df = spark.createDataFrame([Row(word="cat")])
    [r] = df.select(deletion_variants("word").alias("v")).collect()
    assert set(r["v"]) == {"cat", "at", "ct", "ca"}


def test_symdelete_pairs_match_bruteforce_on_real_vocab(spark, sf_small):
    """Real vocabulary + injected single-edit typos (the synthetic
    corpus's distinct words happen to be all >1 edit apart — verified
    by the brute-force replay — so typos make the test non-vacuous)."""
    docs = load_table(spark, sf_small, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .distinct()
    )
    words = sorted(r["word"] for r in vocab.collect())
    typos = [w[1:] for w in words[:20]] + [w + "x" for w in words[20:40]]
    all_words = sorted(set(words) | set(typos))
    full = spark.createDataFrame([Row(word=w) for w in all_words])
    want = _brute_pairs(all_words)
    got = {(r["a"], r["b"]) for r in symdelete_pairs(full, "word").collect()}
    assert got == want
    assert len(got) >= 20  # every injected typo pairs with its source


def test_typo_clusters_map_rare_to_frequent(spark):
    rows = (
        [Row(word="table")] * 40
        + [Row(word="tabl")] * 2  # deletion typo of "table"
        + [Row(word="chair")] * 30
        + [Row(word="chairs")] * 25  # distance-1 pair, ratio < 4 both ways
    )
    df = spark.createDataFrame(rows)
    got = {
        r["variant"]: (r["canonical"], r["n_variant"], r["n_canonical"])
        for r in typo_clusters(df, "word", min_count_ratio=4).collect()
    }
    assert got == {"tabl": ("table", 2, 40)}
