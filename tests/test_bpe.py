"""BPE vocabulary training vs an independent pure-Python reference."""

from collections import Counter

from pyspark.sql import Row

from mapreduce_task_spark.operators.bpe import bpe_segment, bpe_train


def _py_normalize(text):
    out = []
    for tok in text.split():
        w = "".join(c for c in tok.lower() if "a" <= c <= "z")
        if w:
            out.append(w)
    return out


def _py_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_bpe(texts, num_merges):
    wf = Counter()
    for t in texts:
        wf.update(_py_normalize(t))
    syms = {w: list(w) for w in wf}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, c in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # max count, lexicographic tiebreak — the operator's order
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        syms = {w: _py_merge(s, a, b) for w, s in syms.items()}
    return merges, syms


TEXTS = [
    "the theme of the thesis is there",
    "low lower lowest slowest slow slow",
    "banana bandana and a banana stand",
    "the the the low low banana",
]


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])
    got = bpe_train(df, num_merges=6)
    want, _ = _py_bpe(TEXTS, 6)
    assert got == want
    assert len(got) == 6 and got[0] == ("a", "n")  # banana/bandana/and/stand


def test_bpe_segment_matches_python_reference(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])
    merges, ref_syms = _py_bpe(TEXTS, 6)
    seg = bpe_segment(df, merges)
    for r in seg.collect():
        assert list(r["pieces"]) == ref_syms[r["word"]], r["word"]
    # segmentation is lossless: pieces re-concatenate to the word
    for r in seg.collect():
        assert "".join(r["pieces"]) == r["word"]


def test_bpe_run_semantics(spark):
    """'aaaa' + merge (a,a) segments left-to-right into aa,aa — the
    greedy run case where a wrong fold gives aa,a,a or a,aaa."""
    df = spark.createDataFrame([Row(doc_id=0, text="aaaa aaa")])
    seg = {r["word"]: list(r["pieces"]) for r in bpe_segment(df, [("a", "a")]).collect()}
    assert seg["aaaa"] == ["aa", "aa"]
    assert seg["aaa"] == ["aa", "a"]


def test_bpe_train_releases_all_caches(spark):
    """The r13 one-action-per-round cadence tracks a previous-round
    cache across iterations; every persisted word table (including the
    deferred previous round and the never-materialized final fold)
    must be released when training returns."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    docs = spark.createDataFrame(
        [Row(text="low lower lowest new newer")] * 3
    )
    merges = bpe_train(docs, num_merges=4, with_counts=True)
    assert len(merges) == 4
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before
