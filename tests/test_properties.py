"""Property tests (hypothesis) — SURVEY §5.2 item 3.

Tokenizer semantics vs a pure-Python reference, sort duplicate
preservation, and quantized-cosine bounds.
"""

import math
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from mapreduce_task_spark.functions.text import normalized_tokens
from mapreduce_task_spark.operators.sortops import total_sort


def _py_normalize(line: str) -> list[str]:
    """Reference semantics: split on \\s+, lower, strip [^a-z], drop empties
    (TraceWordCountMapper.java:108-111).

    re.ASCII: Java's \\s is ASCII-only ([ \\t\\n\\x0B\\f\\r]) — Python's
    unicode \\s additionally matches NEL/NBSP etc., which the Java reference
    (and Spark's JVM regex) do NOT treat as token separators.
    """
    toks = re.split(r"\s+", line, flags=re.ASCII)
    out = []
    for t in toks:
        t = re.sub("[^a-z]", "", t.lower())
        if t:
            out.append(t)
    return out


# printable-ish lines incl. digits, punctuation, unicode, apostrophes
_line = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=60,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(_line, min_size=1, max_size=8))
def test_tokenizer_matches_python_reference(spark, lines):
    df = spark.createDataFrame([Row(text=l) for l in lines])
    got = [r["t"] for r in df.select(normalized_tokens("text").alias("t")).collect()]
    # createDataFrame preserves row order for a local list
    assert got == [_py_normalize(l) for l in lines]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcde", max_size=5), min_size=1, max_size=30))
def test_total_sort_preserves_duplicates(spark, values):
    df = spark.createDataFrame([Row(v=v) for v in values])
    got = [r["v"] for r in total_sort(df, "v").collect()]
    assert got == sorted(values)  # exact multiset, exact order


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=2,
        max_size=6,
    )
)
def test_quantized_cosine_bounded(spark, vecs):
    from mapreduce_task_spark.operators.similarity import blocked_all_pairs_cosine

    # exclude near-zero vectors (norm 0 after quantization -> div by zero)
    vecs = [v for v in vecs if sum(abs(x) for x in v) > 0.01]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    rows = blocked_all_pairs_cosine(df, threshold=-2.0, num_blocks=2).collect()
    assert len(rows) == len(vecs) * (len(vecs) - 1) // 2
    assert all(-1.0000001 <= r["cos"] <= 1.0000001 for r in rows)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(1, 40), min_size=1, max_size=4),  # doc word counts
    st.integers(2, 12),  # chunk_words
    st.integers(0, 6),   # overlap (clamped below chunk_words)
)
def test_chunking_covers_every_word_exactly_once_per_window(spark, sizes, cw, ov):
    from mapreduce_task_spark.operators.chunking import chunk_documents

    ov = min(ov, cw - 1)
    step = cw - ov
    docs = [
        Row(doc_id=i, text=" ".join(f"d{i}w{j}" for j in range(n)))
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = chunk_documents(df, chunk_words=cw, overlap=ov).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"].split(" ")
    for i, n in enumerate(sizes):
        words = [f"d{i}w{j}" for j in range(n)]
        chunks = by_doc[i]
        # chunk c must be exactly words[c*step : c*step+cw]
        assert sorted(chunks) == list(range(len(chunks)))
        for c, toks in chunks.items():
            assert toks == words[c * step : c * step + cw]
        # every word covered; starts advance while start < n
        assert {w for t in chunks.values() for w in t} == set(words)


def _py_remove_spans(docs: dict, n: int, df_max: int):
    from collections import defaultdict

    toks = {i: t.split() for i, t in docs.items()}
    per_gram = defaultdict(set)
    for i, t in toks.items():
        for s in range(len(t) - n + 1):
            per_gram[" ".join(t[s : s + n])].add(i)
    hot = {g for g, ds in per_gram.items() if len(ds) > df_max}
    out = {}
    for i, t in toks.items():
        covered = set()
        for s in range(len(t) - n + 1):
            if " ".join(t[s : s + n]) in hot:
                covered.update(range(s, s + n))
        kept = [w for p, w in enumerate(t) if p not in covered]
        out[i] = (" ".join(kept), len(t) - len(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), max_size=12),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_remove_repeated_spans_matches_python(spark, token_lists, n):
    """Random tiny-vocab corpora (repeats are common by construction):
    the operator's covered-union span removal equals the python
    reference for any n, including single-token spans (n=1 ==
    cross-doc word blacklist) and df_max variation."""
    from mapreduce_task_spark.operators.scrub import remove_repeated_spans

    docs = {i: " ".join(t) for i, t in enumerate(token_lists)}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    want = _py_remove_spans(docs, n, 1)
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_repeated_spans(df, n=n, df_max=1).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=12),
            st.booleans(),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_importance_weights_match_integer_replay_property(spark, docs):
    """importance_weights == the integer replay on ARBITRARY small
    corpora (token multisets + target flags), not just the planted
    fixture: per token s = (ct+1)*1e6 div cr over the whole-corpus
    vocab, per doc weight = sum(s over occurrences) div n_tokens."""
    from collections import Counter

    from mapreduce_task_spark.operators.sampling import importance_weights

    rows = [
        (i, tgt, " ".join(toks)) for i, (toks, tgt) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, t boolean, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["weight"])
        for r in importance_weights(df, F.col("t")).collect()
    }
    cr, ct = Counter(), Counter()
    for _, tgt, text in rows:
        for tok in text.split():
            cr[tok] += 1
            if tgt:
                ct[tok] += 1
    s = {tok: ((ct[tok] + 1) * 1_000_000) // cr[tok] for tok in cr}
    want = {}
    for doc_id, _, text in rows:
        toks = text.split()
        want[doc_id] = (len(toks), sum(s[t] for t in toks) // len(toks))
    assert got == want
