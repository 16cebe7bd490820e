"""Unigram-LM tokenizer training (operators/unigram.py): exact
equality against an independently-written pure-Python twin of the
whole train/segment spec, plus the structural gates (round-trip
totality, unknown-char handling, layout invariance).

The twin below re-implements the documented spec from scratch —
different code shape (dicts + loops end to end, no DataFrames), same
contract — so a bug in the operator cannot silently mirror itself
here. Float log-probs are compared EXACTLY: both sides sum doubles
left-to-right along the same deterministic orders, so equality is
bitwise, not approximate.
"""

import math
import re
from collections import Counter

from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.unigram import (
    UNK_LOGP,
    unigram_segment,
    unigram_train,
)

# --------------------------------------------------------------------------
# the independent twin


def _twin_words(texts):
    """The engine's P1+P2+P3 word chain (tokenize on whitespace,
    lowercase, strip non-letters, drop empties) — replayed as the
    golden-reference tests replay it."""
    out = []
    for t in texts:
        for tok in t.split():
            w = re.sub(r"[^a-z]", "", tok.lower())
            if w:
                out.append(w)
    return out


def _twin_viterbi(word, vocab, max_len):
    n = len(word)
    best = [0.0] + [None] * n
    back = [0] * (n + 1)
    for end in range(1, n + 1):
        top, top_j = None, 0
        for start in range(max(0, end - max_len), end):
            if best[start] is None:
                continue
            lp = vocab.get(word[start:end])
            if lp is None:
                if end - start != 1:
                    continue
                lp = UNK_LOGP
            score = best[start] + lp
            if top is None or score > top:
                top, top_j = score, start
        best[end] = top
        back[end] = top_j
    pieces = []
    pos = n
    while pos > 0:
        pieces.append(word[back[pos] : pos])
        pos = back[pos]
    return list(reversed(pieces))


def _twin_train(texts, vocab_size, max_piece_len, seed_size, em_rounds,
                prune_frac):
    wf = Counter(_twin_words(texts))
    seed = Counter()
    for w, c in wf.items():
        for ln in range(1, max_piece_len + 1):
            for st in range(0, len(w) - ln + 1):
                seed[w[st : st + ln]] += c
    ranked = sorted(seed.items(), key=lambda t: (-t[1], t[0]))
    counts = dict(ranked[:seed_size])
    for p, c in seed.items():
        if len(p) == 1:
            counts[p] = c

    def probs(cs):
        tot = sum(cs.values())
        return {p: math.log(n) - math.log(tot) for p, n in cs.items()}

    vocab = probs(counts)

    def em():
        nonlocal vocab
        for _ in range(em_rounds):
            new = Counter()
            for w, c in wf.items():
                for piece in _twin_viterbi(w, vocab, max_piece_len):
                    new[piece] += c
            new = dict(new)
            for p in vocab:
                if len(p) == 1 and p not in new:
                    new[p] = 1
            vocab = probs(new)

    em()
    while True:
        prunable = sorted((lp, p) for p, lp in vocab.items() if len(p) > 1)
        n_chars = len(vocab) - len(prunable)
        if len(vocab) <= max(vocab_size, n_chars):
            break
        target = max(vocab_size, int(len(vocab) * (1.0 - prune_frac)), n_chars)
        n_drop = len(vocab) - target
        if n_drop <= 0:
            break
        dropped = {p for _, p in prunable[:n_drop]}
        vocab = {p: lp for p, lp in vocab.items() if p not in dropped}
        em()
    return sorted(vocab.items())


# --------------------------------------------------------------------------


_TEXTS = [
    "the internationalization working group internationalizes the api",
    "working the group works on tokenization and tokenizers",
    "the tokenizer tokenizes international text for the working api",
    "internationalization beats nationalization in the working group",
    "apis and tokenizers work on international tokenization",
] * 2  # doubled: frequencies > 1 exercise the weighting


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(_TEXTS)],
        "doc_id bigint, text string",
    )


_HP = dict(
    vocab_size=40, max_piece_len=4, seed_size=120, em_rounds=2,
    prune_frac=0.25,
)


def test_unigram_train_matches_python_twin(spark):
    got = unigram_train(_docs(spark), **_HP)
    want = _twin_train(_TEXTS, **_HP)
    assert got == want  # exact, including the float log-probs
    pieces = [p for p, _ in got]
    assert len(pieces) >= 26  # at least the single chars survive
    assert any(len(p) > 1 for p in pieces)  # learned real multi-char pieces


def test_unigram_segment_matches_twin_and_round_trips(spark):
    vocab = unigram_train(_docs(spark), **_HP)
    seg = unigram_segment(_docs(spark), vocab).collect()
    v = dict(vocab)
    assert len(seg) > 0
    for r in seg:
        assert r["pieces"] == _twin_viterbi(r["word"], v, 4)
        assert "".join(r["pieces"]) == r["word"]  # lossless round-trip


def test_unigram_segment_total_over_unknown_chars(spark):
    vocab = unigram_train(_docs(spark), **_HP)
    df = spark.createDataFrame(
        [Row(doc_id=0, text="zzzqqq the internationalqz")],
        "doc_id bigint, text string",
    )
    got = {r["word"]: r["pieces"] for r in unigram_segment(df, vocab).collect()}
    assert "".join(got["zzzqqq"]) == "zzzqqq"  # unk chars -> single pieces
    assert "".join(got["internationalqz"]) == "internationalqz"


def test_unigram_segment_non_bigint_id(spark):
    # the output schema derives the id type from the input frame
    vocab = unigram_train(_docs(spark), **_HP)
    df = spark.createDataFrame(
        [Row(doc_id="a-1", text="the working group")],
        "doc_id string, text string",
    )
    got = unigram_segment(df, vocab).collect()
    assert {r["doc_id"] for r in got} == {"a-1"}
    assert all("".join(r["pieces"]) == r["word"] for r in got)


def test_unigram_train_is_layout_invariant(spark):
    base = _docs(spark)
    a = unigram_train(base.repartition(1), **_HP)
    b = unigram_train(base.repartition(7, "doc_id"), **_HP)
    assert a == b


def test_unigram_differs_from_bpe_but_same_surface(spark):
    """The two tokenizer families expose the same (train -> segment)
    surface; sanity that unigram actually learns long pieces BPE's
    8 merges cannot reach in this corpus."""
    vocab = unigram_train(_docs(spark), **_HP)
    long_pieces = [p for p, _ in vocab if len(p) >= 3]
    assert long_pieces  # e.g. 'tion'-class substrings at max_piece_len 4
