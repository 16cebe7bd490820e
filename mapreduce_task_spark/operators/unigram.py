"""Unigram-LM (SentencePiece-style) tokenizer training — the
alternative tokenizer-learning family beside BPE (operators/bpe.py).

Where BPE GROWS a vocabulary bottom-up (merge the most frequent pair),
the unigram LM SHRINKS one top-down: seed with a large candidate set
(frequent substrings + all single characters), fit piece
probabilities by EM over the word-frequency table, and repeatedly
prune the lowest-probability multi-character pieces until the target
vocabulary size — Kudo 2018's recipe, restated over DataFrames.

Deliberate, documented simplifications:

- **Hard (Viterbi) EM, not forward-backward.** The E-step counts
  pieces along each word's single BEST segmentation instead of
  accumulating posterior-weighted expected counts over all
  segmentations. This keeps every per-round quantity an INTEGER sum
  (piece count x word frequency), so training is exactly
  layout-invariant (pinned in tests) — the soft-EM double
  accumulations would depend on partition reduce order. Hard EM is
  the standard deterministic variant; vocabularies differ slightly
  from soft EM, not in kind.
- **Driver-held vocabulary.** The candidate vocabulary (tens of
  thousands of pieces — tokenizer-sized, by definition) rides the
  closure of an Arrow-batched ``mapInPandas`` stage, the same
  documented legitimate-Python-stage posture as the GEMM blocks and
  multimodal decoders: the per-word Viterbi DP is genuinely
  iterative (best[i] depends on best[j<i]), not expressible as a
  fixed-depth column expression. Everything corpus-sized stays
  distributed: the word table is never collected; each EM round is
  one Arrow pass over |vocab words| rows + ONE piece-count shuffle +
  a vocabulary-sized driver collect (BPE's per-round shape, with a
  |V|-row collect instead of 1-row).
- **No driver-oracle query.** Piece LOG-probabilities are doubles;
  the DP compares float sums, so a SQL replay cannot be made
  bit-honest the way the integer operators are — the same recorded
  blocker as the learned quality classifier. Verification is the
  independent-Python-twin equality test plus the structural gates
  (round-trip, totality, layout invariance).

Viterbi spec (both the trainer and the test twin implement this
exactly): process end positions ascending; at each end, candidate
start positions ascending; strict ``>`` comparison keeps the first
(smallest-start = longest-piece) argmax on ties; unknown single
characters segment with the constant ``UNK_LOGP`` penalty so
segmentation is TOTAL over any input text.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from ..functions.text import words

UNK_LOGP = -30.0  # unknown-single-char penalty: totality without OOV


def _viterbi(word: str, vocab: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs (module
    docstring spec)."""
    n = len(word)
    best: list[float | None] = [0.0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        b: float | None = None
        bj = 0
        for j in range(max(0, i - max_len), i):
            pj = best[j]
            if pj is None:
                continue
            lp = vocab.get(word[j:i])
            if lp is None:
                if i - j != 1:
                    continue
                lp = UNK_LOGP
            s = pj + lp
            if b is None or s > b:
                b, bj = s, j
        best[i] = b
        back[i] = bj
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces


def unigram_word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the corpus word-frequency table — the working set,
    corpus-VOCABULARY-sized (shared shape with bpe.word_freq_table)."""
    w = words(df.select(text_col), text_col)
    return w.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def _seed_counts(
    wf: DataFrame, max_piece_len: int, seed_size: int
) -> list[tuple[str, int]]:
    """Candidate seed: every substring of length 1..max_piece_len
    weighted by word frequency, one explode + ONE groupBy shuffle;
    the top ``seed_size`` by (count desc, piece asc) PLUS every single
    character (chars are never prunable — they guarantee coverage)."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(F.length("word"), F.lit(max_piece_len))),
            lambda ln: F.transform(
                F.sequence(F.lit(1), F.length("word") - ln + 1),
                lambda st: F.col("word").substr(st, ln),
            ),
        )
    )
    counts = (
        wf.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    )
    rows = sorted(
        ((r["piece"], int(r["n"])) for r in counts),
        key=lambda t: (-t[1], t[0]),
    )
    keep = dict(rows[:seed_size])
    for piece, n in rows:  # single chars always survive the seed cut
        if len(piece) == 1:
            keep[piece] = n
    return sorted(keep.items())


def _probs(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(n) - math.log(total) for p, n in counts.items()}


def _e_step_counts(
    wf: DataFrame, vocab: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """Viterbi-count every word under the current probs: one Arrow
    pass over the word table (vocab in the closure), ONE piece-count
    shuffle, vocabulary-sized collect. Integer throughout."""

    def seg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for b in batches:
            out_p: list[str] = []
            out_n: list[int] = []
            for word, cnt in zip(b["word"], b["cnt"]):
                for piece in _viterbi(word, vocab, max_piece_len):
                    out_p.append(piece)
                    out_n.append(int(cnt))
            yield pd.DataFrame({"piece": out_p, "cnt": out_n})

    rows = (
        wf.mapInPandas(seg, "piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("n"))
        .collect()
    )
    return {r["piece"]: int(r["n"]) for r in rows}


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 120,
    max_piece_len: int = 4,
    seed_size: int = 400,
    em_rounds: int = 2,
    prune_frac: float = 0.2,
) -> list[tuple[str, float]]:
    """Train a unigram-LM vocabulary; returns the final (piece, logp)
    list sorted by piece. Loop: ``em_rounds`` of hard EM, then prune
    the lowest-probability multi-character pieces (by (logp asc, piece
    asc) — deterministic) down to ``max(vocab_size, |V|*(1-prune_
    frac))``, repeat until the vocabulary fits, then one final EM
    round re-fits probabilities on the surviving set. Single
    characters are unprunable; pieces that win zero Viterbi counts in
    a round drop immediately (they are unreachable under the current
    best segmentations) unless single-char, which floor at count 1."""
    if vocab_size < 1 or em_rounds < 1 or not 0 < prune_frac < 1:
        raise ValueError("bad unigram_train hyperparameters")
    wf = unigram_word_freq(df, text_col).persist()
    try:
        counts = dict(_seed_counts(wf, max_piece_len, seed_size))
        vocab = _probs(counts)

        def em() -> None:
            nonlocal vocab
            for _ in range(em_rounds):
                new = _e_step_counts(wf, vocab, max_piece_len)
                for p in vocab:  # char coverage floor
                    if len(p) == 1 and p not in new:
                        new[p] = 1
                vocab = _probs(new)

        em()
        while True:
            prunable = sorted(
                ((lp, p) for p, lp in vocab.items() if len(p) > 1),
            )
            n_chars = len(vocab) - len(prunable)
            if len(vocab) <= max(vocab_size, n_chars):
                break
            target = max(vocab_size, int(len(vocab) * (1.0 - prune_frac)))
            target = max(target, n_chars)
            n_drop = len(vocab) - target
            if n_drop <= 0:
                break
            dropped = {p for _, p in prunable[:n_drop]}
            vocab = {p: lp for p, lp in vocab.items() if p not in dropped}
            em()
        return sorted(vocab.items())
    finally:
        wf.unpersist()


def unigram_segment(
    df: DataFrame,
    vocab: list[tuple[str, float]] | dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Apply a trained vocabulary: (id, word, pieces) — Viterbi per
    word through the same Arrow posture as training; total over any
    input (unknown single chars via UNK_LOGP)."""
    v = dict(vocab)
    max_len = max_piece_len or max((len(p) for p in v), default=1)
    id_type = df.schema[id_col].dataType.simpleString()

    def seg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "word": b["word"],
                    "pieces": [
                        _viterbi(w, v, max_len) for w in b["word"]
                    ],
                }
            )

    w = words(df, text_col, keep=(id_col,))
    return w.mapInPandas(
        seg, f"{id_col} {id_type}, word string, pieces array<string>"
    )
