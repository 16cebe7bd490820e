"""BPE vocabulary training over a corpus — the tokenizer-learning
step of an LLM data pipeline, as an iterative DataFrame algorithm.

Classic byte-pair encoding on the word-frequency table: start from
character symbols, then repeatedly (1) count adjacent symbol pairs
weighted by word frequency, (2) take the most frequent pair
(deterministic lexicographic tiebreak), (3) merge it left-to-right in
every word. Each round is ONE pair-count aggregation shuffle over the
word table plus a 1-row driver collect (the argmax — same shape as
the connected-components fixpoint check); the merge itself is a
per-row fold expression, no shuffle.

Scale: the word-frequency table is corpus-vocabulary-sized (tens of
millions of rows at 100 TB, not corpus-sized) and is persisted with a
per-round swap, so each round touches only |vocab| rows; pair counts
reduce map-side. Driver traffic is one (pair, count) row per round.

Determinism: ties broken by (count desc, a asc, b asc); the
left-to-right fold matches the reference BPE greedy segmentation, so
results are replayable in plain Python (tested against one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import words


def _char_syms(word: Column) -> Column:
    """Word -> array of single-character symbols (split artifacts
    dropped)."""
    return F.filter(F.split(word, ""), lambda s: s != F.lit(""))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """One left-to-right BPE merge of adjacent (a, b) -> a+b: a fold
    that either replaces the accumulator's tail (when it ends with
    ``a`` and the next symbol is ``b``) or appends. Matches reference
    BPE greedy semantics including runs ('aaaa' + (a,a) -> aa,aa)."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        # F.get (0-based) is null-safe on the empty accumulator, where
        # ANSI element_at(acc, -1) would throw out-of-bounds
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms): the corpus word-frequency table with initial
    character symbols — the working set BPE iterates on."""
    w = words(df.select(text_col), text_col)
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("word", "cnt", _char_syms(F.col("word")).alias("syms"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    with_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns them in order.

    Each round: explode adjacent symbol pairs (weighted by word count),
    one groupBy((a, b)) sum, take the argmax row, fold the merge into
    every word's symbols. Working table persisted with per-round swap.

    ``with_counts=True`` returns (a, b, n) triples — the merged pair
    plus its weighted corpus count at merge time, the auditable
    training log a driver-verifiable query needs.
    """
    wf = word_freq_table(df, text_col).persist()
    # ONE action per round: round r's argmax collect both returns the
    # top pair AND (as a cache side effect) materializes round r's
    # persisted word table — the previous round's table is released
    # only after that, so the fold never recomputes upstream. The
    # former shape ran an explicit nxt.count() materializer per round
    # (2 jobs/round); fusing it into the next argmax halves the job
    # count with bit-identical merges (r13 optimization round; A/B in
    # OPTIMIZATION_r13.md).
    prev: DataFrame | None = None
    merges: list = []
    try:
        for _ in range(num_merges):
            pairs = wf.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            # wf is now materialized in cache; its predecessor can go
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b, int(top[0]["n"])) if with_counts else (a, b))
            nxt = wf.select(
                "word", "cnt", _merge_fold(F.col("syms"), a, b).alias("syms")
            ).persist()
            prev = wf
            wf = nxt
    finally:
        wf.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list: (id, word, pieces) — each word
    segmented by replaying the merges in order, as a chain of fold
    expressions (no shuffle beyond the word explode)."""
    w = words(df, text_col, keep=(id_col,))
    syms = _char_syms(F.col("word"))
    for a, b in merges:
        syms = _merge_fold(syms, a, b)
    return w.select(id_col, "word", syms.alias("pieces"))
