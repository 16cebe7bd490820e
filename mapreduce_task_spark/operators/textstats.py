"""Text-analysis operators for training-data pipelines.

Language ID (stopword-vote heuristic), quality scoring, token counting,
and document fingerprinting — per-document scalar pipelines the
reference lacks entirely (its only text ops are the §2.2 tokenizer
primitives), re-expressed as narrow Spark array expressions.

Scale design: every operator here is a per-row projection over the
``documents`` scan — no shuffle, no UDF, full codegen. At 100 TB these
run at parquet-scan speed with column pruning (only ``text`` is read).

Determinism: all ratios are int/int divides in double (IEEE-exact);
score formulas are written with the identical operator tree in the
DuckDB oracles so results are bitwise-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import hash64
from ..functions.text import normalized_tokens, tokenize
from ..sources.tables import ensure_parallelism

# Tiny per-language stopword sets for the n-gram/stopword-vote language
# heuristic. Deliberately small + ASCII so the same lists inline into
# oracle SQL.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "por", "para"),
}

# BPE-ish token pieces: letter runs, digit runs, single other-glyphs.
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _toks(text_col: str) -> Column:
    return normalized_tokens(text_col)


def ws_token_count(text_col: str) -> Column:
    """Raw whitespace-token count (split artifacts excluded)."""
    return F.size(F.filter(tokenize(text_col), lambda x: x != F.lit("")))


def stopword_hits(toks: Column | str, lang: str) -> Column:
    """How many normalized tokens (with multiplicity) are stopwords of
    ``lang``. ``toks`` is either a text column NAME (tokenized here) or
    an already-materialized token-array Column — callers computing
    several token-derived features per row MUST pass the latter:
    codegen subexpression elimination does not collapse lambda-bearing
    subtrees, so a captured tokenization expression re-runs its regex
    chain once per feature (the collocations_pmi lesson)."""
    stops = STOPWORDS[lang]
    t = _toks(toks) if isinstance(toks, str) else toks
    return F.size(F.filter(t, lambda w: w.isin(*stops)))


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features + a composite score in [0, 1].

    score = 0.5*alpha_ratio + 0.3*stopword_ratio + 0.2*min(1, n_words/100)
    — the formula is mirrored token-for-token in the oracle so the
    double result is bit-identical.

    The token array is materialized ONCE in a pre-projection: six of
    the features consume it, and codegen subexpression elimination does
    not collapse lambda-bearing subtrees, so inlining ``_toks`` per
    feature re-runs the split+regex chain six times per row.
    """
    pre = ensure_parallelism(df).select(
        F.col(id_col), F.col(text_col), _toks(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    # sorted gram arrays likewise materialize once: each is referenced
    # twice (run-length aggregate + size) by top_frac_of_sorted
    pre = pre.select(
        "*",
        F.array_sort(_ngrams(toks, 2)).alias("__g2"),
        F.array_sort(_ngrams(toks, 3)).alias("__g3"),
    )
    n_words = F.size(toks)
    word_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0), lambda acc, x: acc + x
    )
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    en_hits = stopword_hits(toks, "en")

    alpha_ratio = alpha_chars.cast("double") / F.nullif(n_chars, F.lit(0)).cast("double")
    stop_ratio = en_hits.cast("double") / F.nullif(n_words, F.lit(0)).cast("double")
    avg_word_len = word_chars.cast("double") / F.nullif(n_words, F.lit(0)).cast("double")
    length_term = F.least(F.lit(1.0), n_words.cast("double") / F.lit(100.0))
    score = (
        F.lit(0.5) * alpha_ratio + F.lit(0.3) * stop_ratio + F.lit(0.2) * length_term
    )

    return pre.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_chars.cast("long").alias("n_chars"),
        avg_word_len.alias("avg_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
        dup_word_frac(toks).alias("dup_word_frac"),
        top_frac_of_sorted(F.col("__g2")).alias("top_bigram_frac"),
        top_frac_of_sorted(F.col("__g3")).alias("top_trigram_frac"),
    )


def dup_word_frac(toks: Column | str) -> Column:
    """Fraction of word occurrences that repeat an earlier word:
    1 - distinct/total. The word-level repetition signal from the
    Gopher-style quality rules — high values flag boilerplate and
    degenerate generations. ``toks``: text column name or materialized
    token-array Column (see ``stopword_hits``)."""
    t = _toks(toks) if isinstance(toks, str) else toks
    n = F.size(t)
    return F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / F.nullif(
        n, F.lit(0)
    ).cast("double")


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as joined strings, expression-only. Short documents
    get an empty array — the guard matters because sequence(1, m)
    DESCENDS for m < 1 and ANSI element_at rejects index 0."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def top_ngram_frac(toks: Column | str, n: int) -> Column:
    """Fraction of all word n-grams taken by the single most frequent
    one (Gopher's top-n-gram coverage). The max multiplicity is the
    longest equal-adjacent run of the SORTED gram array, found by one
    aggregate pass with (prev, run, best) struct state — O(g log g)
    per row, codegen, no shuffle, no explode. (The naive
    count-each-distinct comprehension is O(d*g) per row: quadratic in
    document length, and measured 200x slower on sf0.1 documents.)
    The oracle counts multiplicities its own way; both sides produce
    the same exact integers. ``toks``: text column name or
    materialized token-array Column (see ``stopword_hits``)."""
    t = _toks(toks) if isinstance(toks, str) else toks
    return top_frac_of_sorted(F.array_sort(_ngrams(t, n)))


def top_frac_of_sorted(grams: Column) -> Column:
    """Top-multiplicity fraction of an already-SORTED gram array — the
    core of ``top_ngram_frac``, split out so callers that materialize
    the sorted array in a projection (``quality_features``) pay the
    sort once instead of once per reference."""
    top = F.aggregate(
        grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return top.cast("double") / F.nullif(F.size(grams), F.lit(0)).cast("double")


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-vote language prediction over STOPWORDS' languages.

    Argmax with a fixed precedence (en > de > fr > es on ties) so the
    prediction is deterministic; hit counts are exposed for debugging
    and for the oracle's value check.

    The token array materializes once: the four per-language hit counts
    are each referenced twice (prediction CASE + output column), and
    lambda-bearing subtrees escape codegen subexpression elimination —
    inlined, the regex tokenization would run 8x per row.
    """
    pre = ensure_parallelism(df).select("*", _toks(text_col).alias("__toks"))
    hits = {lang: stopword_hits(F.col("__toks"), lang) for lang in STOPWORDS}
    pred = (
        F.when(
            (hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["es"]),
            F.lit("en"),
        )
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]), F.lit("de"))
        .when(hits["fr"] >= hits["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return pre.select(
        F.col(id_col),
        *[hits[lang].cast("long").alias(f"{lang}_hits") for lang in STOPWORDS],
        pred.alias("pred_lang"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token-count estimators: whitespace, BPE-ish regex pieces, and
    the chars/4 heuristic (ceil)."""
    bpe_ish = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0))
    est4 = F.ceil(F.length(text_col).cast("double") / F.lit(4.0)).cast("bigint")
    return ensure_parallelism(df).select(
        F.col(id_col),
        ws_token_count(text_col).cast("long").alias("n_ws_tokens"),
        F.size(_toks(text_col)).cast("long").alias("n_norm_words"),
        bpe_ish.cast("long").alias("n_bpe_ish"),
        est4.alias("est_tokens_char4"),
    )


def fingerprints(
    shingle_df: DataFrame, id_col: str = "doc_id", mod: int = 8
) -> DataFrame:
    """Mod-p sampled shingle-hash fingerprint (one row per kept hash).

    Winnowing-style content sampling: keep hash(shingle) where
    hash % mod == 0 — a ~1/mod deterministic sample of each doc's
    shingle set, comparable across docs for containment detection.
    """
    h = hash64("shingle")
    return (
        shingle_df.select(F.col(id_col), h.alias("fp"))
        .filter(F.col("fp") % mod == 0)
        .distinct()
    )


def collocations_pmi(
    df: DataFrame, text_col: str = "text", top_k: int = 50, min_count: int = 5
) -> DataFrame:
    """Top-k adjacent-word collocations by count, with PMI and NPMI.

    Counts are exact integers from two aggregations (bigrams via one
    posexplode-free adjacent zip — transform over 1..n-1 — then
    groupBy; unigrams likewise); PMI/NPMI are computed from those
    integers at the end, so the floating step never feeds a
    comparison. The classic phrase-mining signal (new-term discovery,
    tokenizer-vocabulary candidates) over the documents table.

    Scale: two shuffles (bigram counts, unigram counts), both partial-
    aggregated map-side; the unigram table joins back twice via
    broadcast when small or shuffle otherwise — Catalyst picks. Top-k
    is TakeOrderedAndProject.

    The token array is materialized in its own projection BEFORE the
    bigram lambda touches it: higher-order functions re-evaluate
    captured non-attribute expressions per element, so capturing the
    raw tokenization expression (split + per-token regex) inside the
    transform would re-tokenize the whole document once per bigram —
    an in-row quadratic. ``element_at`` against the materialized
    column attribute is O(1) per element instead.
    """
    tokd = df.select(_toks(text_col).alias("t"))
    t = F.col("t")
    grams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i.cast("int")).alias("w1"),
                F.element_at(t, (i + 1).cast("int")).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    tok_rows = tokd.select(F.explode(t).alias("w"))
    uni = tok_rows.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    n_tokens = tok_rows.agg(F.count(F.lit(1)).alias("n_total"))

    bi = (
        tokd.select(F.explode(grams).alias("g"))
        .select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    joined = bi.join(u1, "w1").join(u2, "w2").join(F.broadcast(n_tokens))
    # PMI over token-frequency probabilities: p(ab) uses the bigram
    # count over (n_total - 1 per doc ~ n_total at corpus scale); we
    # use n_total for both to keep the formula the textbook one
    p_ab = F.col("n_pair").cast("double") / F.col("n_total").cast("double")
    p_a = F.col("n_w1").cast("double") / F.col("n_total").cast("double")
    p_b = F.col("n_w2").cast("double") / F.col("n_total").cast("double")
    pmi = F.log(p_ab / (p_a * p_b))
    npmi = pmi / -F.log(p_ab)
    return (
        joined.select(
            "w1", "w2", "n_pair", "n_w1", "n_w2",
            pmi.alias("pmi"), npmi.alias("npmi"),
        )
        .orderBy(F.col("n_pair").desc(), "w1", "w2")
        .limit(top_k)
    )


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    classic redundancy quality signal (highly repetitive or degenerate
    text compresses far below prose; see the repetition filters this
    complements in quality_features).

    zlib is stdlib, so unlike the image/audio decoders this Python
    stage runs everywhere; it is Arrow-batched ``mapInPandas`` with
    one C-level ``zlib.compress`` call per doc (no per-byte Python),
    the same batching contract as multimodal feature extraction.
    Empty docs get ratio NULL (nothing to measure).
    """
    import pandas as pd

    src = ensure_parallelism(df).select(id_col, text_col)

    def ratios(it):
        import zlib

        for pdf in it:
            raw = pdf[text_col].str.encode("utf-8")
            n = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": n,
                    "compressed_bytes": comp.astype("int64"),
                }
            )
            out["compression_ratio"] = out["compressed_bytes"] / out[
                "raw_bytes"
            ].where(out["raw_bytes"] > 0)
            yield out

    return src.mapInPandas(
        ratios,
        schema=f"{id_col} bigint, raw_bytes bigint, compressed_bytes bigint, "
        "compression_ratio double",
    )


def unigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Average per-token unigram log-probability under the corpus's OWN
    unigram distribution — the LM-free stand-in for perplexity-based
    quality filtering (docs of rare/garbled tokens score low; docs of
    common words score high).

    Train + score in one plan: token counts (one shuffle), total via a
    1-row broadcast, then tokens join their log-prob and average per
    doc (second shuffle). The vocabulary rides a JOIN, not a broadcast
    map — at 100 TB the vocab can be huge, and the join keys are
    uniform words. All floats are derived per token then averaged in
    double; use the python-replay test tolerance, not bit equality
    (log is libm-dependent — same reason bm25 is log-free).
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col), F.explode(_toks(text_col)).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    logp = counts.join(F.broadcast(total)).select(
        "w",
        (F.log(F.col("n_w").cast("double")) - F.log(F.col("n_total").cast("double"))).alias(
            "logp"
        ),
    )
    return (
        toks.join(logp, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logp").alias("avg_logprob"),
        )
    )
