"""Text tokenization/normalization column functions.

Reference parity (SURVEY.md §2.2): the WordCount mapper tokenizes on
``\\s+`` and normalizes with ``toLowerCase().replaceAll("[^a-z]","")``
(TraceWordCountMapper.java:108-111) — so ``don't`` -> ``dont``, digits
and non-Latin text vanish, and empty results are dropped. These helpers
reproduce that exactly with JVM-side built-ins (regexp in codegen, no
Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Java \s is ASCII [ \t\n\x0B\f\r]; matches the reference's split("\\s+")
TOKEN_SPLIT_RE = r"\s+"
# strip everything that is not a lowercase letter (after lower())
NON_LETTER_RE = "[^a-z]"


def tokenize(col: Column | str) -> Column:
    """Split a line into raw whitespace-separated tokens (P1)."""
    return F.split(F.col(col) if isinstance(col, str) else col, TOKEN_SPLIT_RE)


def normalize_token(col: Column | str) -> Column:
    """Lowercase and strip non-letters (P2): ``don't`` -> ``dont``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), NON_LETTER_RE, "")


def normalized_tokens(col: Column | str) -> Column:
    """Array of normalized non-empty tokens, order preserved (P1+P2+P3
    as one narrow array expression — no explode, no shuffle)."""
    toks = F.transform(tokenize(col), lambda x: F.regexp_replace(F.lower(x), NON_LETTER_RE, ""))
    return F.filter(toks, lambda w: F.length(w) > 0)


def words(df: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ()) -> DataFrame:
    """Explode a text column into one normalized non-empty word per row
    (P1+P2+P3). ``keep`` columns are carried along (e.g. doc_id for the
    inverted index).

    The explode happens before normalization, matching the mapper's
    per-token loop; empty tokens (pure punctuation/digits/CJK) are
    dropped like TraceWordCountMapper.java:111.
    """
    from ..sources.tables import ensure_parallelism

    cols = [F.col(c) for c in keep]
    exploded = ensure_parallelism(df).select(
        *cols, F.explode(tokenize(text_col)).alias("__raw")
    )
    return (
        exploded.select(*cols, normalize_token("__raw").alias("word"))
        .filter(F.length("word") > 0)
    )
