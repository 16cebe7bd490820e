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


def unicode_normalize(
    col: Column | str, form: str = "NFC"
) -> Column:
    """Unicode-normalize a string column (NFC/NFD/NFKC/NFKD).

    Why it exists: the dedup ladder hashes text bytes — "Café" as
    U+00E9 (composed) and as e+U+0301 (decomposed) are the same text
    to a reader but different shingles, digests, and minhashes, so
    un-normalized corpora silently under-deduplicate. Production
    pipelines normalize (usually NFC; NFKC to also fold compatibility
    forms like fullwidth digits and ligatures) BEFORE exact dedup /
    shingling.

    Implementation: Arrow-batched pandas UDF over ``unicodedata`` —
    the JVM expression library has no normalizer builtin, so this is
    the documented legitimate use of the Python slow path (one
    C-level pass per batch, NULL-preserving). DuckDB replays NFC as
    ``nfc_normalize``; the NFK* forms have no DuckDB twin, so
    operators built on them stay pytest-verified.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    def _norm(s):
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    # real class objects, not strings: this module's `from __future__
    # import annotations` would stringify inline hints, and pyspark's
    # hint resolution can't see a function-local pandas import
    _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    norm_udf = pandas_udf(_norm, "string")
    return norm_udf(F.col(col) if isinstance(col, str) else col)


def normalize_unicode_text(
    df: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """``df`` with ``text_col`` replaced by its ``form``-normalized
    text — the pre-dedup normalization pass (see ``unicode_normalize``).
    Map-only; every other column rides through untouched.

    ASCII fast path: pure-ASCII text is normalization-INVARIANT under
    all four forms (every ASCII char is its own canonical and
    compatibility decomposition), so rows without a non-ASCII byte —
    the overwhelming majority of a real English-heavy corpus — skip
    the Python stage entirely. The gate is a JVM-side RLIKE; only the
    non-ASCII partition pays the Arrow round trip, and the two
    branches are unioned back. A ``when()`` around the UDF would NOT
    achieve this: Catalyst extracts Python UDFs into an
    ArrowEvalPython node that evaluates on every row regardless of
    the branch, so the split must happen at the DataFrame level.
    NULL text rlikes to NULL -> rides the ASCII (untouched) branch,
    preserving the UDF's NULL passthrough. Row order is not preserved
    across the union (unspecified for DataFrames anyway)."""
    non_ascii = F.col(text_col).isNotNull() & F.col(text_col).rlike(
        "[^\x00-\x7F]"
    )
    hot = df.filter(non_ascii).withColumn(
        text_col, unicode_normalize(text_col, form)
    )
    return df.filter(~non_ascii).unionByName(hot)
