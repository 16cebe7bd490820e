"""HTML -> text extraction: the pipeline-head stage every web corpus
needs (CCNet / Dolma / RefinedWeb all lead with tag stripping before
any dedup/quality operator downstream of this package runs).

``html_to_text`` is a chained codegen ``regexp_replace`` pipeline —
the ``redact_pii`` shape (operators/scrub.py): per-row JVM regex at
scan speed, zero shuffles, no Python anywhere. Steps, in order:

1. drop the sentinel chars (U+E000/U+E001) from input — they are
   reserved by the numeric-entity decode below (out-of-contract in
   real text),
2. strip comments, the whole ``<head>`` block, and ``<script>`` /
   ``<style>`` blocks (non-greedy, case-insensitive),
3. ``<br>`` and closing block-element tags become newlines (so block
   structure survives as line structure),
4. every remaining tag becomes a space,
5. decimal numeric character references ``&#NNN;`` decode for code
   points 1..255 (the Latin-1 range where Spark's ``char`` and
   DuckDB's ``chr`` agree exactly); anything else — ``&#0;``,
   code points >= 256, hex ``&#xNN;`` refs — passes through verbatim
   (full-Unicode decode would need a per-row Python stage; the
   pass-through is the documented honest boundary),
6. the six standard named entities decode (``&amp;`` LAST — the
   standard sequential-replace order; a pathological ``&#38;amp;``
   double-decodes, the known cost of chained replaces),
7. whitespace normalizes: runs of space/tab/CR collapse to one space,
   spaces around newlines drop, 3+ newlines collapse to a paragraph
   break, leading/trailing whitespace trims.

Determinism/oracle contract: every regex is restricted to the
Java-regex/RE2 COMMON subset — explicit character classes instead of
``\\s``/``\\d`` (Java's ``\\s`` includes U+000B, RE2's does not), no
backreferences in patterns (RE2 has none — script/style/head get one
pattern each instead of ``</\\1>``), anchors only in whole-string
mode. The numeric-entity decode is regex + split + per-element
``char``/``chr`` — exact in both engines for 1..255. Both the Spark
chain and the DuckDB replay SQL are generated from the SAME step
table below, so the two sides cannot drift.

This is a text EXTRACTOR, not an HTML parser: malformed markup
degrades gracefully (an unclosed ``<`` survives as text; an unclosed
``<script>`` eats to end of string — the non-greedy match needs its
closing tag), which is the right trade for a 100 TB crawl where a
full parser would be a per-row Python stage 100x slower.

For main-content extraction (nav/footer boilerplate), compose with
``scrub.remove_boilerplate_lines`` over the extracted line structure:
``extract_main_content`` below wires the two; the line-frequency
machinery is already corpus-scale (8-byte hash shuffles only).

Cite: reference has no markup handling (SURVEY §2 — text jobs consume
pre-extracted text); this extends the LLM-pipeline surface at its
head, per the r12 verdict's top-ranked gap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Private-use sentinels for the numeric-entity decode: each ``&#NNN;``
# match is wrapped OPEN + digits + CLOSE, the text splits on OPEN, and
# only elements carrying the CLOSE marker decode — two DISTINCT
# markers, because a single marker cannot distinguish an inside-token
# segment from an after-token one (plain text like ``#66`` abutting a
# real entity would falsely decode — the r13 self-review finding).
# Both are stripped from input first, so user text can never forge a
# decode token.
SENTINEL = ""
SENTINEL_CLOSE = ""

_BLOCK_CLOSERS = (
    "p|div|li|ul|ol|h[1-6]|tr|table|blockquote|pre|section|article|"
    "header|footer|dd|dt"
)

# (pattern, replacement) — applied in order BEFORE entity decoding.
# Patterns stay inside the Java/RE2 common subset (module docstring).
_PRE_STEPS: tuple[tuple[str, str], ...] = (
    ("[" + SENTINEL + SENTINEL_CLOSE + "]", ""),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<head\b[^>]*>.*?</head[ \t\r\n]*>", " "),
    (r"(?is)<script\b[^>]*>.*?</script[ \t\r\n]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t\r\n]*>", " "),
    (r"(?i)<br[ \t\r\n]*/?[ \t\r\n]*>", "\n"),
    (rf"(?i)</(?:{_BLOCK_CLOSERS})[ \t\r\n]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
)

# applied in order AFTER numeric-entity decoding; &amp; is LAST
_POST_STEPS: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
    (r"[ \t\r]+", " "),
    (r"[ ]*\n[ ]*", "\n"),
    (r"\n\n\n+", "\n\n"),
    (r"^[ \n]+", ""),
    (r"[ \n]+$", ""),
)

_NUMERIC_ENTITY = r"&#([0-9]{1,7});"


_TOKEN_RE = "^#([0-9]{1,7})" + SENTINEL_CLOSE

def _decode_numeric_entities(x: Column) -> Column:
    """Decode ``&#NNN;`` for 1 <= NNN <= 255: wrap each match as
    OPEN#digits CLOSE, split on OPEN, decode only elements that START
    with the ``#digits CLOSE`` token (the rest of the element — text
    that immediately followed the entity — is re-appended verbatim),
    rejoin. ``char``/``chr`` agree exactly for 1..255; above that
    Spark wraps mod 256 where DuckDB does full Unicode, so larger
    refs are restored verbatim. All array/lambda codegen — no
    Python."""
    wrapped = F.regexp_replace(
        x, _NUMERIC_ENTITY, SENTINEL + "#$1" + SENTINEL_CLOSE
    )
    parts = F.split(wrapped, SENTINEL)

    def dec(e: Column) -> Column:
        digits = F.regexp_extract(e, _TOKEN_RE, 1)
        n = digits.cast("int")
        rest = F.regexp_replace(e, _TOKEN_RE, "")
        decoded = F.when((n >= 1) & (n <= 255), F.char(n)).otherwise(
            F.concat(F.lit("&#"), digits, F.lit(";"))
        )
        return F.when(
            e.rlike(_TOKEN_RE), F.concat(decoded, rest)
        ).otherwise(e)

    return F.array_join(F.transform(parts, dec), "")


def html_text_column(col: Column) -> Column:
    """The full extraction chain as one Column expression."""
    x = col
    for pat, rep in _PRE_STEPS:
        x = F.regexp_replace(x, pat, rep)
    x = _decode_numeric_entities(x)
    for pat, rep in _POST_STEPS:
        x = F.regexp_replace(x, pat, rep)
    return x


def html_to_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col``'s HTML with extracted plain text (other
    columns pass through). Map-only: shuffles nothing at any scale."""
    return df.withColumn(text_col, html_text_column(F.col(text_col)))


def extract_main_content(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_max: int = 2,
) -> DataFrame:
    """HTML extraction + cross-document boilerplate-line removal (the
    CCNet-style main-content heuristic): block structure becomes line
    structure in ``html_to_text``, then lines repeating in more than
    ``df_max`` distinct documents (nav, footers, cookie banners — the
    template, not the content) are dropped corpus-wide. Reuses
    ``scrub.remove_boilerplate_lines`` verbatim: one line-hash count
    shuffle (8-byte keys), one per-doc reassembly."""
    from .scrub import remove_boilerplate_lines

    return remove_boilerplate_lines(
        html_to_text(df, text_col), id_col=id_col, text_col=text_col,
        df_max=df_max,
    )


# ---------------------------------------------------------------------------
# DuckDB replay — generated from the SAME step tables as the Spark
# chain (lockstep by construction, the hash64_duckdb_sql pattern).


def _sql_pat(pat: str) -> str:
    """Pattern as a plain SQL string literal: backslashes stay literal
    (standard SQL quoting), only quotes double."""
    return "'" + pat.replace("'", "''") + "'"


def _sql_rep(rep: str) -> str:
    """Replacement as a DuckDB E-string (escape-aware: ``\\`` is the
    RE2 backreference introducer there, ``$`` is Java's)."""
    body = (
        rep.replace("\\", "\\\\").replace("'", "''").replace("\n", "\\n")
    )
    return "E'" + body + "'"


def html_to_text_duckdb_sql(expr: str) -> str:
    """DuckDB SQL replaying ``html_text_column`` bit-for-bit on a text
    expression (for oracle queries)."""
    x = expr
    for pat, rep in _PRE_STEPS:
        x = f"regexp_replace({x}, {_sql_pat(pat)}, {_sql_rep(rep)}, 'g')"
    # numeric entities: RE2 rewrite uses \1 where Java uses $1
    backref_rep = _sql_rep(SENTINEL + "#\\1" + SENTINEL_CLOSE)
    wrapped = (
        f"regexp_replace({x}, {_sql_pat(_NUMERIC_ENTITY)}, "
        f"{backref_rep}, 'g')"
    )
    tok = _sql_pat(_TOKEN_RE)
    x = (
        f"array_to_string(list_transform(string_split({wrapped}, "
        f"'{SENTINEL}'), __e -> "
        f"CASE WHEN regexp_matches(__e, {tok}) THEN "
        f"(CASE WHEN CAST(regexp_extract(__e, {tok}, 1) AS INTEGER) "
        "BETWEEN 1 AND 255 "
        f"THEN chr(CAST(regexp_extract(__e, {tok}, 1) AS INTEGER)) "
        f"ELSE '&#' || regexp_extract(__e, {tok}, 1) || ';' END) || "
        f"regexp_replace(__e, {tok}, '') "
        "ELSE __e END), '')"
    )
    for pat, rep in _POST_STEPS:
        x = f"regexp_replace({x}, {_sql_pat(pat)}, {_sql_rep(rep)}, 'g')"
    return x
