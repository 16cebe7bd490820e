"""Corpus scrubbing operators: PII redaction + boilerplate-line removal.

Two cleaning steps every large-scale training-data pipeline runs
between raw ingest and dedup (the reference has no analogue; these
extend the LLM-pipeline surface like operators/textstats.py):

- ``redact_pii``: regex redaction of emails / phone numbers / URLs /
  IPv4s as chained ``regexp_replace`` — per-row codegen at scan speed,
  no UDF; per-category hit counts surface via ``observe`` (O5-style
  counters) with no extra action.
- ``remove_boilerplate_lines``: drop lines that repeat across many
  documents (headers, footers, nav text — the CCNet-style step).
  Line-level document frequency over a line-hash groupBy, then the
  surviving lines are re-assembled per document in original order.

Scale notes: redaction shuffles nothing. Boilerplate removal is one
explode + one count shuffle on the line hash (uniform md5 keys) + one
re-aggregation partitioned by doc — the same two-shuffle shape as
wordcount, at any corpus size; the df threshold bounds nothing by
corpus size (hot lines are exactly what it removes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, functions as F

from ..functions.hashing import hash64
from .pinning import Pin

# deliberately simple, ASCII-safe patterns: the point is the operator
# shape (chained codegen regexes + counters), not regex completeness
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}

_REDACTION_ORDER = ("email", "url", "ipv4", "phone")  # url before phone: digits in urls


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    observation: Observation | None = None,
) -> DataFrame:
    """Replace each PII match with ``<CATEGORY>``; count hits per
    category (pre-redaction, on the original text) via ``observe``."""
    if observation is not None:
        counters = [
            F.sum(
                F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast(
                    "long"
                )
            ).alias(f"PII_{name.upper()}_HITS")
            for name, pat in PII_PATTERNS.items()
        ]
        df = df.observe(observation, *counters)
    out: Column = F.col(text_col)
    for name in _REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return df.withColumn(text_col, out)


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_max: int = 2,
    min_line_chars: int = 1,
) -> DataFrame:
    """Drop every line whose trimmed form appears in more than
    ``df_max`` distinct documents; re-assemble the remaining lines per
    document in their original order.

    Document frequency is computed on the md5-derived line hash, not
    the line text: the count shuffle moves 8-byte keys instead of full
    lines (and any SQL engine replays the same hash). Documents whose
    lines are all boilerplate survive with empty text — downstream
    quality filters own that decision.
    """
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__ln", "__line"),
    ).withColumn("__t", F.trim(F.col("__line")))
    kept_lines = lines.filter(F.length("__t") >= min_line_chars).withColumn(
        "__h", hash64(F.col("__t"))
    )
    hot = (
        kept_lines.groupBy("__h")
        .agg(F.count_distinct(id_col).alias("__df"))
        .filter(F.col("__df") > df_max)
        .select("__h")
    )
    survivors = kept_lines.join(hot, "__h", "left_anti")
    reassembled = (
        survivors.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__ln"), F.col("__line")))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    # Re-anchor on the full doc-id set: a document whose every line was
    # boilerplate has no surviving rows, and a groupBy over survivors
    # alone would silently drop it from the corpus. The left join keeps
    # the row with empty text so downstream quality filters — not this
    # operator — decide its fate.
    return df.select(id_col).join(reassembled, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def remove_repeated_spans(
    df: DataFrame,
    n: int = 8,
    df_max: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    pin: "Pin | None" = None,
) -> DataFrame:
    """Cross-document repeated TOKEN-SPAN removal — the substring-level
    rung of the dedup ladder (the shape of Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better" suffix-array dedup,
    re-expressed as n-gram span counting): every length-``n`` token
    window occurring in more than ``df_max`` distinct documents is cut
    from ALL of them; a token survives iff no hot window covers it.
    Finer-grained than ``remove_boilerplate_lines`` (line windows) and
    ``dedup.paragraph`` (fixed paragraphs): it catches boilerplate
    embedded mid-sentence at arbitrary offsets.

    Returns (id, text, n_removed) with ``text`` rebuilt from the
    surviving tokens (single-space joined — token-level reconstruction
    normalizes whitespace by contract, as in dedup_paragraphs).

    Plan shape, all codegen + one count shuffle: (1) per-doc window
    hashes as an in-row transform over the token array (map-only; only
    8-byte hashes + int positions ever leave the row); (2) one
    distinct-doc count keyed by window hash finds hot windows; (3) hot
    start positions come back as ONE sorted int array per doc (join +
    collect_list — array size = hot windows per doc, tiny); (4) the
    survivor filter is an indexed array lambda — token i is covered
    iff some hot start s satisfies s <= i <= s+n-1 — so reassembly
    never shuffles the corpus. At 100 TB: the window-count shuffle
    carries (hash, doc) pairs only, ~L rows per L-token document —
    same volume class as the shingle pipeline, partial-aggregated
    map-side; everything else rides the scan.

    ``pin`` (operators.pinning, default None = no pinning — unchanged
    failure semantics) materializes the two multi-consumer frames:
    the token arrays (read by the window pass and the final
    reassembly) and the window-hash frame (read by the hot count and
    the hot-position join) — without it the window hashing runs twice
    and the tokenization three times.

    Cost bound: the survivor filter is O(L * H) per document (L
    tokens, H hot window starts IN THAT DOC — a per-row array lambda,
    no shuffle). H is small for normal boilerplate fractions; the
    pathological case (H ~ L, a fully-templated long document) is a
    document that exact/near-dup dedup removes anyway — run this
    operator AFTER the dedup ladder, its position in a real pipeline.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    base = df.select(F.col(id_col), toks.alias("__t"))
    if pin is not None:
        base = pin(base)
    starts = F.when(
        F.size("__t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("__t") - n),
            lambda s: F.struct(
                s.alias("pos"),
                hash64(F.array_join(F.slice(F.col("__t"), s + 1, n), " ")).alias(
                    "h"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
    grams = base.select(id_col, F.explode(starts).alias("g")).select(
        id_col, F.col("g.pos").alias("pos"), F.col("g.h").alias("h")
    )
    if pin is not None:
        grams = pin(grams)
    hot = (
        grams.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") > df_max)
        .select("h")
    )
    hots_per_doc = (
        grams.join(hot, "h")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("pos")).alias("__hots"))
    )
    hots = F.coalesce(F.col("__hots"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("__t"),
        lambda x, i: ~F.exists(hots, lambda s: (s <= i) & (i <= s + F.lit(n - 1))),
    )
    return (
        base.join(hots_per_doc, id_col, "left")
        .select(
            id_col,
            F.array_join(kept, " ").alias(text_col),
            (F.size("__t") - F.size(kept)).cast("long").alias("n_removed"),
        )
    )
