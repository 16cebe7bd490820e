"""Corpus-scrubbing driver queries (operators/scrub.py + operators/
decontam.py; pytest-only until round 6).

Six cleaning legs in one tagged union, each exactly SQL-replayable:

- ``redact``: the synthetic corpus carries no PII, so the leg PLANTS a
  deterministic suffix per document (email + URL + IPv4 + phone, all
  derived from doc_id) and then runs the production redaction chain —
  the oracle replays both the plant and the four regexp_replace
  passes, so the hash check verifies the actual regex semantics, not
  an identity transform.
- ``boilerplate``: the corpus has no newlines, so (as in
  dedup_paragraphs) fixed 32-word windows joined by newlines stand in
  as lines; cross-document line frequency on the md5-derived hash
  removes every line appearing in more than ``df_max`` distinct docs.
- ``decontam``: benchmark decontamination — docs sharing any 8-word
  shingle with the "benchmark" (doc_id < 5 stands in for an eval set)
  are flagged; the eval docs flag themselves by construction, plus
  any near-duplicates of them.
- ``semdecontam``: the embedding rung — docs cosine-near any
  benchmark embedding (vec_id < 20 stands in), broadcast nested-loop
  with the exact-integer quantized cosine; catches paraphrased
  leakage no shingle ever would.
- ``spans``: cross-document repeated token-span removal (see the leg
  doc below).
- ``splitleak``: near-dup leakage across the deterministic train/test
  split (decontam.split_leakage) — test docs whose exact
  shingle-Jaccard with some train doc clears the dedup threshold, via
  the banded minhash machinery the dedup_minhash_lsh oracle already
  replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import hash64_duckdb_sql
from ..operators.extract import html_to_text, html_to_text_duckdb_sql
from ..operators.scrub import redact_pii, remove_boilerplate_lines
from ..registry import query, t
from .llm_dedup import (
    _PARA_CTE,
    _PARA_WORDS,
    _QVEC_CTE,
    _SIG_CTE,
    _band_selects_from,
)

_BOILER_DF_MAX = 1   # windows appearing in >1 distinct docs are removed
_DECONTAM_N = 8      # shingle length for contamination
_BENCH_MAX_ID = 5    # documents with doc_id < 5 stand in for the eval set
_SEM_BENCH_MAX = 20  # embeddings with vec_id < 20 stand in for the eval set
_SEM_T = 0.35        # semantic-contamination cosine threshold
# (the dedup_embedding_cosine row's threshold: flags the eval
# stand-ins plus their planted near-duplicates)
_SPAN_N = 8          # repeated-span window length (raw whitespace tokens)
_SPAN_DF_MAX = 1     # spans in >1 distinct docs are cut from all of them
_LEAK_FRACTION = 0.3  # test-side fraction of the deterministic split
_LEAK_SALT = "split"  # train_test_split's default salt semantics
_LEAK_J = 0.5         # exact shingle-Jaccard leakage threshold
_LEAK_THR = int(round(_LEAK_FRACTION * 1_000_000))  # ppm bucket cut

# Split-leakage replay: the md5 ppm split bucket lands on the banded
# minhash signatures (sig/bands from _SIG_CTE — the SAME CTEs the
# dedup_minhash_lsh oracle replays), test bands equi-join train bands,
# candidates verify by exact shingle Jaccard.
_LEAK_BKT = hash64_duckdb_sql(
    f"concat('{_LEAK_SALT}:', CAST(doc_id AS VARCHAR))"
)
_LEAK_CTES = f"""
lbands AS ({_band_selects_from('sig')}),
lb AS (SELECT doc_id, band, band_sig, {_LEAK_BKT} % 1000000 AS bkt
       FROM lbands),
lcand AS (SELECT DISTINCT t.doc_id AS id_a, r.doc_id AS id_b
          FROM lb t JOIN lb r
            ON t.band = r.band AND t.band_sig = r.band_sig
          WHERE t.bkt < {_LEAK_THR} AND r.bkt >= {_LEAK_THR}),
lsz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
lint AS (SELECT c.id_a, c.id_b, count(*) AS inter
         FROM lcand c
         JOIN sh sa ON sa.doc_id = c.id_a
         JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
         GROUP BY c.id_a, c.id_b),
lleak AS (SELECT i.id_a AS doc_id, count(DISTINCT i.id_b) AS n_removed
          FROM lint i
          JOIN lsz na ON na.doc_id = i.id_a
          JOIN lsz nb ON nb.doc_id = i.id_b
          WHERE CAST(i.inter AS DOUBLE) /
                CAST(na.n + nb.n - i.inter AS DOUBLE) >= {_LEAK_J}
          GROUP BY i.id_a)
"""

# repeated token-span removal replay: window hashes per start position,
# hot-window distinct-doc count, covered-index filter (DuckDB lambda
# index is 1-BASED — hence the i-1 — where Spark's is 0-based)
_SPAN_HASH = hash64_duckdb_sql(
    f"array_to_string(list_slice(t, s+1, s+{_SPAN_N}), ' ')"
)
_SPANS_CTE = rf"""
stok AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                    w -> w != '') AS t
         FROM documents),
sgr AS (SELECT doc_id, unnest(CASE WHEN len(t) >= {_SPAN_N} THEN
          list_transform(range(0, len(t)-{_SPAN_N}+1),
                         s -> struct_pack(pos := s, h := {_SPAN_HASH}))
        ELSE [] END) AS g FROM stok),
shot AS (SELECT g.h AS h FROM sgr GROUP BY g.h
         HAVING count(DISTINCT doc_id) > {_SPAN_DF_MAX}),
shp AS (SELECT doc_id, list_sort(array_agg(g.pos)) AS hots FROM sgr
        WHERE g.h IN (SELECT h FROM shot) GROUP BY doc_id),
scl AS (SELECT s.doc_id, t,
          list_filter(t, (x, i) -> NOT len(list_filter(
            coalesce(hots, CAST([] AS BIGINT[])),
            hs -> hs <= i-1 AND i-1 <= hs + {_SPAN_N - 1})) > 0) AS kept
        FROM stok s LEFT JOIN shp USING (doc_id))
"""

# 8-gram shingles over the normalized-word chain (wf from _WORDS_CTE):
# lead() per offset, exactly the k=3 pattern of _SHINGLE_CTE widened.
_LEADS8 = ",\n        ".join(
    f"lead(word, {i}) OVER (PARTITION BY doc_id ORDER BY ord) AS w{i}"
    for i in range(1, _DECONTAM_N)
)
_SH8_CONCAT = " || ' ' || ".join(
    ["word"] + [f"w{i}" for i in range(1, _DECONTAM_N)]
)
_SH8_CTE = f"""
led8 AS (SELECT doc_id, word,
        {_LEADS8}
        FROM wf),
sh8 AS (SELECT DISTINCT doc_id, {_SH8_CONCAT} AS shingle
        FROM led8 WHERE w{_DECONTAM_N - 1} IS NOT NULL)
"""

# Planted-HTML fixture for the html leg: the synthetic corpus is plain
# text, so each document is wrapped in a deterministic full HTML page
# (head block with title/style, a body-level script, a comment, block
# elements, all six named entities, decodable (&#233;) / out-of-range
# (&#8364;) / hex (&#x27;) numeric refs, <br>, a list). BOTH the Spark
# plant and the oracle plant are generated from this one segment table,
# and both sides then run their own extraction chain — the hash match
# verifies the real regex/entity semantics end to end.
_HTML_SEGS: tuple[tuple[str, str | None], ...] = (
    ("<!DOCTYPE html><html><head><title>T", "ID"),
    (
        '</title><style type="text/css">p {color: red}</style></head>'
        "<body><script>var x = 1 < 2;</script><!-- hidden ",
        "ID",
    ),
    (" --><h1>Doc ", "ID"),
    ("</h1><p>", "TEXT"),
    (
        '</p><div class="c">A &amp; B &lt;i&gt; &quot;Q&quot; it&apos;s '
        "caf&#233; &#8364;9 &#x27;hex 100&nbsp;%</div><br><ul><li>one</li>"
        "<li>item ",
        "ID",
    ),
    ("</li></ul></body></html>", None),
)


def _html_plant_spark():
    did = F.col("doc_id").cast("string")
    cols = []
    for lit, tok in _HTML_SEGS:
        cols.append(F.lit(lit))
        if tok == "ID":
            cols.append(did)
        elif tok == "TEXT":
            cols.append(F.col("text"))
    return F.concat(*cols)


def _html_plant_sql() -> str:
    parts = []
    for lit, tok in _HTML_SEGS:
        parts.append("'" + lit.replace("'", "''") + "'")
        if tok == "ID":
            parts.append("CAST(doc_id AS VARCHAR)")
        elif tok == "TEXT":
            parts.append("text")
    return " || ".join(parts)


# deterministic planted-PII suffix, replayed verbatim by the oracle
_PII_SUFFIX_SQL = (
    "' d' || CAST(doc_id AS VARCHAR) || '@ex.com https://ex.com/' || "
    "CAST(doc_id AS VARCHAR) || ' 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) || "
    "' +1 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

# the production patterns + order from operators.scrub (email, url,
# ipv4, phone), applied with the 'g' flag (DuckDB replaces only the
# first match by default; Spark replaces all)
_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(text, "
    r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    r"'https?://[^\s]+', '<URL>', 'g'), "
    r"'\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g'), "
    r"'\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g')"
)


@query(
    "scrub_shapes",
    f"""
WITH {_SIG_CTE},
{_SH8_CTE},
{_PARA_CTE},
{_SPANS_CTE},
{_LEAK_CTES},
{_QVEC_CTE.strip()},
pii AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS text FROM documents),
hraw AS (SELECT doc_id, {_html_plant_sql()} AS text FROM documents),
hext AS (SELECT doc_id, {html_to_text_duckdb_sql('text')} AS text FROM hraw),
nfc_seed AS (SELECT doc_id,
       CASE WHEN doc_id % 3 = 0
            THEN text || CASE WHEN doc_id % 2 = 0
                              THEN ' caf' || chr(233)
                              ELSE ' cafe' || chr(769) END
            ELSE text END AS text
       FROM documents),
red AS (SELECT doc_id, {_REDACT_SQL} AS text FROM pii),
hot AS (SELECT {hash64_duckdb_sql('para')} AS h FROM ch
        GROUP BY {hash64_duckdb_sql('para')}
        HAVING count(DISTINCT doc_id) > {_BOILER_DF_MAX}),
surv AS (SELECT doc_id, pn, para FROM ch
         WHERE {hash64_duckdb_sql('para')} NOT IN (SELECT h FROM hot)),
reb AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY pn) AS text
        FROM surv GROUP BY doc_id),
bsh AS (SELECT DISTINCT shingle FROM sh8 WHERE doc_id < {_BENCH_MAX_ID}),
bad AS (SELECT DISTINCT s.doc_id FROM sh8 s JOIN bsh USING (shingle)),
sem_bad AS (SELECT DISTINCT d.vec_id
            FROM nv d JOIN nv b ON b.vec_id < {_SEM_BENCH_MAX}
            WHERE d.nq > 0 AND b.nq > 0
              AND list_dot_product(d.qv, b.qv) / (sqrt(d.nq) * sqrt(b.nq))
                  >= {_SEM_T})
SELECT 'redact' AS leg, doc_id, text, CAST(NULL AS BIGINT) AS n_removed
FROM red
UNION ALL
SELECT 'boilerplate' AS leg, nz.doc_id, coalesce(reb.text, '') AS text,
       CAST(NULL AS BIGINT) AS n_removed
FROM nz LEFT JOIN reb USING (doc_id)
UNION ALL
SELECT 'decontam' AS leg, doc_id, CAST(NULL AS VARCHAR) AS text,
       CAST(NULL AS BIGINT) AS n_removed
FROM bad
UNION ALL
SELECT 'semdecontam' AS leg, vec_id AS doc_id,
       CAST(NULL AS VARCHAR) AS text, CAST(NULL AS BIGINT) AS n_removed
FROM sem_bad
UNION ALL
SELECT 'spans' AS leg, doc_id,
       coalesce(array_to_string(kept, ' '), '') AS text,
       CAST(len(t) - len(kept) AS BIGINT) AS n_removed
FROM scl
UNION ALL
SELECT 'splitleak' AS leg, doc_id, CAST(NULL AS VARCHAR) AS text,
       CAST(n_removed AS BIGINT) AS n_removed
FROM lleak
UNION ALL
SELECT 'nfc' AS leg, doc_id, nfc_normalize(text) AS text,
       CAST(NULL AS BIGINT) AS n_removed
FROM nfc_seed
UNION ALL
SELECT 'html' AS leg, doc_id, text, CAST(NULL AS BIGINT) AS n_removed
FROM hext
""",
    doc="Corpus scrubbing as an eight-leg tagged union (operators/scrub"
    ".py + operators/decontam.py + operators/extract.py). html leg "
    "(r13): html_to_text — the pipeline-head markup extraction every "
    "web corpus needs; the plain-text corpus is wrapped in a "
    "deterministic full HTML page (head/style/script blocks, comment, "
    "block elements, named + decodable/out-of-range/hex numeric "
    "entities, <br>, list — one shared segment table plants BOTH "
    "sides) and the oracle replays the whole chained-regexp extraction "
    "(comment/head/script/style strip, block tags -> newlines, tag "
    "strip, Latin-1 numeric + named entity decode, whitespace "
    "normalize) bit-for-bit; map-only, zero shuffles, generated from "
    "the same step table as the Spark chain so the sides cannot "
    "drift. nfc leg (r10): normalize_unicode_"
    "text — the pre-dedup Unicode NFC pass; the synthetic corpus is "
    "ASCII, so the leg PLANTS composed (U+00E9) and decomposed "
    "(e+U+0301) café suffixes on every third doc and the oracle "
    "replays plant + DuckDB nfc_normalize, verifying BOTH the real "
    "normalization on the seeded rows and the ASCII fast path (a "
    "JVM RLIKE gate feeds only non-ASCII rows to the Arrow stage; "
    "ASCII rows must pass through byte-identical). "
    "splitleak leg (r9): split_leakage — "
    f"near-dup leakage across the deterministic {_LEAK_FRACTION} "
    "train/test md5-ppm split (test docs whose exact shingle-Jaccard "
    f"with a train doc >= {_LEAK_J}, found via the SAME banded minhash "
    "machinery as dedup_minhash_lsh: one signature build, band "
    "equi-join of test bands against train bands, exact verify on "
    "candidates only — content never rides the cross join; the oracle "
    "replays bucket, bands and Jaccard bit-for-bit). "
    " + operators/decontam.py, pytest-only until r6; spans leg r8; "
    "semdecontam leg r8 final — semantic_contaminated_ids over the "
    f"embeddings table, vec_id<{_SEM_BENCH_MAX} stands in for the eval "
    "set, broadcast nested-loop with the exact-integer quantized cosine "
    f"at threshold {_SEM_T}; the oracle replays the identical quantize/"
    "dot/sqrt expression tree so the >= compare is bit-consistent). "
    f"spans leg: cross-document repeated {_SPAN_N}-token-span removal "
    "(remove_repeated_spans — the substring-level dedup rung, Lee et "
    "al. shape): hot windows found by ONE distinct-doc count over "
    "in-row window hashes, survivors via an indexed covered-position "
    "array lambda; only 8-byte hashes + int positions ever shuffle. "
    "redact leg: "
    "deterministic planted PII (email/URL/IPv4/phone from doc_id) "
    "through the production 4-pass regexp_replace chain — per-row "
    "codegen, zero shuffles, and the oracle replays plant + redaction "
    "so the hash verifies real regex semantics. boilerplate leg: "
    "32-word windows as stand-in lines (break-free corpus), lines in "
    f">{_BOILER_DF_MAX} distinct docs removed via an md5-hash df count "
    "— only 8-byte hashes ride the count shuffle. decontam leg: docs "
    f"sharing any {_DECONTAM_N}-word shingle with the doc_id<"
    f"{_BENCH_MAX_ID} eval stand-in — benchmark shingles broadcast, "
    "corpus side is a map-side semi-join (one scan, no corpus "
    "shuffle).",
)
def q_scrub_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_documents
    from ..operators.decontam import contaminated_ids
    from ..operators.scrub import remove_repeated_spans

    docs = t(spark, sf_dir, "documents")
    nul_b = F.lit(None).cast("long")

    did = F.col("doc_id").cast("string")
    suffix = F.concat(
        F.lit(" d"), did, F.lit("@ex.com https://ex.com/"), did,
        F.lit(" 10.0.0."), (F.col("doc_id") % 250).cast("string"),
        F.lit(" +1 555-010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    planted = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    red_leg = redact_pii(planted).select(
        F.lit("redact").alias("leg"), "doc_id", "text",
        nul_b.alias("n_removed"),
    )

    # _PARA_WORDS keeps this in lockstep with the imported _PARA_CTE
    # oracle — a literal here would silently desync if that constant moves
    ch = chunk_documents(docs, chunk_words=_PARA_WORDS, overlap=0)
    lined = ch.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
            "\n",
        ).alias("text")
    )
    boiler_leg = remove_boilerplate_lines(
        lined, df_max=_BOILER_DF_MAX
    ).select(
        F.lit("boilerplate").alias("leg"), "doc_id", "text",
        nul_b.alias("n_removed"),
    )

    bench = docs.filter(F.col("doc_id") < _BENCH_MAX_ID)
    dec_leg = contaminated_ids(docs, bench, n=_DECONTAM_N).select(
        F.lit("decontam").alias("leg"),
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        nul_b.alias("n_removed"),
    )

    from ..operators.decontam import semantic_contaminated_ids

    emb = t(spark, sf_dir, "embeddings")
    sem_leg = semantic_contaminated_ids(
        emb,
        emb.filter(F.col("vec_id") < _SEM_BENCH_MAX).select("embedding"),
        threshold=_SEM_T,
        id_col="vec_id",
    ).select(
        F.lit("semdecontam").alias("leg"),
        F.col("vec_id").alias("doc_id"),
        F.lit(None).cast("string").alias("text"),
        nul_b.alias("n_removed"),
    )
    from ..operators.pinning import lazy_checkpoint

    span_leg = remove_repeated_spans(
        docs, n=_SPAN_N, df_max=_SPAN_DF_MAX, pin=lazy_checkpoint
    ).select(F.lit("spans").alias("leg"), "doc_id", "text", "n_removed")

    from ..operators.decontam import split_leakage

    leak_leg = split_leakage(
        docs,
        test_fraction=_LEAK_FRACTION,
        salt=_LEAK_SALT,
        threshold=_LEAK_J,
        pin=lazy_checkpoint,
    ).select(
        F.lit("splitleak").alias("leg"),
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.col("n_train_dups").alias("n_removed"),
    )
    from ..functions.text import normalize_unicode_text

    # the corpus is ASCII, so plant composed/decomposed café suffixes on
    # every third doc: the Arrow stage sees only those rows (fast-path
    # gate), the rest must ride through byte-identical
    nfc_suffix = F.when(
        F.col("doc_id") % 2 == 0, F.lit(" caf\u00e9")
    ).otherwise(F.lit(" cafe\u0301"))
    seeded = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat("text", nfc_suffix))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    nfc_leg = normalize_unicode_text(seeded).select(
        F.lit("nfc").alias("leg"), "doc_id", "text", nul_b.alias("n_removed")
    )
    hplanted = docs.select("doc_id", _html_plant_spark().alias("text"))
    html_leg = html_to_text(hplanted).select(
        F.lit("html").alias("leg"), "doc_id", "text",
        nul_b.alias("n_removed"),
    )
    return (
        red_leg.unionByName(boiler_leg)
        .unionByName(dec_leg)
        .unionByName(sem_leg)
        .unionByName(span_leg)
        .unionByName(leak_leg)
        .unionByName(nfc_leg)
        .unionByName(html_leg)
    )
