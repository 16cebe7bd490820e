"""Text-analysis + multimodal queries (BASELINE.json north-star; SURVEY §7.2 v5).

Oracles inline the same stopword lists / regexes / score formula as
the Spark operators (operators.textstats), with identical expression
trees so double outputs are bitwise-equal. ``multimodal_features`` is
the one rows-only query here: its byte-level features come from a
mapInPandas stage DuckDB can't replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import extract_features, with_binary_payload
from ..operators.textstats import (
    BPE_ISH_RE,
    STOPWORDS,
    language_id,
    quality_features,
    token_counts,
)
from ..functions.hashing import hash64_duckdb_sql
from ..registry import query, t
from .llm_dedup import _QVEC_CTE

# DuckDB fragment: normalized token list (same pipeline as
# functions.text.normalized_tokens).
_TOKS = (
    r"list_filter(list_transform(regexp_split_to_array(text, '\s+'), "
    r"x -> regexp_replace(lower(x), '[^a-z]', '', 'g')), w -> length(w) > 0)"
)


def _in_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


def _hits(lang: str) -> str:
    return f"CAST(len(list_filter(toks, w -> w IN ({_in_list(lang)}))) AS BIGINT)"


def _ngram_sql(n: int) -> str:
    """DuckDB word-n-gram list over ``toks`` (empty when too short),
    mirroring operators.textstats._ngrams."""
    join = " || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(n))
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n - 1} + 1), i -> {join}) "
        f"ELSE [] END"
    )


def _top_ngram_frac_sql(n: int) -> str:
    g = f"g{n}"
    return (
        f"CAST(list_max(list_transform(list_distinct({g}), "
        f"x -> len(list_filter({g}, y -> y = x)))) AS DOUBLE) "
        f"/ CAST(nullif(len({g}), 0) AS DOUBLE)"
    )


@query(
    "text_quality",
    f"""
WITH tk AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_words,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
    / CAST(nullif(len(toks), 0) AS DOUBLE) AS avg_word_len,
  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
    / CAST(nullif(length(text), 0) AS DOUBLE) AS alpha_ratio,
  CAST(len(list_filter(toks, w -> w IN ({_in_list('en')}))) AS DOUBLE)
    / CAST(nullif(len(toks), 0) AS DOUBLE) AS stopword_ratio,
  0.5 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / CAST(nullif(length(text), 0) AS DOUBLE))
  + 0.3 * (CAST(len(list_filter(toks, w -> w IN ({_in_list('en')}))) AS DOUBLE)
           / CAST(nullif(len(toks), 0) AS DOUBLE))
  + 0.2 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) AS quality_score,
  1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
    / CAST(nullif(len(toks), 0) AS DOUBLE) AS dup_word_frac,
  {_top_ngram_frac_sql(2)} AS top_bigram_frac,
  {_top_ngram_frac_sql(3)} AS top_trigram_frac
FROM (SELECT *, {_ngram_sql(2)} AS g2, {_ngram_sql(3)} AS g3 FROM tk)
""",
    doc="Per-doc quality features + composite score (alpha/stopword/length "
    "mix) + Gopher-style repetition signals: duplicate-word fraction and "
    "top bi-/tri-gram coverage — all per-row codegen array expressions, "
    "no shuffle, no UDF.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_features(t(spark, sf_dir, "documents"))


@query(
    "text_profiles",
    rf"""
WITH tk AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
  {_hits('en')} AS en_hits, {_hits('de')} AS de_hits,
  {_hits('fr')} AS fr_hits, {_hits('es')} AS es_hits,
  CASE
    WHEN {_hits('en')} >= {_hits('de')} AND {_hits('en')} >= {_hits('fr')}
         AND {_hits('en')} >= {_hits('es')} THEN 'en'
    WHEN {_hits('de')} >= {_hits('fr')} AND {_hits('de')} >= {_hits('es')} THEN 'de'
    WHEN {_hits('fr')} >= {_hits('es')} THEN 'fr'
    ELSE 'es'
  END AS pred_lang,
  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')) AS BIGINT)
    AS n_ws_tokens,
  CAST(len(toks) AS BIGINT) AS n_norm_words,
  CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS BIGINT) AS n_bpe_ish,
  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS est_tokens_char4
FROM tk
""",
    doc="Per-document language + tokenization profile (merges the former "
    "lang_id / token_stats rows, round 6 — both are per-doc codegen "
    "projections over the same scan, joined on doc_id into one wide "
    "row). Stopword-vote language ID (en/de/fr/es, fixed tie "
    "precedence) plus token-count estimators (whitespace, BPE-ish "
    "regex pieces, chars/4). Shuffle count: the operators compose as "
    "two shuffle-free projections + one equi-join on the id; inlining "
    "both expression sets into a single select is the zero-join "
    "production form.",
)
def q_text_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return language_id(docs).join(token_counts(docs), "doc_id")


@query(
    "multimodal_features",
    """
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(coalesce(list_sum(list_transform(split(text, ''), c -> ascii(c))), 0)
       % 2147483648 AS BIGINT) AS byte_sum,
  md5(substring(text, 1, 16)) AS head_md5,
  md5(text) AS payload_md5,
  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS modality,
  CAST(doc_id % 64 * 16 AS INTEGER) AS width,
  CAST(doc_id % 48 * 16 AS INTEGER) AS height,
  CAST((doc_id % 30 + 1) * 1000 AS INTEGER) AS duration_ms
FROM documents
WHERE octet_length(encode(text)) = length(text)
""",
    doc="Arrow-batched feature extraction over binary payloads plus the typed "
    "metadata surface (decode step stubbed; see operators.multimodal). The "
    "oracle replays the byte stats char-wise, valid only for pure-ASCII "
    "text (byte == char); the WHERE octet_length = length guard makes a "
    "non-ASCII corpus fail LOUDLY as a row-count mismatch instead of a "
    "silent hash diff, and coalesce pins byte_sum = 0 for empty documents "
    "(DuckDB's list_sum over [] is NULL; the operator returns 0).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(with_binary_payload(t(spark, sf_dir, "documents")))


# BM25 scoring CTE chain ending in ``bm25`` (doc_id, n_terms_hit,
# score_micro) — shared by bm25_search and the rrf_fuse lexical leg.
_BM25_CTES = """toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    corpus AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM toks
    ),
    tf AS (
      SELECT doc_id, term,
             CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf, dl
      FROM toks
      CROSS JOIN (SELECT unnest(['spark', 'join', 'query']) AS term) terms
      WHERE len(list_filter(toks, x -> x = term)) > 0
    ),
    dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             floor(((n_docs - df + 0.5) / (df + 0.5))
                   * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
                      / (CAST(tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))
                   * 1000000.0) AS score_micro_term
      FROM tf JOIN dfreq USING (term) CROSS JOIN corpus
    ),
    bm25 AS (
    SELECT doc_id, count(*) AS n_terms_hit,
           CAST(sum(score_micro_term) AS BIGINT) AS score_micro
    FROM scored GROUP BY doc_id
    )"""


_PHRASE = "Fast, scan!"  # normalizes to [fast, scan] — exercises the
# query-side normalization contract (punctuation/case must not miss)


@query(
    "lexical_search",
    oracle=rf"""
    WITH {_BM25_CTES},
    bm_top AS (
      SELECT doc_id, n_terms_hit, score_micro
      FROM bm25
      ORDER BY score_micro DESC, doc_id
      LIMIT 50
    ),
    pnorm AS (
      SELECT doc_id, list_filter(list_transform(regexp_split_to_array(text, '\s+'),
                     w -> regexp_replace(lower(w), '[^a-z]', '', 'g')), w -> w <> '') AS t
      FROM documents
    ),
    ptoks AS (
      SELECT doc_id, unnest(t) AS word, unnest(range(len(t))) AS pos FROM pnorm
    ),
    phrase AS (
      SELECT t0.doc_id, CAST(count(*) AS INT) AS n_hits
      FROM ptoks t0 JOIN ptoks t1
        ON t1.doc_id = t0.doc_id AND t1.word = 'scan' AND t1.pos = t0.pos + 1
      WHERE t0.word = 'fast'
      GROUP BY t0.doc_id
    )
    SELECT 'bm25' AS leg, doc_id, n_terms_hit, score_micro,
           CAST(NULL AS INT) AS n_hits
    FROM bm_top
    UNION ALL
    SELECT 'phrase' AS leg, doc_id, CAST(NULL AS BIGINT) AS n_terms_hit,
           CAST(NULL AS BIGINT) AS score_micro, n_hits
    FROM phrase
    """,
    doc="Lexical retrieval two-leg tagged union (merges the former "
    "bm25_search + phrase_search rows, round 8 — both are posting-list "
    "retrieval over the same documents scan; the merge frees a "
    "registry slot inside the driver's 50-row cap for the "
    "quality_gate row). bm25 leg: BM25 top-50 keyword search "
    "(operators/ranking.py) — one corpus scan, per-(doc,term) tf from "
    "a broadcast 3-term literal join + codegen size(filter()) lambda "
    "(no token explode, no corpus shuffle), tiny df/corpus aggregates "
    "broadcast back, one TakeOrderedAndProject; log-free RSJ idf and "
    "per-term scores floored to integer micro-units BEFORE the "
    "per-doc sum so accumulation order cannot change the result. "
    "phrase leg: exact phrase query over the positional inverted "
    "index (operators/inverted_index.py:phrase_search — the WHERE "
    "upgrade of the reference's doc-set index, "
    "TraceInsertIndexReducer.java:132-145): per-word position arrays "
    "shifted by phrase offset and intersected, joins bounded by "
    "phrase length, never the corpus; query terms pass the index-side "
    "normalization, pinned with a punctuated mixed-case phrase.",
)
def q_lexical_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.inverted_index import phrase_search
    from ..operators.pinning import lazy_checkpoint
    from ..operators.ranking import bm25_topk

    docs = t(spark, sf_dir, "documents")
    bm = bm25_topk(
        docs, spark, ["spark", "join", "query"], k=50, pin=lazy_checkpoint
    )
    nul_b = F.lit(None).cast("bigint")
    bm_leg = bm.select(
        F.lit("bm25").alias("leg"), "doc_id", "n_terms_hit", "score_micro",
        F.lit(None).cast("int").alias("n_hits"),
    )
    ph_leg = phrase_search(docs, _PHRASE).select(
        F.lit("phrase").alias("leg"), "doc_id",
        nul_b.alias("n_terms_hit"), nul_b.alias("score_micro"),
        F.col("n_hits").cast("int").alias("n_hits"),
    )
    return bm_leg.unionByName(ph_leg)


_RRF_K0 = 60   # reciprocal-rank fusion constant
_RRF_K = 20    # fused list depth
_RRF_LEG_K = 50  # per-ranker list depth fed into fusion


@query(
    "rrf_fuse",
    oracle=f"""
    WITH {_BM25_CTES},
    lex AS (SELECT CAST(0 AS BIGINT) AS query_id, CAST(doc_id AS BIGINT) AS cand_id, rank
            FROM (SELECT doc_id,
                         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank
                  FROM bm25)
            WHERE rank <= {_RRF_LEG_K}),
    {_QVEC_CTE.strip().rstrip()},
    ann AS (SELECT query_id, cand_id, rank FROM (
              SELECT CAST(q.vec_id AS BIGINT) AS query_id,
                     CAST(c.vec_id AS BIGINT) AS cand_id,
                     row_number() OVER (
                       ORDER BY list_dot_product(q.qv, c.qv)
                                / (sqrt(q.nq) * sqrt(c.nq)) DESC, c.vec_id) AS rank
              FROM nv q JOIN nv c ON c.vec_id != q.vec_id
              WHERE q.vec_id = 0)
            WHERE rank <= {_RRF_LEG_K}),
    uni AS (SELECT query_id, cand_id,
                   CAST(floor(1000000000.0 / ({_RRF_K0}.0 + CAST(rank AS DOUBLE)))
                        AS BIGINT) AS c
            FROM lex
            UNION ALL
            SELECT query_id, cand_id,
                   CAST(floor(1000000000.0 / ({_RRF_K0}.0 + CAST(rank AS DOUBLE)))
                        AS BIGINT) AS c
            FROM ann),
    sc AS (SELECT query_id, cand_id, count(*) AS n_lists,
                  CAST(sum(c) AS BIGINT) AS rrf_micro
           FROM uni GROUP BY query_id, cand_id)
    SELECT query_id, cand_id, n_lists, rrf_micro, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_micro DESC, cand_id) AS rank
          FROM sc)
    WHERE rank <= {_RRF_K}
    """,
    doc="Hybrid-search reciprocal-rank fusion end-to-end (operators/"
    "ranking.py:rrf_fuse; r5 pytest-only, driver-verified r6): the "
    f"BM25 top-{_RRF_LEG_K} lexical list for the 3-term keyword query "
    f"and the exact-cosine top-{_RRF_LEG_K} embedding neighbors of "
    "vector 0 (doc ids and vec ids share the key domain) fuse as "
    f"score = sum(1e9 // ({_RRF_K0} + rank)) — contributions floored "
    "to integer nano-units BEFORE summing so accumulation order can "
    "never change the fused ranking. Scale: fusion touches only the "
    "two top-k lists (one groupBy + one tiny window) — no corpus "
    "access; each input ranker keeps its own scale story.",
)
def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..operators.pinning import lazy_checkpoint
    from ..operators.ranking import bm25_topk, rrf_fuse
    from ..operators.similarity import brute_force_topk

    docs = t(spark, sf_dir, "documents")
    lex = bm25_topk(
        docs, spark, ["spark", "join", "query"], k=_RRF_LEG_K, pin=lazy_checkpoint
    )
    wl = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    lex_r = lex.select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("cand_id"),
        F.row_number().over(wl).alias("rank"),
    )

    emb = t(spark, sf_dir, "embeddings")
    ann = brute_force_topk(
        emb, emb.select("vec_id").filter(F.col("vec_id") == 0), k=_RRF_LEG_K
    ).select(
        F.col("query_id").cast("long"),
        F.col("cand_id").cast("long"),
        "rank",
    )
    return rrf_fuse([lex_r, ann], k=_RRF_K, k0=_RRF_K0)


_FUZZY_TOKS = (
    r"list_filter(list_transform(regexp_split_to_array({col}, '\s+'), "
    r"w -> regexp_replace(lower(w), '[^a-z]', '', 'g')), w -> w <> '')"
)

@query(
    "text_mining",
    rf"""
WITH words AS (
  SELECT unnest({_FUZZY_TOKS.format(col='text')}) AS w FROM documents
  UNION ALL
  SELECT unnest({_FUZZY_TOKS.format(col='p_name')}) AS w FROM part
),
vocab AS (SELECT DISTINCT w FROM words),
variants AS (
  SELECT w, w AS v FROM vocab
  UNION
  SELECT w, substr(w, 1, CAST(i AS INT) - 1) || substr(w, CAST(i AS INT) + 1) AS v
  FROM vocab, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
),
pairs AS (
  SELECT DISTINCT a.w AS a, b.w AS b
  FROM variants a JOIN variants b ON a.v = b.v AND a.w < b.w
),
verified AS (SELECT a, b FROM pairs WHERE levenshtein(a, b) <= 1),
counts AS (SELECT w, count(*) AS n FROM words GROUP BY w),
edges AS (SELECT a, b FROM verified UNION ALL SELECT b AS a, a AS b FROM verified),
scored AS (
  SELECT e.a, e.b, ca.n AS n_a, cb.n AS n_b
  FROM edges e JOIN counts ca ON ca.w = e.a JOIN counts cb ON cb.w = e.b
  WHERE cb.n >= 4 * ca.n
),
best AS (
  SELECT a, b, n_a, n_b,
         row_number() OVER (PARTITION BY a ORDER BY n_b DESC, b DESC) AS rn
  FROM scored
),
norm AS (
  SELECT {_FUZZY_TOKS.format(col='text')} AS t FROM documents
),
dtoks AS (SELECT unnest(t) AS w FROM norm),
uni AS (SELECT w, count(*) AS n_w FROM dtoks GROUP BY w),
big AS (
  SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM norm WHERE len(t) >= 2
),
bc AS (SELECT w1, w2, count(*) AS n_pair FROM big GROUP BY w1, w2
       HAVING count(*) >= 5),
colloc AS (
  SELECT bc.w1, bc.w2, bc.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2
  FROM bc JOIN uni u1 ON u1.w = bc.w1 JOIN uni u2 ON u2.w = bc.w2
  ORDER BY bc.n_pair DESC, bc.w1, bc.w2
  LIMIT 50
)
SELECT 'pairs' AS leg, a, b, CAST(NULL AS BIGINT) AS n_pair,
       CAST(NULL AS BIGINT) AS n_a, CAST(NULL AS BIGINT) AS n_b
FROM verified
UNION ALL
SELECT 'typo' AS leg, a, b, CAST(NULL AS BIGINT) AS n_pair, n_a, n_b
FROM best WHERE rn = 1
UNION ALL
SELECT 'colloc' AS leg, w1 AS a, w2 AS b, n_pair, n_w1 AS n_a, n_w2 AS n_b
FROM colloc
""",
    doc="Vocabulary-mining three-leg tagged union (merges the former "
    "fuzzy_match + collocations rows, round 8 — both are small-output "
    "word-pair statistics over the same normalized token stream; the "
    "merge frees a registry slot inside the driver's 50-row cap for "
    "the bpe row). pairs leg: SymSpell symmetric-delete blocking over "
    "the documents+part vocabulary — every string posts itself plus "
    "its single-char deletions, candidates from a linear-fan-out "
    "equi-join on the variant, JVM levenshtein removes collisions "
    "(operators/fuzzy.py; never the O(n^2) cross join). typo leg: "
    "rare->frequent correction table (canonical neighbor with >= 4x "
    "the count; ties to highest count then lexicographically "
    "greatest). colloc leg: top-50 adjacent-word bigrams by exact "
    "count with unigram counts attached (operators/textstats.py:"
    "collocations_pmi — in-row adjacent transform, no posexplode "
    "blow-up, TakeOrderedAndProject; the ln()-based PMI floats are "
    "libm-dependent so the driver row carries the exact integers they "
    "derive from, float step pytest-gated in tests/test_textstats.py).",
)
def q_text_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import normalized_tokens
    from ..operators.fuzzy import symdelete_pairs, typo_clusters
    from ..operators.textstats import collocations_pmi

    docs = t(spark, sf_dir, "documents")
    docw = docs.select(F.explode(normalized_tokens("text")).alias("word"))
    partw = t(spark, sf_dir, "part").select(
        F.explode(normalized_tokens("p_name")).alias("word")
    )
    words_df = docw.unionByName(partw)
    nul_b = F.lit(None).cast("bigint")
    pairs = symdelete_pairs(words_df, "word").select(
        F.lit("pairs").alias("leg"), "a", "b",
        nul_b.alias("n_pair"), nul_b.alias("n_a"), nul_b.alias("n_b"),
    )
    typos = typo_clusters(words_df, "word", min_count_ratio=4).select(
        F.lit("typo").alias("leg"),
        F.col("variant").alias("a"),
        F.col("canonical").alias("b"),
        nul_b.alias("n_pair"),
        F.col("n_variant").alias("n_a"),
        F.col("n_canonical").alias("n_b"),
    )
    colloc = collocations_pmi(
        docs, text_col="text", top_k=50, min_count=5
    ).select(
        F.lit("colloc").alias("leg"),
        F.col("w1").alias("a"),
        F.col("w2").alias("b"),
        "n_pair",
        F.col("n_w1").alias("n_a"),
        F.col("n_w2").alias("n_b"),
    )
    return pairs.unionByName(typos).unionByName(colloc)
