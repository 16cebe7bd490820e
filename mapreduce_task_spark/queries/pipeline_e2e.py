"""End-to-end corpus-cleaning pipeline + vectorized-UDF surface.

``pipeline_clean_corpus`` is the flagship composition: quality-filter
-> LSH near-dup removal (keep the lowest doc_id of each dup cluster)
-> per-doc stats — the shape of a real LLM training-data prep job,
exercising scan/project/filter, the MinHash-LSH pipeline, anti-join,
and aggregation in ONE plan. The oracle replays all of it in SQL.

``embedding_norms`` demonstrates the @pandas_udf (vectorized scalar
UDF) surface with exact-arithmetic oracle parity: the norm is computed
from the integer-quantized self-dot, so numpy's sqrt and DuckDB's sqrt
see bit-identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from ..operators.dedup import (
    jaccard_verify,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signature,
    shingles,
)
from ..operators.textstats import quality_features
from ..registry import query, t
from .llm_dedup import _SIG_CTE, _BAND_SELECTS, _persist
from .llm_text import _TOKS, _in_list

_QUALITY_MIN = 0.45


@query(
    "pipeline_clean_corpus",
    f"""
WITH {_SIG_CTE},
bands AS ({_BAND_SELECTS}),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS inter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.id_a
          JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
          GROUP BY c.id_a, c.id_b),
dup_b AS (SELECT DISTINCT i.id_b AS doc_id
          FROM inter i
          JOIN sizes na ON na.doc_id = i.id_a
          JOIN sizes nb ON nb.doc_id = i.id_b
          WHERE CAST(i.inter AS DOUBLE) / CAST(na.n + nb.n - i.inter AS DOUBLE) >= 0.5),
quality AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    0.5 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / CAST(nullif(length(text), 0) AS DOUBLE))
    + 0.3 * (CAST(len(list_filter(toks, w -> w IN ({_in_list('en')}))) AS DOUBLE)
             / CAST(nullif(len(toks), 0) AS DOUBLE))
    + 0.2 * least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) AS quality_score
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents) tk
)
SELECT q.doc_id, q.n_words, q.quality_score
FROM quality q
WHERE q.quality_score >= {_QUALITY_MIN}
  AND q.doc_id NOT IN (SELECT doc_id FROM dup_b)
""",
    doc="End-to-end corpus cleaning: quality filter + LSH near-dup removal "
    "(keep lowest id per cluster) -> per-doc stats, one composed plan.",
)
def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sh = _persist(shingles(docs))
    cand = lsh_candidate_pairs(lsh_bands(minhash_signature(sh)))
    dup_b = (
        jaccard_verify(cand, sh)
        .filter(F.col("jaccard") >= 0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    qf = quality_features(docs).select("doc_id", "n_words", "quality_score")
    return qf.filter(F.col("quality_score") >= _QUALITY_MIN).join(
        dup_b, "doc_id", "left_anti"
    )


def clean_corpus_by_components(docs: DataFrame) -> DataFrame:
    """Component-based corpus cleaning: LSH near-dup pairs -> connected
    components -> keep the min-id representative of every component.

    The principled upgrade over ``pipeline_clean_corpus``'s per-pair
    id_b removal: transitively CHAINED near-dups (a~b, b~c with a!~c)
    collapse to one representative instead of depending on pair
    orientation. Not driver-registered (the 50-entry record cap binds;
    see tests/test_registry.py) — pytest-verified against a pure-python
    union-find oracle over the exact verified pair set in
    tests/test_pipeline_e2e.py.
    """
    from ..operators.dedup import duplicate_delete_list

    sh = shingles(docs).persist()
    pairs = jaccard_verify(
        lsh_candidate_pairs(lsh_bands(minhash_signature(sh))), sh
    ).filter(F.col("jaccard") >= 0.5)
    # duplicate_delete_list materializes internally (iterative label
    # propagation), so the shingle persist is released right after
    dels = duplicate_delete_list(pairs)
    sh.unpersist()
    return docs.join(dels, "doc_id", "left_anti")


@query(
    "embedding_norms",
    """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b) AS sq_norm,
       sqrt(list_dot_product(
         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000)),
         list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000000))
       )) / 1000000.0 AS qnorm
FROM embeddings
""",
    doc="Embedding scalar surface in one projection: array functions over "
    "array<float> (size + sequential-fold sum-of-squares — same fold order "
    "both engines -> bit-identical doubles) alongside the vectorized "
    "@pandas_udf L2 norm from the quantized self-dot (numpy batch compute, "
    "exact-arithmetic oracle parity). Merges the former array_funcs row to "
    "free a slot inside the driver's 50-entry record cap (round 4).",
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..functions.vectors import dot

    def qnorm_fn(emb):
        import numpy as np

        m = np.stack(emb.to_numpy())
        q = np.floor(m.astype(np.float64) * 1_000_000)
        return pd.Series(np.sqrt((q * q).sum(axis=1)) / 1_000_000.0)

    # real type objects, not strings: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf can't resolve.
    qnorm_fn.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    qnorm = pandas_udf(qnorm_fn, "double")

    return t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        dot("embedding", "embedding").alias("sq_norm"),
        qnorm(F.col("embedding")).alias("qnorm"),
    )


def corpus_report(docs: DataFrame) -> DataFrame:
    """One-stop corpus health report: the metrics frame a data-prep run
    logs before and after cleaning. Composes the engine's pieces —
    the one-pass constraint gate (operators.quality), exact-dup rate,
    per-language mix, and token totals — into a tidy
    (metric, key, value) frame.

    Driver-registered since round 8 as the ``report`` leg of
    ``quality_gate`` (below); pytest additionally drives the
    composition end-to-end in tests/test_pipeline_e2e.py.

    Scan discipline (r8): ALL the global metrics — the four
    constraint checks, the exact-dup rate, and the token total — ride
    ONE aggregation pass (the quality module's own single-scan
    contract); the per-language mix is the one metric that genuinely
    needs a groupBy, so the report costs exactly TWO scans of the
    corpus, not one per metric family (the previous shape ran four).
    """
    from ..operators.quality import completeness, uniqueness
    from ..operators.textstats import ws_token_count

    checks = [
        completeness("doc_id"),
        uniqueness("doc_id"),
        completeness("text"),
        completeness("lang"),
    ]
    # guarded divisions: an empty corpus reports dup_rate 0.0 and token
    # total 0.0 instead of aborting under ANSI division-by-zero (the
    # same empty-shard posture as operators.quality)
    dup_expr = F.coalesce(
        1.0
        - F.count_distinct(F.md5("text")).cast("double")
        / F.nullif(F.count(F.lit(1)), F.lit(0)).cast("double"),
        F.lit(0.0),
    )
    tok_expr = F.coalesce(
        F.sum(ws_token_count("text").cast("long")).cast("double"), F.lit(0.0)
    )
    row = docs.agg(
        *[c.metric_expr.alias(f"m{i}") for i, c in enumerate(checks)],
        dup_expr.alias("dup"),
        tok_expr.alias("tok"),
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(f"check:{c.name}").alias("metric"),
                F.lit(c.column).alias("key"),
                F.col(f"m{i}").cast("double").alias("value"),
            )
            for i, c in enumerate(checks)
        ],
        F.struct(
            F.lit("exact_dup_rate").alias("metric"),
            F.lit("text").alias("key"),
            F.col("dup").alias("value"),
        ),
        F.struct(
            F.lit("total_ws_tokens").alias("metric"),
            F.lit("text").alias("key"),
            F.col("tok").alias("value"),
        ),
    )
    globals_leg = row.select(F.explode(entries).alias("__r")).select("__r.*")
    lang_mix = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .select(F.lit("lang_docs").alias("metric"), F.col("lang").alias("key"), "value")
    )
    return globals_leg.unionByName(lang_mix)


@query(
    "quality_gate",
    oracle=r"""
WITH rep AS (
  SELECT 'check:completeness' AS rule, 'doc_id' AS col_name,
         coalesce(CAST(count(doc_id) AS DOUBLE)
                  / CAST(nullif(count(*), 0) AS DOUBLE), 0.0) AS metric
  FROM documents
  UNION ALL
  SELECT 'check:uniqueness', 'doc_id',
         coalesce(CAST(count(DISTINCT doc_id) AS DOUBLE)
                  / CAST(nullif(count(*), 0) AS DOUBLE), 0.0)
  FROM documents
  UNION ALL
  SELECT 'check:completeness', 'text',
         coalesce(CAST(count(text) AS DOUBLE)
                  / CAST(nullif(count(*), 0) AS DOUBLE), 0.0)
  FROM documents
  UNION ALL
  SELECT 'check:completeness', 'lang',
         coalesce(CAST(count(lang) AS DOUBLE)
                  / CAST(nullif(count(*), 0) AS DOUBLE), 0.0)
  FROM documents
  UNION ALL
  SELECT 'exact_dup_rate', 'text',
         coalesce(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)
                        / CAST(nullif(count(*), 0) AS DOUBLE), 0.0)
  FROM documents
  UNION ALL
  SELECT 'lang_docs', lang, CAST(count(*) AS DOUBLE)
  FROM documents GROUP BY lang
  UNION ALL
  SELECT 'total_ws_tokens', 'text',
         coalesce(CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x != ''))) AS DOUBLE), 0.0)
  FROM documents
),
gate AS (
  SELECT 'in_range' AS rule, 'o_totalprice' AS col_name,
         coalesce(CAST(sum(CASE WHEN o_totalprice BETWEEN 1000.0 AND 300000.0
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(nullif(count(o_totalprice), 0) AS DOUBLE), 0.0) AS metric,
         0.5 AS threshold
  FROM orders
  UNION ALL
  SELECT 'is_in', 'o_orderstatus',
         coalesce(CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F')
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(nullif(count(o_orderstatus), 0) AS DOUBLE), 0.0),
         0.9
  FROM orders
  UNION ALL
  SELECT 'matches', 'o_orderpriority',
         coalesce(CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-3]-')
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(nullif(count(o_orderpriority), 0) AS DOUBLE), 0.0),
         0.5
  FROM orders
),
ri AS (
  SELECT 'referential_integrity' AS rule, 'o_custkey' AS col_name,
         CAST(count(*) - sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE) AS metric,
         1.0 AS threshold
  FROM orders o
  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON c.c_custkey = o.o_custkey
)
SELECT 'report' AS leg, rule, col_name, metric,
       CAST(NULL AS DOUBLE) AS threshold, CAST(NULL AS INT) AS passed_i
FROM rep
UNION ALL
SELECT 'orders' AS leg, rule, col_name, metric, threshold,
       CAST(metric >= threshold AS INT) AS passed_i
FROM gate
UNION ALL
SELECT 'ri' AS leg, rule, col_name, metric, threshold,
       CAST(metric >= threshold AS INT) AS passed_i
FROM ri
""",
    doc="Pre-ingestion data-quality gate + corpus health report as a "
    "three-leg tagged union (operators/quality.py + corpus_report, "
    "pytest-only r4-r7; the generalization of the reference's "
    "MALFORMED_LINES counter, TraceInsertIndexMapper.java:113-115). "
    "report leg: corpus_report(documents) — the one-pass constraint "
    "checks (completeness x3 + uniqueness ride ONE aggregation, "
    "plan-asserted in tests/test_quality.py), exact-dup rate, "
    "per-language mix, and whitespace-token totals as a tidy "
    "(rule, col_name, metric) frame. orders leg: the remaining rule "
    "types — in_range / is_in / matches — again ONE scan for all "
    "three (k checks cost one scan + k cheap map-side-combined "
    "aggregates at 100 TB). ri leg: referential integrity "
    "orders.o_custkey -> customer (broadcast anti-join orphan count; "
    "two 1-number actions by documented contract). All metrics are "
    "count/count divisions of exact integers, so doubles replay "
    "bit-identically; passed is cast to INT for a stable hash.",
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import (
        in_range,
        is_in,
        matches,
        referential_integrity,
        run_checks,
    )

    docs = t(spark, sf_dir, "documents")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nul_d = F.lit(None).cast("double")
    nul_i = F.lit(None).cast("int")

    rep = corpus_report(docs).select(
        F.lit("report").alias("leg"),
        F.col("metric").alias("rule"),
        F.col("key").alias("col_name"),
        F.col("value").alias("metric"),
        nul_d.alias("threshold"),
        nul_i.alias("passed_i"),
    )
    gate = run_checks(
        orders,
        [
            in_range("o_totalprice", 1000.0, 300000.0, 0.5),
            is_in("o_orderstatus", ["O", "F"], 0.9),
            matches("o_orderpriority", "^[1-3]-", 0.5),
        ],
    ).select(
        F.lit("orders").alias("leg"),
        F.col("check").alias("rule"),
        F.col("column").alias("col_name"),
        "metric",
        "threshold",
        F.col("passed").cast("int").alias("passed_i"),
    )
    ri = referential_integrity(orders, "o_custkey", cust, "c_custkey").select(
        F.lit("ri").alias("leg"),
        F.col("check").alias("rule"),
        F.col("column").alias("col_name"),
        "metric",
        "threshold",
        F.col("passed").cast("int").alias("passed_i"),
    )
    return rep.unionByName(gate).unionByName(ri)
