"""Training-data prep queries: chunking, packing, deterministic sampling.

Driver-verifiable twins of operators/chunking.py and operators/sampling.py
(round-2 verdict: these were pytest-only). Every step is deterministic
and md5-replayable, so the DuckDB oracles reproduce the exact chunk
windows, (shard, bin) assignments, and sample selections:

- chunk windows: DuckDB ``range`` generates the same start sequence as
  Spark ``sequence`` (stop made exclusive-inclusive-equivalent), then
  ``list_slice``/``array_to_string`` replay the slices;
- pack sharding: the engine-portable ``hash64`` (functions/hashing.py)
  over the same 'pack|doc|chunk' key, then the identical
  exclusive-prefix-sum window;
- sampling: the md5 ppm-bucket replayed literally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import hash64_duckdb_sql
from ..operators.chunking import chunk_documents, pack_chunks
from ..operators.sampling import hash_sample, stratified_sample
from ..registry import query, t
from .llm_dedup import _QVEC_CTE, _kmeans_ctes

_CHUNK_WORDS = 64
_OVERLAP = 16
_STEP = _CHUNK_WORDS - _OVERLAP
_BUDGET = 256
_N_SHARDS = 8

# DuckDB replay of chunk_documents(chunk_words=64, overlap=16): tokenize,
# generate starts 0, 48, ... bounded at n-overlap-1 (range stop is
# exclusive, hence +1), slice inclusively.
_CHUNKS_CTE = rf"""
toks AS (SELECT doc_id,
                list_filter(regexp_split_to_array(text, '\s+'), w -> w != '') AS t
         FROM documents),
nz AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
st AS (SELECT doc_id, t, n,
              unnest(range(0, greatest(n - {_OVERLAP} - 1, 0) + 1, {_STEP})) AS s
       FROM nz),
ch AS (SELECT doc_id, CAST(s // {_STEP} AS INTEGER) AS chunk_idx,
              list_slice(t, s + 1, least(s + {_CHUNK_WORDS}, n)) AS c
       FROM st)
"""

_PACK_KEY = hash64_duckdb_sql(
    "concat_ws('|', 'pack', CAST(doc_id AS VARCHAR), CAST(chunk_idx AS VARCHAR))"
)


@query(
    "chunking_shapes",
    f"""
WITH {_CHUNKS_CTE},
sized AS (SELECT doc_id, chunk_idx, CAST(len(c) AS BIGINT) AS n_words FROM ch),
sh AS (SELECT *, {_PACK_KEY} % {_N_SHARDS} AS shard FROM sized),
p AS (SELECT *, coalesce(sum(n_words) OVER (
          PARTITION BY shard ORDER BY doc_id, chunk_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
      FROM sh)
SELECT 'chunk' AS leg, doc_id, chunk_idx, CAST(len(c) AS BIGINT) AS n_words,
       array_to_string(c, ' ') AS chunk_text,
       CAST(NULL AS BIGINT) AS shard, CAST(NULL AS BIGINT) AS bin
FROM ch
UNION ALL
SELECT 'pack' AS leg, doc_id, chunk_idx, n_words,
       CAST(NULL AS VARCHAR) AS chunk_text, shard,
       CAST(floor(prefix / {_BUDGET}) AS BIGINT) AS bin
FROM p
""",
    doc="Chunking + packing coverage as a two-leg tagged union (merges "
    f"the former chunk_documents / pack_chunks rows, round 6; pack "
    "already re-derives the chunk frame, so the pair shares one "
    f"lineage). chunk leg: overlapping word windows (chunk="
    f"{_CHUNK_WORDS}, overlap={_OVERLAP}) — pure codegen split/"
    "sequence/posexplode/slice, shuffle-free (plan-asserted in tests). "
    f"pack leg: shard-local sequence packing (budget={_BUDGET}, shards="
    f"{_N_SHARDS}) — md5-hash sharding + per-shard exclusive-prefix-sum "
    "binning, shard-sized window state, within one item of greedy per "
    "bin (waste bound property-tested). The oracle regenerates the "
    "identical start sequence/slices and replays hash + window "
    "bit-for-bit.",
)
def q_chunking_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = chunk_documents(
        t(spark, sf_dir, "documents"), chunk_words=_CHUNK_WORDS, overlap=_OVERLAP
    )
    nul_b = F.lit(None).cast("long")
    chunk_leg = chunks.select(
        F.lit("chunk").alias("leg"),
        "doc_id",
        "chunk_idx",
        F.col("n_words").cast("long").alias("n_words"),
        "chunk_text",
        nul_b.alias("shard"),
        nul_b.alias("bin"),
    )
    pack_leg = pack_chunks(
        chunks.select(
            "doc_id", "chunk_idx", F.col("n_words").cast("long").alias("n_words")
        ),
        budget=_BUDGET,
        n_shards=_N_SHARDS,
    ).select(
        F.lit("pack").alias("leg"),
        "doc_id",
        "chunk_idx",
        "n_words",
        F.lit(None).cast("string").alias("chunk_text"),
        "shard",
        "bin",
    )
    return chunk_leg.unionByName(pack_leg)


_SAMPLE_FRACTION = 0.25

_STRATA = {"en": 1.0, "de": 0.5, "fr": 0.25, "zh": 0.1}
_STRATA_DEFAULT = 0.05  # es

_STRATA_CASE = (
    "CASE lang "
    + " ".join(
        f"WHEN '{k}' THEN {int(v * 1_000_000)}" for k, v in sorted(_STRATA.items())
    )
    + f" ELSE {int(_STRATA_DEFAULT * 1_000_000)} END"
)

_CAP_N = 50       # cap_per_group: best-50 docs per lang by n_chars
_FIXED_N = 30     # stratified_fixed_n: exactly 30 docs per lang

_TEST_FRACTION = 0.1       # train_test_split holdout
_MIX_W0 = 0.6              # mix_corpora weight: src0-src9 (4-char names)
_MIX_W1 = 0.2              # mix_corpora weight: src10-src19

_WEIGHTED_N = 200          # weighted_sample draw size
_CLUSTERBAL_K = 8          # cluster_balanced_sample k-means clusters
_CLUSTERBAL_ROUNDS = 1     # Lloyd rounds (oracle unrolls the same chain)
_CLUSTERBAL_N = 30         # docs kept per cluster
_KEY_SCALE = 10**9         # A-Res key quantization (see operators.sampling)
_QBINS = 4                 # quality_bins quartiles over n_chars
_QBINS_ACC = 1_000_000     # exact while n_docs <= accuracy
_TEMPMIX_ALPHA = 0.5       # temperature_mix exponent (E[kept] ∝ n^alpha)
_DSIR_TARGET_LANG = "en"   # importance_resample target subset predicate
_CURR_FRACS = {0: 0.1, 1: 0.25, 2: 0.5, 3: 1.0}  # curriculum keep-fractions

_CURR_CASE = (
    "CASE bin "
    + " ".join(
        f"WHEN {k} THEN {int(round(v * 1_000_000))}"
        for k, v in sorted(_CURR_FRACS.items())
    )
    + " ELSE 0 END"
)

# ceil(q*n) order statistics — Spark percentile_approx's exact-regime
# rank convention (see operators.sampling.quality_bins docstring)
_CUTS_CTE = f"""
qstats AS (SELECT doc_id, n_chars, row_number() OVER (ORDER BY n_chars) AS rn,
                  count(*) OVER () AS nc
           FROM documents),
cuts AS (SELECT
  {", ".join(
    f"max(CASE WHEN rn = CAST(ceil({i / _QBINS} * nc) AS BIGINT) THEN n_chars END) AS c{i}"
    for i in range(1, _QBINS)
  )}
  FROM qstats),
binned AS (SELECT doc_id, n_chars,
    {" + ".join(f"CAST((n_chars > c{i}) AS INT)" for i in range(1, _QBINS))} AS bin
  FROM documents CROSS JOIN cuts)"""


@query(
    "sampling_shapes",
    f"""
WITH {_CUTS_CTE},
{_QVEC_CTE.strip()},
{_kmeans_ctes(_CLUSTERBAL_K, _CLUSTERBAL_ROUNDS)},
dtok_dsir AS (SELECT doc_id, lang,
                     unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                        t -> t != '')) AS tok
              FROM documents),
vocab_dsir AS (SELECT tok,
                      ((count(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                                   THEN 1 END) + 1) * 1000000)
                      // count(*) AS s
               FROM dtok_dsir GROUP BY tok),
docw_dsir AS (SELECT d.doc_id, CAST(sum(v.s) // count(*) AS BIGINT) AS w
              FROM dtok_dsir d JOIN vocab_dsir v USING (tok)
              GROUP BY d.doc_id),
wmax_dsir AS (SELECT max(w) AS wmax FROM docw_dsir)
SELECT 'hash' AS leg, doc_id, lang, source, n_chars, CAST(NULL AS INT) AS bin
FROM documents
WHERE {hash64_duckdb_sql("concat('sample:', CAST(doc_id AS VARCHAR))")}
      % 1000000 < {int(_SAMPLE_FRACTION * 1_000_000)}
UNION ALL
SELECT 'strata' AS leg, doc_id, lang, source, CAST(NULL AS BIGINT) AS n_chars,
       CAST(NULL AS INT) AS bin
FROM documents
WHERE {hash64_duckdb_sql("concat('strata:', CAST(doc_id AS VARCHAR))")}
      % 1000000 < {_STRATA_CASE}
UNION ALL
SELECT 'cap' AS leg, doc_id, lang, CAST(NULL AS VARCHAR) AS source, n_chars,
       CAST(NULL AS INT) AS bin
FROM (SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
WHERE rn <= {_CAP_N}
UNION ALL
SELECT 'fixedn' AS leg, doc_id, lang, CAST(NULL AS VARCHAR) AS source,
       CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS INT) AS bin
FROM (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                ORDER BY {hash64_duckdb_sql("concat('fixedn:', CAST(doc_id AS VARCHAR))")}
                         % 1000000, doc_id) AS rn
      FROM documents)
WHERE rn <= {_FIXED_N}
UNION ALL
SELECT 'weighted' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, n_chars, CAST(NULL AS INT) AS bin
FROM (SELECT doc_id, n_chars FROM documents WHERE n_chars > 0
      ORDER BY floor(pow(
          CAST({hash64_duckdb_sql("concat('wsample:', CAST(doc_id AS VARCHAR))")}
               % 1000000 + 1 AS DOUBLE) / 1000000.0,
          1.0 / CAST(n_chars AS DOUBLE)) * {float(_KEY_SCALE)}) DESC, doc_id
      LIMIT {_WEIGHTED_N})
UNION ALL
SELECT 'train' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars,
       CAST(NULL AS INT) AS bin
FROM documents
WHERE {hash64_duckdb_sql("concat('split:', CAST(doc_id AS VARCHAR))")}
      % 1000000 >= {int(round(_TEST_FRACTION * 1_000_000))}
UNION ALL
SELECT 'test' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars,
       CAST(NULL AS INT) AS bin
FROM documents
WHERE {hash64_duckdb_sql("concat('split:', CAST(doc_id AS VARCHAR))")}
      % 1000000 < {int(round(_TEST_FRACTION * 1_000_000))}
UNION ALL
SELECT 'mix' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang, source,
       CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS INT) AS bin
FROM documents
WHERE (length(source) = 4
       AND {hash64_duckdb_sql("concat('mix:0:', CAST(doc_id AS VARCHAR))")}
           % 1000000 < {int(round(_MIX_W0 * 1_000_000))})
   OR (length(source) = 5
       AND {hash64_duckdb_sql("concat('mix:1:', CAST(doc_id AS VARCHAR))")}
           % 1000000 < {int(round(_MIX_W1 * 1_000_000))})
UNION ALL
SELECT 'qbins' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, n_chars, bin
FROM binned
UNION ALL
SELECT 'curriculum' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars, bin
FROM binned
WHERE {hash64_duckdb_sql("concat('curriculum:', CAST(doc_id AS VARCHAR))")}
      % 1000000 < {_CURR_CASE}
UNION ALL
SELECT 'clusterbal' AS leg, vec_id AS doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS n_chars,
       CAST(cluster AS INT) AS bin
FROM (SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY cluster
                ORDER BY {hash64_duckdb_sql("concat('clusterbal:', CAST(vec_id AS VARCHAR))")}
                         % 1000000, vec_id) AS rn
      FROM m_final)
WHERE rn <= {_CLUSTERBAL_N}
UNION ALL
SELECT 'shards' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, CAST(pos AS BIGINT) AS n_chars,
       CAST(shard AS INT) AS bin
FROM (SELECT doc_id, hk % {_N_SHARDS} AS shard,
             row_number() OVER (PARTITION BY hk % {_N_SHARDS}
                                ORDER BY hk, doc_id) - 1 AS pos
      FROM (SELECT doc_id,
            {hash64_duckdb_sql("concat('shuffle:', CAST(doc_id AS VARCHAR))")} AS hk
            FROM documents))
UNION ALL
SELECT 'tempmix' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang, source,
       CAST(NULL AS BIGINT) AS n_chars, CAST(NULL AS INT) AS bin
FROM (SELECT d.doc_id, d.source,
             {hash64_duckdb_sql("concat('tempmix:', CAST(doc_id AS VARCHAR))")}
               % 1000000 AS h,
             floor(pow(CAST(c.n AS DOUBLE) / CAST(r.nref AS DOUBLE),
                       {_TEMPMIX_ALPHA - 1.0}) * 1000000.0) AS thr
      FROM documents d
      JOIN (SELECT source, count(*) AS n FROM documents GROUP BY source) c
        USING (source)
      CROSS JOIN (SELECT min(n) AS nref
                  FROM (SELECT count(*) AS n FROM documents
                        GROUP BY source)) r)
WHERE h < thr
UNION ALL
SELECT 'dsir' AS leg, doc_id, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS VARCHAR) AS source, w AS n_chars, CAST(NULL AS INT) AS bin
FROM docw_dsir CROSS JOIN wmax_dsir
WHERE ({hash64_duckdb_sql("concat('dsir:', CAST(doc_id AS VARCHAR))")}
       % 1000000) * wmax < w * 1000000
""",
    doc="Deterministic-sampling coverage as a fourteen-leg tagged union "
    "(dsir leg r10: importance_resample — DSIR-style importance "
    f"resampling toward the lang='{_DSIR_TARGET_LANG}' target subset: "
    "integer add-1-smoothed target/corpus unigram ratio scores, mean "
    "per-token weight per doc (rides `n_chars`), then E[kept] ∝ weight "
    "via cross-multiplied hash-ppm keep — one token aggregation, one "
    "vocab join, one doc aggregation, no floats anywhere so the oracle "
    "replays weights AND selection bit-for-bit; the faithful float "
    "log-likelihood-ratio estimator is dsir_logratio_weights, pytest-"
    "gated like unigram_logprob_score) "
    "(tempmix leg r10: temperature_mix — the GPT-3/PaLM temperature-"
    f"scaled domain sampler at alpha={_TEMPMIX_ALPHA}: per-domain keep "
    "fraction (n_d/n_min)^(alpha-1) so E[kept] ∝ n^alpha, one tiny "
    "count agg broadcast back + a map-side content-hash ppm filter — "
    "no corpus shuffle; the oracle replays counts, pow threshold, and "
    "hash cut) "
    "(shards leg r10: shuffle_shards — the reproducible global "
    f"training-data shuffle into {_N_SHARDS} ordered shards; salted-"
    "md5 shard assignment + per-shard row_number position, no global "
    "window, one shuffle; shard rides `bin`, pos rides `n_chars`) "
    "(clusterbal leg r8 final: cluster_balanced_sample — topic-balanced "
    f"subsampling, seeded {_CLUSTERBAL_K}-means over embeddings + "
    f"best-{_CLUSTERBAL_N}-per-cluster content-hash selection; the "
    "oracle replays the identical k-means CTE chain the IVF/semantic "
    "rows use plus the fixedn-style hash-order window) "
    "(merged hash_sample / stratified_sample r5; + weighted_sample / "
    "quality_bins / curriculum_mix / train_test_split / mix_corpora "
    "legs r8 — zero slot cost; every formerly-pytest-only sampler is "
    "now driver-verified). train/test legs: disjoint exhaustive "
    "split by complementary predicates over ONE salted hash — every "
    "row lands in exactly one side under any partitioning. mix leg: "
    "two corpora (4- vs 5-char source names) down-sampled to their "
    "mixing weights with per-corpus salts and unioned. hash "
    f"leg: content-hash Bernoulli sample (fraction={_SAMPLE_FRACTION}) "
    "— shuffle-free codegen filter, md5 ppm bucket replayed by the "
    "oracle. strata leg: per-stratum fractions over documents.lang as "
    f"a CASE literal — no join. cap leg: best-{_CAP_N} docs per lang "
    "by n_chars (window-per-group row_number — the per-domain crawl "
    f"cap). fixedn leg: exactly {_FIXED_N} docs per lang in "
    "content-hash order — the reproducible eval-set builder. weighted "
    f"leg: Efraimidis-Spirakis A-Res top-{_WEIGHTED_N} weighted by "
    "n_chars, ONE TakeOrderedAndProject; the u^(1/w) key is floored "
    f"to {_KEY_SCALE}-units (pow is the one non-correctly-rounded "
    "libm op — the integer grid + id tie-break absorbs last-ulp "
    "engine variance, same discipline as bm25's score_micro). qbins "
    f"leg: {_QBINS} quantile bins over n_chars — cut points from ONE "
    "percentile_approx (exact while n <= accuracy; oracle replays the "
    "ceil(q*n) order statistic), binning a literal CASE at scan "
    "speed. curriculum leg: bins composed with per-bin hash "
    "fractions — the quality-curriculum mixing primitive; every leg "
    "replayable from the salt by any engine.",
)
def q_sampling_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import (
        cap_per_group,
        curriculum_mix,
        mix_corpora,
        quality_bins,
        stratified_fixed_n,
        train_test_split,
        weighted_sample,
    )

    docs = t(spark, sf_dir, "documents")
    nul_b = F.lit(None).cast("bigint")
    nul_s = F.lit(None).cast("string")
    nul_i = F.lit(None).cast("int")
    hash_leg = hash_sample(docs, "doc_id", _SAMPLE_FRACTION).select(
        F.lit("hash").alias("leg"), "doc_id", "lang", "source", "n_chars",
        nul_i.alias("bin"),
    )
    strata_leg = stratified_sample(
        docs,
        strata_col="lang",
        id_col="doc_id",
        fractions=_STRATA,
        default_fraction=_STRATA_DEFAULT,
    ).select(
        F.lit("strata").alias("leg"), "doc_id", "lang", "source",
        nul_b.alias("n_chars"), nul_i.alias("bin"),
    )
    cap_leg = cap_per_group(
        docs.select("doc_id", "lang", "n_chars"),
        group_col="lang",
        order_col="n_chars",
        n=_CAP_N,
        id_col="doc_id",
    ).select(
        F.lit("cap").alias("leg"), "doc_id", "lang", nul_s.alias("source"),
        "n_chars", nul_i.alias("bin"),
    )
    fixedn_leg = stratified_fixed_n(
        docs.select("doc_id", "lang"),
        stratum_col="lang",
        id_col="doc_id",
        n_per_stratum=_FIXED_N,
    ).select(
        F.lit("fixedn").alias("leg"), "doc_id", "lang", nul_s.alias("source"),
        nul_b.alias("n_chars"), nul_i.alias("bin"),
    )
    train_df, test_df = train_test_split(
        docs.select("doc_id"), "doc_id", test_fraction=_TEST_FRACTION
    )
    train_leg = train_df.select(
        F.lit("train").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), nul_b.alias("n_chars"), nul_i.alias("bin"),
    )
    test_leg = test_df.select(
        F.lit("test").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), nul_b.alias("n_chars"), nul_i.alias("bin"),
    )
    short_src = docs.filter(F.length("source") == 4).select("doc_id", "source")
    long_src = docs.filter(F.length("source") == 5).select("doc_id", "source")
    mix_leg = mix_corpora(
        [(short_src, _MIX_W0), (long_src, _MIX_W1)], id_col="doc_id"
    ).select(
        F.lit("mix").alias("leg"), "doc_id", nul_s.alias("lang"), "source",
        nul_b.alias("n_chars"), nul_i.alias("bin"),
    )
    weighted_leg = weighted_sample(
        docs.select("doc_id", "n_chars"),
        id_col="doc_id",
        weight_col="n_chars",
        n=_WEIGHTED_N,
        key_scale=_KEY_SCALE,
    ).select(
        F.lit("weighted").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), "n_chars", nul_i.alias("bin"),
    )
    qbins_leg = quality_bins(
        docs.select("doc_id", "n_chars"),
        score_col="n_chars",
        n_bins=_QBINS,
        accuracy=_QBINS_ACC,
    ).select(
        F.lit("qbins").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), "n_chars",
        F.col("quality_bin").cast("int").alias("bin"),
    )
    curriculum_leg = curriculum_mix(
        docs.select("doc_id", "n_chars"),
        id_col="doc_id",
        bin_fractions=_CURR_FRACS,
        score_col="n_chars",
        accuracy=_QBINS_ACC,
    ).select(
        F.lit("curriculum").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), nul_b.alias("n_chars"),
        F.col("quality_bin").cast("int").alias("bin"),
    )
    from ..operators.sampling import cluster_balanced_sample

    emb = t(spark, sf_dir, "embeddings")
    clusterbal_leg = cluster_balanced_sample(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        k=_CLUSTERBAL_K,
        dim=64,
        rounds=_CLUSTERBAL_ROUNDS,
        n_per_cluster=_CLUSTERBAL_N,
        salt="clusterbal",
    ).select(
        F.lit("clusterbal").alias("leg"),
        F.col("vec_id").alias("doc_id"),
        nul_s.alias("lang"),
        nul_s.alias("source"),
        nul_b.alias("n_chars"),
        F.col("cluster").cast("int").alias("bin"),
    )
    from ..operators.sampling import shuffle_shards, temperature_mix

    # shard in `bin`, pos in `n_chars` — the tagged-union column-reuse
    # convention every other leg follows
    shards_leg = shuffle_shards(
        docs.select("doc_id"), "doc_id", num_shards=_N_SHARDS
    ).select(
        F.lit("shards").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), F.col("pos").alias("n_chars"),
        F.col("shard").cast("int").alias("bin"),
    )
    tempmix_leg = temperature_mix(
        docs.select("doc_id", "source"),
        domain_col="source",
        id_col="doc_id",
        alpha=_TEMPMIX_ALPHA,
    ).select(
        F.lit("tempmix").alias("leg"), "doc_id", nul_s.alias("lang"),
        "source", nul_b.alias("n_chars"), nul_i.alias("bin"),
    )
    from ..operators.pinning import lazy_checkpoint
    from ..operators.sampling import importance_resample

    # integer importance weight in `n_chars` — the kept set AND the
    # weight that selected it are both hash-verified
    dsir_leg = importance_resample(
        docs.select("doc_id", "lang", "text"),
        target=F.col("lang") == _DSIR_TARGET_LANG,
        id_col="doc_id",
        text_col="text",
        pin=lazy_checkpoint,
    ).select(
        F.lit("dsir").alias("leg"), "doc_id", nul_s.alias("lang"),
        nul_s.alias("source"), F.col("weight").alias("n_chars"),
        nul_i.alias("bin"),
    )
    return (
        hash_leg.unionByName(strata_leg)
        .unionByName(cap_leg)
        .unionByName(fixedn_leg)
        .unionByName(train_leg)
        .unionByName(test_leg)
        .unionByName(mix_leg)
        .unionByName(weighted_leg)
        .unionByName(qbins_leg)
        .unionByName(curriculum_leg)
        .unionByName(clusterbal_leg)
        .unionByName(shards_leg)
        .unionByName(tempmix_leg)
        .unionByName(dsir_leg)
    )
