"""Deterministic sampling + corpus mixing for training-data pipelines.

``df.sample()`` is seed-dependent per partitioning and not reproducible
across runs/engines; these operators sample by CONTENT (a stable key
hash), which a 100 TB pipeline needs:

- reruns and backfills select the same rows (idempotent shards),
- train/test splits are disjoint by construction and survive
  re-partitioning,
- every step is a codegen projection — no shuffle, no RNG state.

``hash64`` is the md5-derived 60-bit hash used across the engine
(functions/hashing.py), so any oracle can replay the selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.hashing import hash64

_BUCKETS = 1_000_000  # ppm granularity for fractions


def _bucket(id_col: str | Column, salt: str) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash64(F.concat(F.lit(f"{salt}:"), c.cast("string"))) % F.lit(_BUCKETS)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose salted key
    hash lands in the first ``fraction`` of bucket space."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(id_col, salt) < int(round(fraction * _BUCKETS)))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible (train, test) split.

    Same hash expression, complementary predicates: every row lands in
    exactly one side regardless of partitioning or rerun.
    """
    thr = int(round(test_fraction * _BUCKETS))
    b = _bucket(id_col, salt)
    return df.filter(b >= thr), df.filter(b < thr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of books, 10% of web, 1% of logs).

    The fraction map travels as a CASE expression (codegen literal, no
    join); unknown strata get ``default_fraction``.
    """
    thr: Column = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thr = (
            F.when(F.col(strata_col) == value, F.lit(int(round(frac * _BUCKETS))))
            .otherwise(thr)
        )
    return df.filter(_bucket(id_col, salt) < thr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
    key_scale: int | None = None,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of size ``n``
    (Efraimidis-Spirakis A-Res): rank every row by ``u^(1/w)`` where
    ``u`` is its salted content hash mapped into (0, 1], keep the top
    ``n``. Inclusion probability rises with weight; the whole draw is
    one TakeOrderedAndProject (per-partition n-row heaps, no shuffle of
    the data, no RNG state) and — like every sampler here — replayable
    from the salt by any engine. Rows with weight <= 0 never selected.

    ``key_scale``: the A-Res key is the module's ONE non-replayable
    float — ``pow`` is not IEEE-correctly-rounded everywhere (Java's
    fdlibm is within 1 ulp of glibc's correctly-rounded pow), so two
    engines can disagree in the key's last bit. Passing a scale (e.g.
    10**9) ranks by ``floor(key * scale)`` with the id as tie-break
    instead: exact ties resolve identically everywhere, and a
    cross-engine flip needs the true key within ~1 ulp of a grid line
    AND at the selection boundary (~1e-7 per draw at 1e9) — the same
    integer-micro-unit discipline as bm25's score_micro. Default None
    keeps the raw double ranking (single-engine reproducible always).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    u = (_bucket(id_col, salt) + 1).cast("double") / float(_BUCKETS)
    key: Column = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    if key_scale is not None:
        key = F.floor(key * F.lit(float(key_scale)))
    ranked = df.filter(F.col(weight_col) > 0).withColumn("__ares", key)
    out = ranked.orderBy(F.desc("__ares"), F.col(id_col)).limit(n)
    return out.drop("__ares")


def quality_bins(
    df: DataFrame,
    score_col: str = "quality_score",
    n_bins: int = 4,
    accuracy: int = 10000,
) -> DataFrame:
    """Assign each row a quality bin 0..n_bins-1 by score quantile.

    Cut points come from ONE percentile_approx aggregate (a 1-row
    driver collect of n_bins-1 doubles — metadata-sized, the same
    contract as the BPE argmax / k-means fixpoint collects); binning
    is then a literal CASE projection at scan speed. While row count
    <= accuracy the GK sketch is EXACT and its quantile convention is
    the value at 1-based rank ceil(q * n) (verified empirically across
    n in tests/test_sampling.py; the driver oracle replays it as an
    order statistic) — beyond that the rank error is floor(n/accuracy),
    the documented 100 TB approximation. This is the
    curriculum primitive: compose with ``stratified_sample`` on the
    bin column to up/down-weight quality tiers in the training mix.
    No global sort, no window — ntile() over an unpartitioned window
    is the anti-pattern this replaces.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.percentile_approx(score_col, qs, accuracy).alias("c")
    ).collect()[0]["c"]
    # empty input: percentile_approx aggregates to NULL, not [] — an
    # incremental run over a day with no rows must still be total, so
    # degenerate to a single bin (zero rows carry it anyway).
    cuts = cuts if cuts is not None else []
    bin_expr = F.lit(0)
    for c in cuts:
        bin_expr = bin_expr + (F.col(score_col) > F.lit(float(c))).cast("int")
    return df.withColumn("quality_bin", bin_expr)


def curriculum_mix(
    df: DataFrame,
    id_col: str,
    bin_fractions: dict[int, float],
    score_col: str = "quality_score",
    salt: str = "curriculum",
    accuracy: int = 10000,
) -> DataFrame:
    """Quality-curriculum sampling: bin by score quantile, then keep a
    per-bin deterministic hash fraction — e.g. {0: 0.1, 3: 1.0} keeps
    10% of the worst quartile and all of the best. ``accuracy`` passes
    through to ``quality_bins`` (cut points exact while row count <=
    accuracy — the GK rank-error bound floor(n/accuracy) is then 0)."""
    binned = quality_bins(df, score_col, n_bins=max(bin_fractions) + 1, accuracy=accuracy)
    return stratified_sample(binned, "quality_bin", id_col, bin_fractions, salt=salt)


def mix_corpora(
    sources: list[tuple[DataFrame, float]], id_col: str, salt: str = "mix"
) -> DataFrame:
    """Union independent corpora, each down-sampled to its mixing
    weight (by-name union, so schemas may order columns differently)."""
    sampled = [
        hash_sample(df, id_col, w, salt=f"{salt}:{i}")
        for i, (df, w) in enumerate(sources)
    ]
    out = sampled[0]
    for s in sampled[1:]:
        out = out.unionByName(s)
    return out


def temperature_mix(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-scaled domain sampling — the GPT-3/PaLM data-recipe
    primitive: keep rows so that the EXPECTED kept count per domain is
    proportional to ``n_domain ** alpha``. ``alpha=1`` keeps everything
    (natural proportions); ``alpha=0`` equalizes expected counts across
    domains; values between interpolate, damping dominant domains
    without the hard cutoff of ``cap_per_group``.

    Mechanism: per-domain keep fraction
    ``f_d = (n_d / n_ref) ** (alpha - 1)`` with ``n_ref`` the smallest
    (alpha < 1) or largest (alpha > 1) domain count, so the most
    up-weighted domain is kept in full and every fraction is <= 1;
    ``E[kept_d] = n_d * f_d ∝ n_d ** alpha``. Selection is the
    engine-wide content-hash ppm bucket against
    ``floor(f_d * 1e6)``, so the sample is deterministic across
    reruns, partitionings, and engines (one ``pow`` per DOMAIN, not
    per row — the libm last-ulp caveat of ``weighted_sample`` applies
    only at exact ppm boundaries).

    Plan shape: one tiny count aggregation (|domains| rows), its
    1-row min/max, both broadcast back — then the corpus pays a
    map-side hash filter. No corpus shuffle at any scale. NULL
    ``domain_col`` rows are EXCLUDED (an inner join on NULL matches
    nothing, identically in any engine): a row without a domain has
    no temperature weight — assign or coalesce a domain upstream.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0 (got {alpha})")
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    ref = counts.agg(
        (F.min("__n") if alpha <= 1 else F.max("__n")).alias("__nref")
    )
    thr = F.floor(
        F.pow(
            F.col("__n").cast("double") / F.col("__nref").cast("double"),
            F.lit(alpha - 1.0),
        )
        * F.lit(float(_BUCKETS))
    )
    th = counts.crossJoin(F.broadcast(ref)).select(
        domain_col, thr.alias("__thr")
    )
    return (
        df.join(F.broadcast(th), domain_col)
        .filter(_bucket(id_col, salt) < F.col("__thr"))
        .drop("__thr")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n`` rows per group, best-first by ``order_col``
    (desc) with the unique ``id_col`` as tie-break.

    The per-domain / per-source cap every crawl pipeline applies so one
    prolific host cannot dominate the training mix. A window-per-group
    row_number — parallelism scales with group count, never a global
    sort (operators/relational.py:grouped_top_k contract). Compose with
    ``quality_bins``/``curriculum_mix``: cap by quality score, then mix.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_fixed_n(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    salt: str = "fixedn",
) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen by deterministic content-hash order — the eval-set builder
    (``stratified_sample`` keeps a FRACTION; this keeps a COUNT).

    Reproducible across reruns and repartitionings (the hash order is a
    property of the data, not the execution), and a window-per-stratum
    row_number, so parallelism scales with stratum count exactly like
    ``cap_per_group`` — no global sort.
    """
    from pyspark.sql import Window

    h = _bucket(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: str = "shuffle",
) -> DataFrame:
    """Deterministic global training-data shuffle into ordered shards.

    Adds ``shard`` (0..num_shards-1) and ``pos`` (0,1,2,... within the
    shard): rows ordered by ``(shard, pos)`` are a reproducible
    pseudorandom permutation of the corpus — the write-side shape for
    training shards, where the trainer streams shard files in order
    and every rerun/backfill yields the SAME example order for the
    same ``seed``.

    Scale shape: the shuffle key is a salted md5 of the id (uniform,
    skew-free), the shard is its modulus, and ``pos`` is a row_number
    window PER SHARD — partitioned by shard, so no global window and
    no single-partition funnel. One shuffle total; writing with
    ``.repartition(num_shards, "shard")`` then sortWithinPartitions
    lands each shard as one ordered file set.

    Collision note: ``pos`` breaks hash ties by ``id_col``, so the
    permutation is total even if two ids hash-collide.

    NULL ids fail the job (an executor-side ``raise_error``, zero cost
    on the NULL-free path): a NULL id hashes to NULL — shard NULL
    (outside 0..num_shards-1) with nondeterministic ordering among
    such rows, i.e. exactly the reproducibility this operator exists
    to guarantee. NULL ids are indistinguishable rows, so no
    deterministic permutation over them is possible; upstream must
    assign real ids (or filter) before sharding. Loud beats a silently
    unstable training order.
    """
    from pyspark.sql import Window

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    id_str = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(
                f"shuffle_shards: NULL {id_col} — a deterministic shard "
                "permutation needs non-NULL ids; assign or filter upstream"
            )
        ),
    ).otherwise(F.col(id_col).cast("string"))
    hkey = hash64(F.concat(F.lit(f"{seed}:"), id_str))
    out = df.withColumn("__hk", hkey).withColumn(
        "shard", F.pmod(F.col("__hk"), F.lit(num_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("__hk"), F.col(id_col))
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__hk")
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    dim: int = 64,
    rounds: int = 1,
    n_per_cluster: int = 100,
    salt: str = "clusterbal",
) -> DataFrame:
    """Topic-balanced subsample: k-means the embedding space (the
    engine's deterministic seeded quantizer), then keep at most
    ``n_per_cluster`` docs per cluster by content-hash order — so no
    dominant topic/mode swamps the mix, the same balance FineWeb-style
    pipelines buy with cluster-proportional selection.

    Pure composition: ``kmeans_lite_clusters`` (one k x dim centroid
    shuffle per round, shuffle-free assignment) +
    ``stratified_fixed_n`` over the cluster column (window-per-cluster
    row_number — parallelism scales with k, no global sort).
    Deterministic on any layout: seeded centroids, exact-integer
    assignment, hash-ordered selection. Returns (id, cluster) plus the
    quantized columns; join back on ``id_col`` for payloads.
    """
    from .similarity import kmeans_lite_clusters

    assigned = kmeans_lite_clusters(
        df, id_col=id_col, vec_col=vec_col, k=k, dim=dim, rounds=rounds
    )
    return stratified_fixed_n(
        assigned, "cluster", id_col, n_per_cluster, salt=salt
    )


def importance_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = _BUCKETS,
) -> DataFrame:
    """Integer-exact per-document importance weights against a target
    subset — the selection signal behind DSIR-style data curation
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): documents whose unigram distribution
    looks like the ``target`` rows (e.g. a trusted/high-quality
    domain) weigh more than documents that look like the raw-corpus
    background.

    Formulation (the engine's driver-replayable twin of the paper's
    log-likelihood ratio — see ``dsir_logratio_weights`` for the
    faithful float version): per corpus token t,

        s_t = ((ct_t + 1) * scale) div cr_t

    with ``ct_t`` the token's occurrence count inside the target rows
    (add-one smoothed, so unseen-in-target tokens score ``scale div
    cr_t``, vanishing for common background tokens), ``cr_t`` its
    whole-corpus occurrence count (>= 1 by construction — the vocab IS
    the corpus), and the global normalizers dropped (they scale every
    document identically, and every consumer of the weight is
    scale-invariant). Per document: ``weight = sum(s_t over token
    occurrences) div n_tokens`` — the mean per-token target affinity.
    All arithmetic is int64 (ratios floored onto the ``scale`` grid),
    so any engine replays the weights bit-for-bit; at corpora where
    ``(max ct + 1) * scale`` approaches 2^63 widen ``s_t`` to
    decimal(38,0) — the synthetic tables sit ~9 orders below that.

    Plan shape: tokens explode once; ONE corpus-wide token aggregation
    computes ``cr`` and ``ct`` together (the target indicator rides
    the exploded rows — no second scan); the vocab-sized score table
    joins back on the token (broadcast while it fits, hash join
    beyond) and ONE per-document aggregation emits the weights. Two
    shuffles total at any scale, both on natural keys (token, id).
    Documents with no tokens are dropped (no distribution to weigh).

    Returns (id_col, n_tokens, weight).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    dtok = df.select(
        id_col, target.alias("__tgt"), F.explode(toks).alias("__tok")
    )
    vocab = dtok.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.count(F.when(F.col("__tgt"), F.lit(1))).alias("__ct"),
    )
    scores = vocab.select(
        "__tok",
        F.expr(f"((__ct + 1) * CAST({scale} AS BIGINT)) div __cr").alias("__s"),
    )
    return (
        dtok.join(scores, "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(__s) div count(1)").alias("weight"),
        )
    )


def importance_resample(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
    pin=None,
) -> DataFrame:
    """DSIR-style importance resampling: keep each document with
    probability proportional to its ``importance_weights`` weight
    (``E[kept] ∝ weight``, the sampling analogue of the paper's
    importance-resampled selection), via the engine-wide deterministic
    content-hash ppm bucket.

    The keep test cross-multiplies integers — ``bucket * w_max <
    weight * scale`` — so no division, no floats: the 1-row global
    max is broadcast and the corpus side pays one map-side filter on
    top of the two ``importance_weights`` shuffles. Deterministic
    across reruns, partitionings, and engines. Returns
    (id_col, n_tokens, weight) for the kept rows; join back on
    ``id_col`` for payloads.

    ``pin`` materializes the weight frame once for its TWO consumers
    (the kept rows and the 1-row global max) instead of re-deriving
    the token pipeline per consumer (see ``operators.pinning``).
    Default ``None`` = no pinning: unchanged caller failure semantics;
    the benchmark query opts in to ``lazy_checkpoint``.
    """
    w = importance_weights(df, target, id_col, text_col)
    if pin is not None:
        w = pin(w)
    wmax = w.agg(F.max("weight").alias("__wmax"))
    return (
        w.crossJoin(F.broadcast(wmax))
        .filter(
            _bucket(id_col, salt) * F.col("__wmax")
            < F.col("weight") * F.lit(_BUCKETS).cast("bigint")
        )
        .drop("__wmax")
    )


def dsir_logratio_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The faithful DSIR importance weight: per-document mean
    log-likelihood ratio ``mean_t[log p_target(t) - log p_raw(t)]``
    under add-one-smoothed unigram LMs fit on the target rows vs the
    whole corpus.

    This is the paper's estimator (up to the per-document length
    normalization, which makes weights comparable across lengths); it
    is float-valued — ``ln`` is not a correctly-rounded libm op, so
    sums of logs are NOT bit-replayable across engines. It therefore
    stays pytest-verified against a python replay (the
    ``unigram_logprob_score`` precedent), while ``importance_weights``
    is the integer-exact driver twin ranking documents by the same
    target-affinity signal in linear space. Plan shape is identical:
    one token aggregation, one vocab join, one per-document
    aggregation. Returns (id_col, n_tokens, logratio).
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    dtok = df.select(
        id_col, target.alias("__tgt"), F.explode(toks).alias("__tok")
    )
    vocab = dtok.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.count(F.when(F.col("__tgt"), F.lit(1))).alias("__ct"),
    )
    tot = dtok.agg(
        F.count(F.lit(1)).alias("__crtot"),
        F.count(F.when(F.col("__tgt"), F.lit(1))).alias("__cttot"),
        F.countDistinct("__tok").alias("__vocab"),
    )
    lr = (
        F.log((F.col("__ct") + 1) / (F.col("__cttot") + F.col("__vocab")))
        - F.log((F.col("__cr") + 1) / (F.col("__crtot") + F.col("__vocab")))
    ).alias("__lr")
    scores = vocab.crossJoin(F.broadcast(tot)).select("__tok", lr)
    return (
        dtok.join(scores, "__tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("__lr") / F.count(F.lit(1))).alias("logratio"),
        )
    )
