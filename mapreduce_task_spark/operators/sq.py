"""Scalar quantization (SQ8): per-dimension 8-bit compressed vectors —
the middle point on the compression/recall frontier between the flat
index (full vectors, exact) and PQ (m bytes, coarsest).

FAISS's IndexScalarQuantizer shape: fit per-dimension [min, max]
bounds over the corpus (ONE aggregation pass — 2*dim scalar aggregates
in a single agg, no explode/shuffle-per-dim), then encode every
component to ``floor((q - min) * 255 / (max - min))`` in [0, 255].
At rest that is dim bytes per vector — 4x smaller than the engine's
int64 quantized vectors, 8x smaller than float64 — while keeping
per-dimension resolution PQ gives up (SQ has no codebook to drift or
retrain, and decode is a map-side affine expression).

Determinism contract (same as the rest of the ANN stack): encode is
pure int64 arithmetic (multiply, floor-divide) over the fixed-point
``with_quantized`` grid, so codes — and therefore every distance and
ranking — are bitwise-replayable by a SQL oracle. Search decodes each
component as ``min + (code * (max - min)) DIV 255`` (integer floor —
at most one quant-grid unit, 1e-6 of value range, below the SQ error
itself) and ranks by exact int64 squared L2 between the query's exact
grid vector and the decoded candidate; sums stay < 2^53, exact in
int64 and double alike.

``metric="cosine"`` composes exactly as in ``operators.pq``: inputs
unit-normalize on the integer grid first (``with_quantized``
documents the L2==cosine equivalence), everything downstream
unchanged. ``refine=N`` exact-reranks the SQ shortlist on the
original grid vectors via the shared ``pq._refine_exact`` core, so
SQ slots into the same search surface as ADC.

Scale shape: fit is one corpus aggregation to a 1-row bounds frame
(broadcast thereafter); encode is map-only; search is a broadcast
nested-loop scan over the codes column only (the flat-scan
compression option — compose with IVF lists for probe-bounded scans
the way PQ does; the codes ride any cluster partitioning unchanged).

Cite: reference has no vector ops (SURVEY §2.5); this extends the
similarity-search extension family (SURVEY §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import VALID_METRICS, with_quantized

SQ_LEVELS = 255  # 8-bit: codes in [0, 255]


def sq_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    metric: str = "l2",
) -> DataFrame:
    """Per-dimension bounds: a 1-row (minq, maxq) frame of dim-length
    int64 arrays over the (optionally unit-grid normalized) corpus —
    2*dim scalar min/max aggregates computed in ONE pass, packed back
    into arrays. Broadcast-sized forever after."""
    if metric not in VALID_METRICS:
        raise ValueError(f"metric must be one of {VALID_METRICS}, got {metric!r}")
    qd = with_quantized(df, vec_col, metric=metric).select("qv")
    aggs = [
        F.min(F.element_at("qv", i + 1)).alias(f"__mn{i}") for i in range(dim)
    ] + [F.max(F.element_at("qv", i + 1)).alias(f"__mx{i}") for i in range(dim)]
    row = qd.agg(*aggs)
    return row.select(
        F.array(*[F.col(f"__mn{i}") for i in range(dim)]).alias("minq"),
        F.array(*[F.col(f"__mx{i}") for i in range(dim)]).alias("maxq"),
    )


def sq_encode(
    df: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2",
) -> DataFrame:
    """(id, codes): each vector as dim 8-bit codes against the fitted
    bounds — map-only (bounds broadcast as one row). Out-of-range
    components (possible when encoding NEW vectors against frozen
    bounds, e.g. a streaming delta) clamp to the nearest end, the
    standard frozen-bounds degradation (shows up as drift in distance
    quality, never as wrong arithmetic). Integer floor-division —
    deterministic, oracle-replayable. ``metric`` must match the fit."""
    qd = with_quantized(df, vec_col, metric=metric).select(id_col, "qv")
    spread = F.zip_with("maxq", "minq", lambda hi, lo: hi - lo)
    shifted = F.zip_with(
        "qv", "minq", lambda v, lo: F.greatest(v - lo, F.lit(0)) * F.lit(SQ_LEVELS)
    )
    codes = F.zip_with(
        shifted,
        spread,
        lambda num, sp: F.when(
            sp > 0,
            F.least((num - F.pmod(num, sp)) / sp, F.lit(SQ_LEVELS)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return qd.crossJoin(F.broadcast(bounds)).select(
        id_col, codes.alias("codes")
    )


def _sq_decoded(codes_col="codes"):
    """decoded_i = min_i + (code_i * (max_i - min_i)) DIV 255 — the
    reconstruction on the same integer grid as ``qv`` (floor error at
    most one grid unit)."""
    spread = F.zip_with("maxq", "minq", lambda hi, lo: hi - lo)
    step = F.zip_with(
        F.col(codes_col).cast("array<bigint>"),
        spread,
        lambda c, sp: (
            c * sp - F.pmod(c * sp, F.lit(SQ_LEVELS))
        ) / F.lit(SQ_LEVELS),
    )
    return F.zip_with("minq", step, lambda lo, st: lo + st.cast("bigint"))


def sq_topk(
    df: DataFrame,
    query_ids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    metric: str = "l2",
    refine: int = 0,
) -> DataFrame:
    """SQ8 top-k: exact query grid vectors against decoded candidate
    codes. Returns (query_id, cand_id, approx_d, rank) ranked by exact
    int64 squared L2 to the RECONSTRUCTED candidates (asymmetric —
    the query is never quantized to 8 bits, same asymmetry ADC uses);
    ties to lowest cand_id. ``refine=N`` keeps an N*k shortlist and
    exact-reranks it on the original grid vectors (shared
    ``pq._refine_exact`` core; output gains ``exact_d``).

    The candidate side reads only the codes column — the 4x-compressed
    flat scan. The decode + distance is one codegen zip_with chain per
    candidate; no Python anywhere."""
    from .pq import _refine_exact, _sub_dist

    bounds = sq_fit(df, id_col, vec_col, dim, metric=metric)
    cand = sq_encode(df, bounds, id_col, vec_col, metric=metric).select(
        F.col(id_col).alias("cand_id"), "codes"
    )
    qd = with_quantized(df, vec_col, metric=metric).select(id_col, "qv", "nq")
    queries = F.broadcast(
        qd.join(query_ids.select(id_col), id_col).select(
            F.col(id_col).alias("query_id"),
            F.col("qv").alias("qv_q"),
        )
    )
    scored = (
        cand.crossJoin(F.broadcast(bounds))
        .select("cand_id", _sq_decoded().alias("__dv"))
        .join(queries, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            _sub_dist(F.col("qv_q"), F.col("__dv")).alias("approx_d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("cand_id")
    )
    ranked = scored.select("*", F.row_number().over(w).alias("rank"))
    if not refine:
        return ranked.filter(F.col("rank") <= k)
    shortlist = ranked.filter(F.col("rank") <= refine * k).drop("rank")
    qvecs = qd.join(query_ids.select(id_col), id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("nq").alias("nq_q"),
    )
    cvecs = qd.select(
        F.col(id_col).alias("cand_id"),
        F.col("qv").alias("qv_c"),
        F.col("nq").alias("nq_c"),
    )
    return _refine_exact(shortlist, qvecs, cvecs, k, on=["cand_id"])


def sq_build_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    metric: str = "l2",
    store_vectors: bool = True,
) -> None:
    """Build the SQ8 index ONCE and persist it — the
    build-once/search-many split every other index family here has.

    Writes under ``path``:
      - ``bounds``: the 1-row (minq, maxq) frame,
      - ``codes``: (id, codes) — the dim-byte payload a search scans,
      - ``vectors`` (``store_vectors=True``): (id, qv, nq) original
        grid vectors for the exact-rerank refine stage. OPTIONAL
        because skipping it is the point of SQ when storage is the
        constraint — a vectors-less index serves ``refine=0`` only
        (``sq_search_index`` refuses otherwise), the recorded
        tradeoff.
    Plus the shared ``_INDEX_META.json`` (kind/metric/dim/
    store_vectors); ``sq_search_index`` refuses a metric mismatch
    exactly like the IVF-PQ family."""
    from .pq import write_index_meta

    spark = df.sparkSession
    bounds = sq_fit(df, id_col, vec_col, dim, metric=metric)
    bounds.write.mode("overwrite").parquet(f"{path}/bounds")
    bounds_l = spark.read.parquet(f"{path}/bounds")
    sq_encode(df, bounds_l, id_col, vec_col, metric=metric).write.mode(
        "overwrite"
    ).parquet(f"{path}/codes")
    if store_vectors:
        with_quantized(df, vec_col, metric=metric).select(
            id_col, "qv", "nq"
        ).write.mode("overwrite").parquet(f"{path}/vectors")
    write_index_meta(
        spark,
        path,
        {
            "kind": "sq8",
            "metric": metric,
            "dim": dim,
            "store_vectors": store_vectors,
        },
    )


def sq_search_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    metric: str = "l2",
    refine: int = 0,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Search a persisted SQ8 index: decode-and-score the codes column
    against exact query grid vectors (same arithmetic and tie-breaks
    as ``sq_topk``, so a rebuilt index reproduces it bit-for-bit,
    minus sq_topk's self-exclusion only when the query ids are part of
    the indexed corpus — this function excludes cand_id == query_id
    identically). ``refine=N`` exact-reranks against the persisted
    ``vectors`` dataset and REFUSES loudly when the index was built
    ``store_vectors=False``. ``filter_ids`` pre-filters candidates
    (left-semi on the id before scoring, the package-wide filtered-
    search contract)."""
    from .pq import _refine_exact, _sub_dist, check_index_meta, read_index_meta

    check_index_meta(spark, path, metric=metric, dim=dim)
    bounds = spark.read.parquet(f"{path}/bounds")
    cand = spark.read.parquet(f"{path}/codes").select(
        F.col(id_col).alias("cand_id"), "codes"
    )
    if filter_ids is not None:
        cand = cand.join(
            filter_ids.select(F.col(id_col).alias("cand_id")),
            "cand_id",
            "leftsemi",
        )
    qd = with_quantized(queries, vec_col, metric=metric).select(
        id_col, "qv", "nq"
    )
    qb = F.broadcast(
        qd.select(
            F.col(id_col).alias("query_id"), F.col("qv").alias("qv_q")
        )
    )
    scored = (
        cand.crossJoin(F.broadcast(bounds))
        .select("cand_id", _sq_decoded().alias("__dv"))
        .join(qb, F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            _sub_dist(F.col("qv_q"), F.col("__dv")).alias("approx_d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d"), F.asc("cand_id")
    )
    ranked = scored.select("*", F.row_number().over(w).alias("rank"))
    if not refine:
        return ranked.filter(F.col("rank") <= k)
    meta = read_index_meta(spark, path) or {}
    if not meta.get("store_vectors", True):
        raise ValueError(
            f"SQ index at {path} was built store_vectors=False — it "
            "cannot serve refine>0; rebuild with store_vectors=True "
            "or search with refine=0"
        )
    full = spark.read.parquet(f"{path}/vectors")
    qvecs = qd.select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("nq").alias("nq_q"),
    )
    cvecs = full.select(
        F.col(id_col).alias("cand_id"),
        F.col("qv").alias("qv_c"),
        F.col("nq").alias("nq_c"),
    )
    shortlist = ranked.filter(F.col("rank") <= refine * k).drop("rank")
    return _refine_exact(shortlist, qvecs, cvecs, k, on=["cand_id"])
