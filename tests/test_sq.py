"""Scalar quantization (SQ8): bounds fit, 8-bit codes, decode error
bound, exhaustive-refine exactness, recall vs the exact ranking —
for both metrics (r11)."""

from pyspark.sql import Row, Window, functions as F

from mapreduce_task_spark.operators.similarity import int_dot, with_quantized
from mapreduce_task_spark.operators.sq import (
    SQ_LEVELS,
    sq_encode,
    sq_fit,
    sq_topk,
)
from mapreduce_task_spark.sources.tables import load_table

DIM, K = 64, 10


def _exact_rows(emb, qids, metric="l2"):
    qd = with_quantized(emb, metric=metric)
    q = qd.join(qids, "vec_id").select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qv_q"),
        F.col("nq").alias("nq_q"),
    )
    c = qd.select(
        F.col("vec_id").alias("cand_id"),
        F.col("qv").alias("qv_c"),
        F.col("nq").alias("nq_c"),
    )
    d = F.col("nq_q") + F.col("nq_c") - 2 * int_dot(F.col("qv_q"), F.col("qv_c"))
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("cand_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", d.alias("d"))
        .select("*", F.row_number().over(w).alias("rank"))
    )


def test_sq_codes_shape_and_python_replay(spark, sf_small):
    """Codes are dim ints in [0,255], and both encode AND decode match
    the documented integer formulas replayed in python exactly."""
    emb = load_table(spark, sf_small, "embeddings").limit(60)
    bounds = sq_fit(emb, dim=DIM)
    b = bounds.collect()[0]
    mn, mx = list(b["minq"]), list(b["maxq"])
    qd = {r["vec_id"]: list(r["qv"]) for r in with_quantized(emb).collect()}
    got = {r["vec_id"]: list(r["codes"]) for r in sq_encode(emb, bounds).collect()}
    assert got and all(len(c) == DIM for c in got.values())
    for vid, qv in qd.items():
        want = [
            min((qv[i] - mn[i]) * SQ_LEVELS // (mx[i] - mn[i]), SQ_LEVELS)
            if mx[i] > mn[i]
            else 0
            for i in range(DIM)
        ]
        assert got[vid] == want, vid
        # decode error bound: one quantization step + one floor unit
        for i in range(DIM):
            dec = mn[i] + got[vid][i] * (mx[i] - mn[i]) // SQ_LEVELS
            step = (mx[i] - mn[i]) // SQ_LEVELS + 1
            assert abs(dec - qv[i]) <= step + 1, (vid, i)


def test_sq_constant_dimension_and_frozen_bounds_clamp(spark):
    """A constant dimension encodes 0 everywhere and decodes back to
    itself; NEW vectors outside frozen bounds clamp to the ends."""
    rows = [Row(vec_id=i, embedding=[float(i) / 10.0, 0.5]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    bounds = sq_fit(df, dim=2)
    enc = {r["vec_id"]: list(r["codes"]) for r in sq_encode(df, bounds).collect()}
    assert all(c[1] == 0 for c in enc.values())  # constant dim -> 0
    assert enc[0][0] == 0 and enc[4][0] == SQ_LEVELS  # ends hit the rails

    out = spark.createDataFrame(
        [Row(vec_id=9, embedding=[9.9, 0.5]), Row(vec_id=10, embedding=[-9.9, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    enc2 = {r["vec_id"]: list(r["codes"]) for r in sq_encode(out, bounds).collect()}
    assert enc2[9][0] == SQ_LEVELS and enc2[10][0] == 0  # clamped


def test_sq_exhaustive_refine_equals_exact_both_metrics(spark, sf_small):
    """refine covering the corpus degrades to brute force: the refined
    result must equal the exact int64 L2^2 top-k bit-for-bit — for l2
    AND for the unit-grid cosine metric."""
    emb = load_table(spark, sf_small, "embeddings")
    n = emb.count()
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    for metric in ("l2", "cosine"):
        want = sorted(
            (r["query_id"], r["cand_id"], r["d"], r["rank"])
            for r in _exact_rows(emb, qids, metric)
            .filter(F.col("rank") <= K)
            .collect()
        )
        got = sorted(
            (r["query_id"], r["cand_id"], r["exact_d"], r["rank"])
            for r in sq_topk(
                emb, qids, k=K, dim=DIM, metric=metric, refine=-(-n // K)
            ).collect()
        )
        assert got == want and len(got) == 5 * K, metric


def test_sq_recall_beats_pq_resolution(spark, sf_small):
    """SQ8 keeps per-dimension resolution, so its unrefined recall@10
    vs exact L2 must be HIGH on this fixture (measured well above the
    ~0.18 PQ regime) — the compression/recall point SQ exists for."""
    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    exact = {}
    for r in _exact_rows(emb, qids).filter(F.col("rank") <= K).collect():
        exact.setdefault(r["query_id"], set()).add(r["cand_id"])
    got = {}
    for r in sq_topk(emb, qids, k=K, dim=DIM).collect():
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    assert set(got) == set(exact)
    recall = sum(len(exact[q] & got[q]) / K for q in exact) / len(exact)
    assert recall >= 0.8, f"SQ8 recall@{K} unexpectedly low: {recall}"


def test_sq_index_split_matches_inline_and_refuses_mismatch(
    spark, sf_small, tmp_path
):
    """sq_build_index + sq_search_index reproduce sq_topk bit-for-bit
    (same bounds, codes, tie-breaks) for plain AND refined search; the
    persisted meta refuses a metric mismatch; a vectors-less build
    serves refine=0 only and refuses refine>0 loudly."""
    import pytest as _pytest

    from mapreduce_task_spark.operators.pq import read_index_meta
    from mapreduce_task_spark.operators.sq import sq_build_index, sq_search_index

    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    queries = emb.join(qids, "vec_id")
    idx = str(tmp_path / "sq_idx")
    sq_build_index(emb, idx, dim=DIM, metric="cosine")
    meta = read_index_meta(spark, idx)
    assert meta["kind"] == "sq8" and meta["metric"] == "cosine"

    with _pytest.raises(ValueError, match="metric"):
        sq_search_index(spark, idx, queries, k=K, dim=DIM)  # default l2

    for kw in ({}, {"refine": 3}):
        key = "exact_d" if kw else "approx_d"
        got = sorted(
            (r["query_id"], r["cand_id"], r[key], r["rank"])
            for r in sq_search_index(
                spark, idx, queries, k=K, dim=DIM, metric="cosine", **kw
            ).collect()
        )
        want = sorted(
            (r["query_id"], r["cand_id"], r[key], r["rank"])
            for r in sq_topk(
                emb, qids, k=K, dim=DIM, metric="cosine", **kw
            ).collect()
        )
        assert got == want and len(got) == 5 * K, kw

    # filtered search: candidates restricted BEFORE scoring
    allow = emb.select("vec_id").filter(F.col("vec_id") % 2 == 0)
    fres = sq_search_index(
        spark, idx, queries, k=K, dim=DIM, metric="cosine", filter_ids=allow
    ).collect()
    assert fres and all(r["cand_id"] % 2 == 0 for r in fres)

    # storage-lean build: no vectors dataset, refine refused
    import os

    lean = str(tmp_path / "sq_lean")
    sq_build_index(emb, lean, dim=DIM, store_vectors=False)
    assert not os.path.exists(f"{lean}/vectors")
    assert (
        sq_search_index(spark, lean, queries, k=K, dim=DIM).limit(1).count() == 1
    )
    with _pytest.raises(ValueError, match="store_vectors"):
        sq_search_index(spark, lean, queries, k=K, dim=DIM, refine=3)
