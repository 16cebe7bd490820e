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


def test_sq_dim_mismatch_raises_loudly(spark):
    """A vector whose length disagrees with the fitted dim must FAIL,
    not silently null-pad through zip_with into NULL codes/distances
    (r11 ADVICE)."""
    import pytest as _pytest

    rows = [Row(vec_id=i, embedding=[float(i), 1.0, 2.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with _pytest.raises(Exception, match="vector length"):
        sq_fit(df, dim=2).collect()
    bounds = sq_fit(df, dim=3)
    bad = spark.createDataFrame(
        [Row(vec_id=9, embedding=[1.0, 2.0])],
        "vec_id bigint, embedding array<double>",
    )
    with _pytest.raises(Exception, match="vector length"):
        sq_encode(bad, bounds).collect()


def test_sq_flat_index_refuses_list_stats_cleanly(spark, sf_small, tmp_path):
    """index_list_stats / index_health on a FLAT SQ index (which also
    persists a 'codes' dataset, but without inverted lists) must raise
    the clean ValueError, not an unresolved-column AnalysisException
    (r11 ADVICE)."""
    import pytest as _pytest

    from mapreduce_task_spark.operators.pq import index_list_stats
    from mapreduce_task_spark.operators.sq import sq_build_index

    emb = load_table(spark, sf_small, "embeddings").limit(50)
    idx = str(tmp_path / "sq_flat")
    sq_build_index(emb, idx, dim=DIM)
    with _pytest.raises(ValueError, match="kind='sq8'"):
        index_list_stats(spark, idx)


def test_ivfsq_exhaustive_probe_equals_flat_sq(spark, sf_small):
    """nprobe = n_clusters with GLOBAL bounds scans every candidate
    against the same codes — must equal the flat sq_topk bit-for-bit
    (the composition changes cost, never arithmetic)."""
    from mapreduce_task_spark.operators.sq import ivfsq_topk

    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    nc = 4
    want = sorted(
        (r["query_id"], r["cand_id"], r["approx_d"], r["rank"])
        for r in sq_topk(emb, qids, k=K, dim=DIM).collect()
    )
    got = sorted(
        (r["query_id"], r["cand_id"], r["approx_d"], r["rank"])
        for r in ivfsq_topk(
            emb, qids, k=K, n_clusters=nc, dim=DIM, nprobe=nc
        ).collect()
    )
    assert got == want and len(got) == 5 * K


def test_ivfsq_recall_monotone_in_nprobe_and_per_list_bounds(spark, sf_small):
    """Recall@K vs the exact ranking is monotone (non-strict) in nprobe;
    per-list bounds (narrower ranges, finer 8-bit resolution) must also
    stay in the high-recall SQ regime under exhaustive probing — not
    necessarily pointwise >= global (each list's own scale can reorder
    a near-boundary candidate; measured 0.98 vs 1.0 on this fixture)."""
    from mapreduce_task_spark.operators.sq import ivfsq_topk

    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    exact = {}
    for r in _exact_rows(emb, qids).filter(F.col("rank") <= K).collect():
        exact.setdefault(r["query_id"], set()).add(r["cand_id"])

    def recall(**kw):
        got = {}
        for r in ivfsq_topk(emb, qids, k=K, n_clusters=4, dim=DIM, **kw).collect():
            got.setdefault(r["query_id"], set()).add(r["cand_id"])
        return sum(len(exact[q] & got.get(q, set())) / K for q in exact) / len(
            exact
        )

    r1, r2, r4 = recall(nprobe=1), recall(nprobe=2), recall(nprobe=4)
    assert r1 <= r2 <= r4, (r1, r2, r4)
    assert r4 >= 0.8, f"exhaustive-probe IVF-SQ recall too low: {r4}"
    r4_pl = recall(nprobe=4, per_list=True)
    assert r4_pl >= 0.9, (r4_pl, r4)


def test_ivfsq_index_split_matches_inline(spark, sf_small, tmp_path):
    """ivfsq_build_index + ivfsq_search_index reproduce ivfsq_topk
    bit-for-bit for plain AND refined search, global and per-list
    bounds; meta refuses metric mismatch; filter_ids restricts before
    scoring; a vectors-less build refuses refine; and the composed
    codes dataset IS cluster-partitioned (index_list_stats works)."""
    import pytest as _pytest

    from mapreduce_task_spark.operators.pq import (
        index_list_stats,
        read_index_meta,
    )
    from mapreduce_task_spark.operators.sq import (
        ivfsq_build_index,
        ivfsq_search_index,
        ivfsq_topk,
    )

    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    queries = emb.join(qids, "vec_id")
    for per_list in (False, True):
        idx = str(tmp_path / f"ivfsq_{per_list}")
        ivfsq_build_index(
            emb, idx, n_clusters=4, dim=DIM, metric="cosine", per_list=per_list
        )
        meta = read_index_meta(spark, idx)
        assert meta["kind"] == "ivfsq" and meta["per_list"] is per_list
        with _pytest.raises(ValueError, match="metric"):
            ivfsq_search_index(spark, idx, queries, k=K, dim=DIM)  # l2
        for kw in ({}, {"refine": 3}):
            key = "exact_d" if kw else "approx_d"
            got = sorted(
                (r["query_id"], r["cand_id"], r[key], r["rank"])
                for r in ivfsq_search_index(
                    spark, idx, queries, k=K, dim=DIM, nprobe=2,
                    metric="cosine", **kw
                ).collect()
            )
            want = sorted(
                (r["query_id"], r["cand_id"], r[key], r["rank"])
                for r in ivfsq_topk(
                    emb, qids, k=K, n_clusters=4, dim=DIM, nprobe=2,
                    metric="cosine", per_list=per_list, **kw
                ).collect()
            )
            assert got == want and len(got) == 5 * K, (per_list, kw)
        stats = index_list_stats(spark, idx).collect()
        assert sum(r["n_total"] for r in stats) == emb.count()

    idx = str(tmp_path / "ivfsq_False")
    allow = emb.select("vec_id").filter(F.col("vec_id") % 2 == 0)
    fres = ivfsq_search_index(
        spark, idx, queries, k=K, dim=DIM, nprobe=4, metric="cosine",
        filter_ids=allow,
    ).collect()
    assert fres and all(r["cand_id"] % 2 == 0 for r in fres)

    lean = str(tmp_path / "ivfsq_lean")
    ivfsq_build_index(emb, lean, n_clusters=4, dim=DIM, store_vectors=False)
    assert (
        ivfsq_search_index(spark, lean, queries, k=K, dim=DIM, nprobe=2)
        .limit(1)
        .count()
        == 1
    )
    with _pytest.raises(ValueError, match="store_vectors"):
        ivfsq_search_index(spark, lean, queries, k=K, dim=DIM, refine=3)


def test_ivfsq_search_index_dpp_and_filtered_pruning(spark, sf_small, tmp_path):
    """The persisted IVF-SQ search's scale contract plan-asserted:
    the probed-cluster dynamic partition pruning must reach the codes
    scan AND (at refine>0) the vectors scan, and the filter_ids
    left-semi join must not break it — the test_pq.py DPP proof's
    shape for the third index family."""
    from mapreduce_task_spark.operators.sq import (
        ivfsq_build_index,
        ivfsq_search_index,
    )

    emb = load_table(spark, sf_small, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 5)
    queries = emb.join(qids, "vec_id")
    path = str(tmp_path / "ivfsq_dpp")
    ivfsq_build_index(emb, path, n_clusters=4, dim=DIM)

    def assert_dpp(res, label, want_vectors):
        res.collect()
        plan = res._jdf.queryExecution().executedPlan().toString()
        pruned = [
            ln
            for ln in plan.splitlines()
            if "PartitionFilters" in ln and "dynamicpruning" in ln
        ]
        assert any("codes" in ln for ln in pruned), (
            f"codes scan lost cluster DPP ({label})"
        )
        if want_vectors:
            assert any("qv" in ln and "nq" in ln for ln in pruned), (
                f"vectors scan lost cluster DPP ({label})"
            )

    assert_dpp(
        ivfsq_search_index(spark, path, queries, k=K, dim=DIM, nprobe=2),
        "plain",
        want_vectors=False,
    )
    assert_dpp(
        ivfsq_search_index(
            spark, path, queries, k=K, dim=DIM, nprobe=2, refine=3
        ),
        "refined",
        want_vectors=True,
    )
    allow = emb.select("vec_id").filter(F.col("vec_id") % 2 == 0)
    assert_dpp(
        ivfsq_search_index(
            spark, path, queries, k=K, dim=DIM, nprobe=2, refine=3,
            filter_ids=allow,
        ),
        "filtered",
        want_vectors=True,
    )


def test_ivfsq_per_list_bounds_total_over_empty_clusters(spark, sf_small, tmp_path):
    """A centroid can end the build with ZERO assigned vectors (the
    final assignment pass can vacate a previous round's centroid); its
    bounds row must still exist — falling back to the global bounds —
    or a streamed vector later assigned there would silently vanish
    from the delta (inner join on per-list bounds). Pinned at the
    helper level with a synthetic empty cluster AND at the index level
    (one bounds row per centroid; an append drops no rows)."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.sq import (
        _per_list_bounds,
        ivfsq_build_index,
    )
    from mapreduce_task_spark.streaming.ivfsq_ingest import append_batch

    assigned = spark.createDataFrame(
        [Row(cluster=c, qv=[c * 10, -c]) for c in (1, 2, 4)],
        "cluster int, qv array<bigint>",
    )
    cents = spark.createDataFrame(
        [Row(j=j) for j in (1, 2, 3, 4)], "j int"
    )
    b = {r["cluster"]: r for r in _per_list_bounds(assigned, cents, 2).collect()}
    assert set(b) == {1, 2, 3, 4}
    # the empty cluster carries the GLOBAL bounds
    assert list(b[3]["minq"]) == [10, -4] and list(b[3]["maxq"]) == [40, -1]
    assert list(b[1]["minq"]) == [10, -1] and list(b[1]["maxq"]) == [10, -1]

    emb = load_table(spark, sf_small, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    idx = str(tmp_path / "ivfsq_total")
    ivfsq_build_index(base, idx, n_clusters=4, dim=DIM, per_list=True)
    n_cents = spark.read.parquet(f"{idx}/centroids").count()
    assert spark.read.parquet(f"{idx}/bounds").count() == n_cents
    rest = emb.filter(F.col("vec_id") >= 300)
    append_batch(rest, 0, idx)
    assert spark.read.parquet(f"{idx}/delta").count() == rest.count()
