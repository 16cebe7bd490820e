"""Deterministic sampling / mixing operator semantics."""

from pyspark.sql import functions as F

from mapreduce_task_spark.operators.sampling import (
    hash_sample,
    mix_corpora,
    stratified_sample,
    train_test_split,
)
from mapreduce_task_spark.sources.tables import load_table


def test_hash_sample_fraction_and_determinism(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    s1 = hash_sample(docs, "doc_id", 0.3)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert ids1 == ids2  # reproducible
    assert 0.15 * n <= len(ids1) <= 0.45 * n  # ~binomial around 0.3
    # repartitioning must not change the selection
    ids3 = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3).collect()
    }
    assert ids3 == ids1
    # different salt -> different (but still deterministic) draw
    ids4 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, salt="x").collect()}
    assert ids4 != ids1


def test_hash_sample_fractions_are_nested(spark, sf_small):
    """Monotonicity: the f=0.1 sample is a subset of the f=0.3 sample
    (bucket < threshold is monotone in the threshold) — growing a
    sample never reshuffles previously selected rows, so incremental
    corpus scale-ups only ADD documents."""
    docs = load_table(spark, sf_small, "documents")
    small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_train_test_split_disjoint_exhaustive(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    train, test = train_test_split(docs, "doc_id", test_fraction=0.2)
    tr = {r["doc_id"] for r in train.select("doc_id").collect()}
    te = {r["doc_id"] for r in test.select("doc_id").collect()}
    assert tr.isdisjoint(te)
    assert len(tr) + len(te) == docs.count()
    assert 0 < len(te) < len(tr)


def test_stratified_sample_respects_per_stratum_fractions(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    frac = {"click": 1.0, "view": 0.2}
    got = stratified_sample(ev, "event_type", "event_id", frac)
    counts = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert counts["click"] == totals["click"]  # fraction 1.0 keeps all
    assert 0.05 * totals["view"] <= counts.get("view", 0) <= 0.4 * totals["view"]
    assert set(counts) <= {"click", "view"}  # default fraction 0 drops others


def test_mix_corpora_weights_and_schema(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1).select("text", "doc_id")  # reordered
    mixed = mix_corpora([(a, 1.0), (b, 0.25)], "doc_id")
    na, nb = a.count(), b.count()
    got = mixed.count()
    assert na + 0.05 * nb <= got <= na + 0.6 * nb
    assert set(mixed.columns) == {"doc_id", "text"}


def test_sampling_plan_is_shuffle_free(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    plan = (
        hash_sample(docs, "doc_id", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_weighted_sample_matches_python_replay(spark):
    """A-Res selection is md5-replayable: an independent python
    implementation of u^(1/w) ranking picks the identical sample."""
    import hashlib

    from pyspark.sql import Row

    from mapreduce_task_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(30)]
    df = spark.createDataFrame(
        [Row(doc_id=i, w=w) for i, w in rows], "doc_id bigint, w double"
    ).repartition(4)

    def key(i, w):
        b = int(hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        return ((b + 1) / 1_000_000.0) ** (1.0 / w)

    expected = {i for i, w in sorted(rows, key=lambda r: (-key(*r), r[0]))[:10]}
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert got == expected
    # deterministic under a different partitioning
    again = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(9), "doc_id", "w", 10).collect()
    }
    assert again == got


def test_weighted_sample_prefers_heavy_weights_drops_nonpositive(spark):
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=0, w=10_000.0)]
        + [Row(doc_id=i, w=0.05) for i in range(1, 40)]
        + [Row(doc_id=99, w=0.0), Row(doc_id=100, w=-1.0)],
        "doc_id bigint, w double",
    )
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 5).collect()}
    assert 0 in got          # u^(1/10000) ~ 1: effectively always drawn
    assert 99 not in got and 100 not in got
    assert len(got) == 5


def test_quality_bins_balanced_monotone_deterministic(spark, sf_small):
    from mapreduce_task_spark.operators.sampling import quality_bins
    from mapreduce_task_spark.operators.textstats import quality_features
    from mapreduce_task_spark.sources.tables import load_table

    qf = quality_features(load_table(spark, sf_small, "documents"))
    binned = quality_bins(qf, n_bins=4)
    rows = binned.select("doc_id", "quality_score", "quality_bin").collect()
    n = len(rows)
    counts = {}
    for r in rows:
        counts[r["quality_bin"]] = counts.get(r["quality_bin"], 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    for b, c in counts.items():
        assert 0.1 * n <= c <= 0.45 * n, (b, c, n)  # roughly quartile-sized
    # monotone: every bin-3 score >= every bin-0 score
    lo = max(r["quality_score"] for r in rows if r["quality_bin"] == 0)
    hi = min(r["quality_score"] for r in rows if r["quality_bin"] == 3)
    assert hi >= lo
    # deterministic across recomputation
    again = {r["doc_id"]: r["quality_bin"] for r in
             quality_bins(qf, n_bins=4).collect()}
    assert all(again[r["doc_id"]] == r["quality_bin"] for r in rows)


def test_curriculum_mix_tiers_and_reproducibility(spark, sf_small):
    from mapreduce_task_spark.operators.sampling import curriculum_mix, quality_bins
    from mapreduce_task_spark.operators.textstats import quality_features
    from mapreduce_task_spark.sources.tables import load_table

    qf = quality_features(load_table(spark, sf_small, "documents"))
    fr = {0: 0.1, 1: 0.3, 2: 0.7, 3: 1.0}
    mixed = curriculum_mix(qf, "doc_id", fr)
    binned = quality_bins(qf, n_bins=4)
    tot = {r["quality_bin"]: r["n"] for r in
           binned.groupBy("quality_bin").count().withColumnRenamed("count", "n").collect()}
    kept = {r["quality_bin"]: r["n"] for r in
            mixed.groupBy("quality_bin").count().withColumnRenamed("count", "n").collect()}
    # best tier fully kept; kept fraction non-decreasing in tier
    assert kept[3] == tot[3]
    rates = [kept.get(b, 0) / tot[b] for b in range(4)]
    assert all(a <= b + 1e-9 for a, b in zip(rates, rates[1:])), rates
    # reproducible
    assert mixed.count() == curriculum_mix(qf, "doc_id", fr).count()


def test_cap_per_group_keeps_best_n_per_source(spark, sf_small):
    from mapreduce_task_spark.operators.sampling import cap_per_group
    from mapreduce_task_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    capped = cap_per_group(docs, "source", "n_chars", 5)
    sizes = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes and all(n <= 5 for n in sizes.values())
    # kept rows are exactly the top-5 by (n_chars desc, doc_id) per source
    from pyspark.sql import Window

    best = {
        (r["source"], r["doc_id"])
        for r in docs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.desc("n_chars"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("rn") <= 5)
        .collect()
    }
    got = {(r["source"], r["doc_id"]) for r in capped.collect()}
    assert got == best


def test_stratified_fixed_n_exact_counts_and_reproducible(spark, sf_small):
    from mapreduce_task_spark.operators.sampling import stratified_fixed_n
    from mapreduce_task_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    take = stratified_fixed_n(docs, "lang", "doc_id", 20)
    sizes = {
        r["lang"]: r["n"]
        for r in take.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {k: min(20, v) for k, v in avail.items()}
    # partitioning-invariant: same ids under a different layout
    a = {r["doc_id"] for r in take.collect()}
    b = {
        r["doc_id"]
        for r in stratified_fixed_n(
            docs.repartition(13), "lang", "doc_id", 20
        ).collect()
    }
    assert a == b


def test_percentile_approx_exact_regime_is_ceil_rank(spark):
    """Pins the oracle's quantile convention: while n <= accuracy,
    Spark's percentile_approx returns the value at 1-based rank
    ceil(q * n) — the order statistic sampling_shapes' qbins oracle
    replays. A Spark upgrade changing the GK exact-regime convention
    breaks here LOUDLY instead of as a driver hash-mismatch."""
    import math
    import random

    from pyspark.sql import functions as F

    random.seed(11)
    for n in (7, 10, 13, 101, 256):
        vals = sorted(random.sample(range(1_000_000), n))
        df = spark.createDataFrame([(v,) for v in vals], ["x"])
        qs = [0.1, 0.25, 0.5, 0.75, 0.9]
        cuts = df.agg(F.percentile_approx("x", qs, 10_000).alias("c")).collect()[0]["c"]
        for q, c in zip(qs, cuts):
            assert c == vals[math.ceil(q * n) - 1], (n, q)


def test_weighted_sample_key_scale_quantized_selection(spark):
    """key_scale ranks by floor(u^(1/w) * scale) with id tie-break —
    the engine-replayable grid. Replayed exactly in python (same pow on
    the same doubles in-process; cross-engine variance is what the grid
    absorbs)."""
    import hashlib
    import math

    from mapreduce_task_spark.operators.sampling import weighted_sample

    rows = [(i, 50 + (i * 37) % 400) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])

    def bucket(i):
        h = hashlib.md5(f"wsample:{i}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    keyed = [
        (math.floor(((bucket(i) + 1) / 1_000_000) ** (1.0 / w) * 1e9), i, w)
        for i, w in rows
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = {i for _k, i, _w in keyed[:40]}
    got = {
        r["doc_id"]
        for r in weighted_sample(df, "doc_id", "w", 40, key_scale=10**9).collect()
    }
    assert got == want


def test_shuffle_shards_is_a_reproducible_permutation(spark, sf_small):
    """shuffle_shards: (shard, pos) is a total, seed-reproducible
    pseudorandom permutation — every row appears exactly once, pos is
    dense 0..n_shard-1 within each shard, reruns and repartitioned
    inputs agree exactly, and a different seed yields a different
    order."""
    from mapreduce_task_spark.operators.sampling import shuffle_shards
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id")
    n = docs.count()

    out = shuffle_shards(docs, "doc_id", num_shards=4).collect()
    assert len(out) == n
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard

    again = shuffle_shards(docs.repartition(7), "doc_id", num_shards=4).collect()
    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    assert key(again) == key(out)

    other = shuffle_shards(docs, "doc_id", num_shards=4, seed="other").collect()
    assert key(other) != key(out)
    # but still a permutation of the same rows
    assert {r["doc_id"] for r in other} == {r["doc_id"] for r in out}


def test_shuffle_shards_fails_loudly_on_null_ids(spark):
    """A NULL id would hash to a NULL shard (outside 0..n-1) with
    nondeterministic pos among NULL rows — the exact irreproducibility
    the operator promises away — so execution raises instead of
    silently writing an unstable training order. NULL-free frames are
    unaffected."""
    import pytest
    from pyspark.errors import PySparkException

    from mapreduce_task_spark.operators.sampling import shuffle_shards

    ok = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    assert shuffle_shards(ok, "doc_id", num_shards=2).count() == 2

    bad = spark.createDataFrame([(1,), (None,)], "doc_id bigint")
    with pytest.raises(PySparkException, match="NULL doc_id"):
        shuffle_shards(bad, "doc_id", num_shards=2).collect()


def test_cluster_balanced_sample_caps_each_cluster(spark, sf_small):
    """Topic balancing: every k-means cluster contributes
    min(cluster_size, n) docs, selection is deterministic across
    reruns, and the sample is a subset of the corpus."""
    from mapreduce_task_spark.operators.sampling import cluster_balanced_sample
    from mapreduce_task_spark.operators.similarity import kmeans_lite_clusters
    from mapreduce_task_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    n = 20
    got = cluster_balanced_sample(emb, k=6, n_per_cluster=n, rounds=1)
    sizes = {
        r["cluster"]: r["n"]
        for r in kmeans_lite_clusters(emb, k=6, rounds=1)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    picked = {
        r["cluster"]: r["n"]
        for r in got.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert picked == {c: min(sz, n) for c, sz in sizes.items()}
    ids = {r["vec_id"] for r in got.collect()}
    assert ids <= {r["vec_id"] for r in emb.select("vec_id").collect()}
    again = {
        r["vec_id"]
        for r in cluster_balanced_sample(emb, k=6, n_per_cluster=n, rounds=1).collect()
    }
    assert again == ids


def test_cluster_balanced_sample_total_on_empty_input(spark, sf_small):
    from mapreduce_task_spark.operators.sampling import cluster_balanced_sample
    from mapreduce_task_spark.sources.tables import load_table

    emb = (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", "embedding")
        .limit(0)
    )
    assert cluster_balanced_sample(emb, k=4, n_per_cluster=5).count() == 0


def test_temperature_mix_proportions_and_determinism(spark, sf_small):
    """E[kept_d] ∝ n_d^alpha: with alpha=0.5 a domain 4x the size of
    another should keep ~2x the rows (sqrt damping), the smallest
    domain keeps everything, alpha=1 is the identity, and the
    selection is layout-invariant (content-hash, not RNG)."""
    from mapreduce_task_spark.operators.sampling import temperature_mix
    from mapreduce_task_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "source")
    n_by = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_min = min(n_by.values())

    out = temperature_mix(docs, alpha=0.5)
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in n_by.items():
        expect = n * (n / n_min) ** -0.5  # = sqrt(n * n_min)
        got = kept.get(s, 0)
        # ppm-hash binomial tolerance: generous but catches wrong math
        assert abs(got - expect) <= max(10, 0.25 * expect), (s, got, expect)
    # the smallest domain's threshold is exactly 1e6: kept in full
    smallest = min(n_by, key=n_by.get)
    assert kept[smallest] == n_by[smallest]

    # alpha=1 identity
    assert temperature_mix(docs, alpha=1.0).count() == docs.count()

    # layout invariance: same rows under any partitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         temperature_mix(docs.repartition(7, "doc_id"), alpha=0.5).collect()}
    assert a == b and len(a) > 0

    # alpha > 1 normalizes by the LARGEST domain (fractions <= 1) and
    # up-weights big domains: largest kept in full
    up = temperature_mix(docs, alpha=2.0)
    kept2 = {r["source"]: r["n"] for r in
             up.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    largest = max(n_by, key=n_by.get)
    assert kept2[largest] == n_by[largest]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_mix(docs, alpha=-0.1)


def test_temperature_mix_total_on_empty_and_null_domains(spark, sf_small):
    """Totality: empty input returns empty (no 1-row collect, no ANSI
    division trap), and NULL-domain rows are excluded per the
    documented contract (inner join on NULL matches nothing)."""
    from mapreduce_task_spark.operators.sampling import temperature_mix

    empty = spark.createDataFrame([], "doc_id bigint, source string")
    assert temperature_mix(empty, alpha=0.5).count() == 0

    mixed = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")],
        "doc_id bigint, source string",
    )
    out = temperature_mix(mixed, alpha=1.0)  # identity fractions
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 not in ids and ids == {1, 2, 4}


def _dsir_docs(spark):
    """Planted corpus: target (t=True) docs speak alpha/beta, background
    docs speak gamma/delta, one mixed doc speaks both."""
    rows = [
        (1, True, "alpha beta alpha beta"),
        (2, True, "beta alpha beta alpha"),
        (3, False, "gamma delta gamma delta"),
        (4, False, "delta gamma delta gamma"),
        (5, False, "gamma delta delta gamma"),
        (6, False, "alpha beta gamma delta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, t boolean, text string")


def _dsir_weights_python(rows, scale=1_000_000):
    """Integer replay of importance_weights: (ct+1)*scale div cr per
    token, mean per doc (floor div) — the oracle's arithmetic."""
    from collections import Counter

    cr, ct = Counter(), Counter()
    for _, tgt, text in rows:
        for tok in text.split():
            cr[tok] += 1
            if tgt:
                ct[tok] += 1
    s = {tok: ((ct[tok] + 1) * scale) // cr[tok] for tok in cr}
    out = {}
    for doc_id, _, text in rows:
        toks = text.split()
        out[doc_id] = sum(s[t] for t in toks) // len(toks)
    return out


def test_importance_weights_match_integer_replay_and_separate(spark):
    from mapreduce_task_spark.operators.sampling import importance_weights

    docs = _dsir_docs(spark)
    got = {
        r["doc_id"]: r["weight"]
        for r in importance_weights(docs, F.col("t")).collect()
    }
    rows = [(r["doc_id"], r["t"], r["text"]) for r in docs.collect()]
    assert got == _dsir_weights_python(rows)
    # target-affine docs weigh strictly more than background docs,
    # the mixed doc strictly between
    lo = max(got[3], got[4], got[5])
    hi = min(got[1], got[2])
    assert lo < got[6] < hi


def test_importance_resample_proportional_deterministic(spark):
    from mapreduce_task_spark.operators.sampling import importance_resample

    docs = _dsir_docs(spark)
    kept = {r["doc_id"] for r in importance_resample(docs, F.col("t")).collect()}
    # a max-weight doc passes the keep test for EVERY hash value
    # (bucket * wmax < wmax * 1e6 <=> bucket < 1e6, always true)
    assert {1, 2} <= kept
    # layout must not change the selection
    kept2 = {
        r["doc_id"]
        for r in importance_resample(docs.repartition(5), F.col("t")).collect()
    }
    assert kept2 == kept


def test_dsir_logratio_matches_python_replay(spark):
    import math
    from collections import Counter

    from mapreduce_task_spark.operators.sampling import dsir_logratio_weights

    docs = _dsir_docs(spark)
    rows = [(r["doc_id"], r["t"], r["text"]) for r in docs.collect()]
    cr, ct = Counter(), Counter()
    for _, tgt, text in rows:
        for tok in text.split():
            cr[tok] += 1
            if tgt:
                ct[tok] += 1
    Cr, Ct, V = sum(cr.values()), sum(ct.values()), len(cr)
    lr = {
        tok: math.log((ct[tok] + 1) / (Ct + V)) - math.log((cr[tok] + 1) / (Cr + V))
        for tok in cr
    }
    want = {
        doc_id: sum(lr[t] for t in text.split()) / len(text.split())
        for doc_id, _, text in rows
    }
    got = {
        r["doc_id"]: r["logratio"]
        for r in dsir_logratio_weights(docs, F.col("t")).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == __import__("pytest").approx(want[d], rel=1e-12)
    # the float estimator ranks documents the same way the integer
    # driver twin does on this fixture: targets above mixed above bg
    assert min(got[1], got[2]) > got[6] > max(got[3], got[4], got[5])


def test_importance_ops_total_on_empty_input(spark):
    from mapreduce_task_spark.operators.sampling import (
        dsir_logratio_weights,
        importance_resample,
        importance_weights,
    )

    empty = spark.createDataFrame([], "doc_id long, t boolean, text string")
    assert importance_weights(empty, F.col("t")).count() == 0
    assert importance_resample(empty, F.col("t")).count() == 0
    assert dsir_logratio_weights(empty, F.col("t")).count() == 0
    # all-null text degrades to empty (no tokens), not an error
    nulls = spark.createDataFrame(
        [(1, True, None), (2, False, None)], "doc_id long, t boolean, text string"
    )
    assert importance_weights(nulls, F.col("t")).count() == 0
