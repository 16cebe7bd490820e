"""Layout invariance: determinism-critical queries return BIT-IDENTICAL
rows no matter how the data is partitioned.

At 100 TB the physical layout is never stable — shuffle-partition
counts follow cluster size, scan splits follow file sizes and
`maxPartitionBytes`, AQE coalesces at runtime — so any result that
depends on partition count or intra-partition order is a latent
wrong-answer bug that small-scale tests can't see. The engine's
determinism design (integer micro/nano/pico units, decimal(38,0)
moments, content-hash sampling keys, fixed fold orders, explicit
tie-breaks in every top-k window) exists exactly to make this test
pass; the round-8 out-of-band evidence (the full oracle gate green
under a 7-core / 7-shuffle-partition layout) graduates here to a
pinned in-suite assertion.

The queries chosen are the ones whose determinism story is
load-bearing: banded-LSH dedup (join order varies wildly with
layout), integer PageRank + triangles (iterative sums), A-Res /
content-hash sampling, decimal OLS moments, BPE's per-round argmax
(ties broken lexically), and the shuffle_shards permutation whose
whole contract is layout-independent reproducibility.
"""

import pytest

from mapreduce_task_spark.registry import all_queries

# (shuffle partitions, files.maxPartitionBytes) — the second axis
# forces many tiny scan splits, the opposite extreme from the
# default one-file-one-split shape at sf0.001
LAYOUTS = [(3, "134217728"), (37, "65536")]

QUERIES = [
    "dedup_minhash_lsh",
    "graph_analytics",
    "sampling_shapes",
    "timeseries_shapes",
    "bpe",
]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _with_layout(spark, parts, max_bytes, fn):
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_bytes)
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_bytes)


@pytest.mark.parametrize("name", QUERIES)
def test_query_rows_invariant_across_layouts(spark, sf_small, name):
    q = all_queries()[name]
    want = _canon(q.fn(spark, sf_small))
    assert len(want) > 0
    for parts, max_bytes in LAYOUTS:
        got = _with_layout(
            spark, parts, max_bytes, lambda: _canon(q.fn(spark, sf_small))
        )
        assert got == want, (
            f"{name} rows changed under layout (shuffle={parts}, "
            f"maxPartitionBytes={max_bytes})"
        )


def test_shuffle_shards_permutation_invariant_across_layouts(spark, sf_small):
    """The training-shard permutation is a pure function of (ids, seed,
    n_shards) — the same document lands in the same shard at the same
    position whether the corpus arrives in 1 split or 40."""
    from mapreduce_task_spark.operators.sampling import shuffle_shards
    from mapreduce_task_spark.sources.tables import load_table

    def run():
        docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
        return _canon(shuffle_shards(docs, "doc_id", num_shards=5, seed="s7"))

    want = run()
    assert len(want) > 0
    for parts, max_bytes in LAYOUTS:
        got = _with_layout(spark, parts, max_bytes, run)
        assert got == want
