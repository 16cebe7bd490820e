"""Chunking + sequence-packing operator semantics."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from mapreduce_task_spark.operators.chunking import chunk_documents, pack_chunks


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_chunk_covers_all_words_with_overlap(spark):
    words = [f"w{i}" for i in range(25)]
    df = _docs(spark, [" ".join(words)])
    got = sorted(
        chunk_documents(df, chunk_words=10, overlap=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts every 6 words, bounded at size-overlap-1=20: 0, 6, 12, 18
    # (a chunk at 24 would be words[24:25], wholly inside chunk 3)
    assert [r["chunk_idx"] for r in got] == [0, 1, 2, 3]
    assert got[0]["chunk_text"].split(" ") == words[0:10]
    assert got[1]["chunk_text"].split(" ") == words[6:16]
    assert got[3]["chunk_text"].split(" ") == words[18:25]  # short tail
    # consecutive chunks share exactly the overlap (when full-length)
    assert got[0]["chunk_text"].split(" ")[-4:] == got[1]["chunk_text"].split(" ")[:4]
    # every word appears in some chunk
    seen = {w for r in got for w in r["chunk_text"].split(" ")}
    assert seen == set(words)


def test_chunk_tail_never_contained_in_predecessor(spark):
    # 128-word doc at chunk_words=128, overlap=32: the old start bound
    # (size-1) emitted a second chunk duplicating the last 32 words
    words = [f"w{i}" for i in range(128)]
    df = _docs(spark, [" ".join(words)])
    got = chunk_documents(df, chunk_words=128, overlap=32).collect()
    assert len(got) == 1 and got[0]["n_words"] == 128
    # one word past the boundary -> a second chunk with 1 new word
    df2 = _docs(spark, [" ".join(f"w{i}" for i in range(129))])
    got2 = sorted(
        chunk_documents(df2, chunk_words=128, overlap=32).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["n_words"] for r in got2] == [128, 33]


def test_chunk_short_and_empty_docs(spark):
    df = _docs(spark, ["only three words", "", "   "])
    got = chunk_documents(df, chunk_words=10, overlap=2).collect()
    assert len(got) == 1
    assert got[0]["doc_id"] == 0 and got[0]["n_words"] == 3


def test_pack_respects_budget_within_one_item(spark):
    df = _docs(spark, [" ".join(f"w{i}" for i in range(40))] * 5)
    chunks = chunk_documents(df, chunk_words=16, overlap=0)
    packed = pack_chunks(chunks, budget=30, n_shards=4)
    rows = packed.collect()
    assert len(rows) == chunks.count()
    bins: dict[tuple, list] = {}
    for r in rows:
        bins.setdefault((r["shard"], r["bin"]), []).append(
            (r["doc_id"], r["chunk_idx"], r["n_words"])
        )
    # exclusive-prefix binning: every bin except its (pack-order) last
    # item fits the budget
    for items in bins.values():
        sizes = [n for _, _, n in sorted(items)]
        assert sum(sizes) - sizes[-1] < 30
    # deterministic
    again = {
        (r["doc_id"], r["chunk_idx"]): (r["shard"], r["bin"])
        for r in pack_chunks(chunks, budget=30, n_shards=4).collect()
    }
    first = {(r["doc_id"], r["chunk_idx"]): (r["shard"], r["bin"]) for r in rows}
    assert first == again


def test_chunking_plan_is_shuffle_free(spark):
    df = _docs(spark, ["a b c"])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _seq_greedy_bins(sizes, budget):
    """Bins used by ONE sequential exclusive-prefix-sum packer (the
    same binning rule pack_chunks applies per shard, unsharded)."""
    prefix = 0
    last_bin = -1
    n_bins = 0
    for s in sizes:
        b = prefix // budget
        if b != last_bin:
            n_bins += 1
            last_bin = b
        prefix += s
    return n_bins


@settings(max_examples=12, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=64), min_size=1, max_size=60),
    n_shards=st.integers(min_value=1, max_value=8),
)
def test_pack_cross_shard_waste_bound(spark, sizes, n_shards):
    """Global waste bound for shard-local packing (SCALE.md claim):

    with every item <= budget, total bins across shards is at most
    sequential-greedy bins + number of non-empty shards. Proof sketch:
    per shard, bins_s - 1 = floor((T_s - last_s)/budget), so
    sum(bins_s - 1) <= floor(T/budget) <= seq bins. Each shard's only
    possible waste is its one trailing partial bin.
    """
    budget = 64  # all sizes <= budget by construction
    df = spark.createDataFrame(
        [Row(doc_id=i, chunk_idx=0, n_words=s) for i, s in enumerate(sizes)],
        "doc_id bigint, chunk_idx bigint, n_words bigint",
    )
    rows = pack_chunks(df, budget=budget, n_shards=n_shards).collect()
    bins = {(r["shard"], r["bin"]) for r in rows}
    nonempty_shards = {r["shard"] for r in rows}
    seq = _seq_greedy_bins(sizes, budget)
    assert len(bins) <= seq + len(nonempty_shards)


def test_assemble_sequences_concatenates_in_pack_order(spark):
    from mapreduce_task_spark.operators.chunking import assemble_sequences

    texts = [" ".join(f"d{d}w{i}" for i in range(20)) for d in range(6)]
    chunks = chunk_documents(_docs(spark, texts), chunk_words=8, overlap=0)
    packed = pack_chunks(chunks, budget=12, n_shards=3)
    seqs = assemble_sequences(packed).collect()

    by_bin: dict[tuple, list] = {}
    for r in packed.collect():
        by_bin.setdefault((r["shard"], r["bin"]), []).append(
            (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_words"])
        )
    assert len(seqs) == len(by_bin)
    for r in seqs:
        items = sorted(by_bin[(r["shard"], r["bin"])])
        assert r["sequence_text"] == " ".join(t for _, _, t, _ in items)
        assert r["n_chunks"] == len(items)
        assert r["n_words"] == sum(n for _, _, _, n in items)
    # every chunk's words appear in exactly one sequence
    all_words = " ".join(r["sequence_text"] for r in seqs).split()
    assert sorted(all_words) == sorted(w for t in texts for w in t.split())
