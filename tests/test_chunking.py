"""Chunking + sequence-packing operator semantics."""

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
    # starts every 6 words: 0, 6, 12, 18, 24
    assert [r["chunk_idx"] for r in got] == [0, 1, 2, 3, 4]
    assert got[0]["chunk_text"].split(" ") == words[0:10]
    assert got[1]["chunk_text"].split(" ") == words[6:16]
    assert got[3]["chunk_text"].split(" ") == words[18:25]  # short tail
    assert got[4]["chunk_text"].split(" ") == words[24:25]
    # consecutive chunks share exactly the overlap (when full-length)
    assert got[0]["chunk_text"].split(" ")[-4:] == got[1]["chunk_text"].split(" ")[:4]
    # every word appears in some chunk
    seen = {w for r in got for w in r["chunk_text"].split(" ")}
    assert seen == set(words)


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
