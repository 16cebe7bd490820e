"""Document chunking + sequence packing for LLM training pipelines.

The two steps between a cleaned corpus and a training shard:

- ``chunk_documents``: split each document into overlapping fixed-size
  word-window chunks (the context-window prep step). Pure codegen —
  split -> sequence -> explode -> slice -> array_join; no UDF, no
  shuffle: chunking runs at scan speed and parallelism.
- ``pack_chunks``: assign chunks to training-sequence bins of at most
  ``budget`` tokens (plus one overhanging item — the standard
  streaming-packing bound). Packing is SHARD-LOCAL by design: a global
  greedy pack would serialize through one partition (the 100 TB
  anti-pattern); instead rows hash into ``n_shards`` independent
  shards, each packed by a per-shard running prefix sum. Bin quality
  is within one item of greedy; parallelism is ``n_shards``.

The reference has no analogue (it is three MR jobs); these extend the
LLM-pipeline surface alongside dedup/similarity (BASELINE.json north
star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(doc) -> one row per overlapping word-window chunk.

    Output: (id_col, chunk_idx, n_words, chunk_text). Chunks start
    every ``chunk_words - overlap`` words; the final chunk may be
    shorter. Empty documents produce no chunks. The start sequence is
    bounded at ``size - overlap - 1``: a chunk starting later would be
    wholly contained in its predecessor (its tail is all overlap),
    which would emit duplicated training sequences downstream.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    step = chunk_words - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__toks") - overlap - 1, F.lit(0)),
        F.lit(step),
    )
    out = (
        df.select(id_col, toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(id_col, "__toks", F.posexplode(starts).alias("chunk_idx", "__start"))
        .select(
            id_col,
            "chunk_idx",
            F.slice(F.col("__toks"), F.col("__start") + 1, chunk_words).alias("__c"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__c").alias("n_words"),
            F.array_join("__c", " ").alias("chunk_text"),
        )
    )
    return out


def pack_chunks(
    df: DataFrame,
    size_col: str = "n_words",
    id_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    budget: int = 2048,
    n_shards: int = 256,
) -> DataFrame:
    """Assign each chunk a (shard, bin) training-sequence id.

    Rows hash into ``n_shards`` independent shards on ALL of
    ``id_cols`` (uniform sharding: a huge document's chunks spread
    across shards instead of skewing one). Per shard, rows are ordered
    deterministically by ``id_cols`` and binned by
    ``floor(exclusive_prefix_sum / budget)``: every bin's total is
    < budget + its last item (at most one overhang), matching greedy
    packing to within one item per bin; across shards the extra bins
    vs one sequential greedy pack are bounded by the shard count
    (property-tested in tests/test_chunking.py). The window is
    per-shard, so state and sort are shard-sized — choose ``n_shards``
    ~ cluster cores at scale.

    The shard hash is the engine-portable md5-derived ``hash64``
    (functions/hashing.py), so a SQL oracle replays the exact (shard,
    bin) assignment.
    """
    from ..functions.hashing import hash64

    key = F.concat_ws("|", F.lit("pack"), *[F.col(c).cast("string") for c in id_cols])
    shard = F.pmod(hash64(key), F.lit(n_shards))
    w = (
        Window.partitionBy("__shard")
        .orderBy(*id_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return (
        df.withColumn("__shard", shard)
        .withColumn("bin", F.floor(prefix / F.lit(budget)).cast("long"))
        .withColumnRenamed("__shard", "shard")
    )


def assemble_sequences(
    packed: DataFrame,
    id_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    text_col: str = "chunk_text",
    size_col: str = "n_words",
    sep: str = " ",
) -> DataFrame:
    """(shard, bin) -> one assembled training sequence.

    The final step of chunk -> pack -> assemble: every bin's chunks
    concatenated in pack order (the same ``id_cols`` ordering
    ``pack_chunks`` binned by), with token accounting. One groupBy on
    the (shard, bin) key — already the packing partitioning — and the
    in-group ordering is a local ``array_sort`` over collected
    structs, so no window or secondary shuffle. Output:
    (shard, bin, n_chunks, n_words, sequence_text).
    """
    key_struct = F.struct(*[F.col(c) for c in id_cols], F.col(text_col).alias("__t"))
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(size_col).alias(size_col),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(key_struct)), lambda s: s["__t"]),
            sep,
        ).alias("sequence_text"),
    )
