"""Synthesize a LARGER scale-factor directory from an existing one.

Usage:
    python tools/make_scale_data.py <src_sf_dir> <dest_dir> <factor>

Writes ``<dest_dir>/<table>.parquet`` for every table, with fact
tables replicated ``factor`` times under shifted primary keys (and
deterministic content perturbation where identical copies would
degenerate the workload — e.g. exact-duplicate documents would blow up
LSH buckets quadratically, which measures an adversarial input, not
scaling). Dimension tables (region/nation/customer/supplier/part) are
copied as-is so foreign keys stay valid.

Purpose (r14 verdict #8): the driver benches at sf0.1, where every
query is fixed-overhead-bound and the 8-vs-32-core scaling block shows
ratio ~1 everywhere — the bench cannot demonstrate parallel scaling at
that SF. This tool builds a deterministic sf-(0.1*factor) input under
/tmp for a scan/shuffle-heavy-row scaling pass (core-count ratio
evidence recorded in OPTIMIZATION_r14.md). NOT used by the gate bench
and NOT a substitute for /root/testdata (which is read-only and
driver-generated); nothing here caches or precomputes query results.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

KEY_SHIFT = 100_000_000  # far above any sf0.1 key


def main() -> int:
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from mapreduce_task_spark.session import get_spark

    spark = get_spark(app_name="make_scale_data")
    os.makedirs(dest, exist_ok=True)

    def raw(name):
        return spark.read.parquet(f"{src.rstrip('/')}/{name}.parquet")

    def write(df, name, n_files=32):
        # sized output files (guide §6): one dataset dir per table
        df.repartition(n_files).write.mode("overwrite").parquet(
            f"{dest.rstrip('/')}/{name}.parquet"
        )

    # dimensions: single copy, FKs stay valid
    for name in ("region", "nation", "customer", "supplier", "part"):
        write(raw(name), name, n_files=1)

    def replicated(df, copies: int):
        """UNION of `copies` shifted variants; copy 0 is the original."""
        out = None
        for c in range(copies):
            part = df.withColumn("__copy", F.lit(c))
            out = part if out is None else out.unionByName(part)
        return out

    orders = replicated(raw("orders"), factor).select(
        (F.col("o_orderkey") + F.col("__copy") * KEY_SHIFT).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    )
    write(orders, "orders")

    li = replicated(raw("lineitem"), factor).select(
        (F.col("l_orderkey") + F.col("__copy") * KEY_SHIFT).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )
    write(li, "lineitem")

    ev = replicated(raw("events"), factor).select(
        (F.col("event_id") + F.col("__copy") * KEY_SHIFT).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("__copy") * KEY_SHIFT).alias("user_id"),
        "event_type", "value", "props",
    )
    write(ev, "events")

    # documents: unique per-copy token appended so copies are NEAR
    # duplicates (realistic dedup input), never EXACT duplicates
    docs = replicated(raw("documents"), factor).select(
        (F.col("doc_id") + F.col("__copy") * KEY_SHIFT).alias("doc_id"),
        F.when(F.col("text").isNotNull(), F.concat(
            F.col("text"), F.lit(" zcopy"), F.col("__copy").cast("string"),
            F.lit("x"), F.col("doc_id").cast("string"),
        )).alias("text"),
        "lang", "source",
        (F.col("n_chars")).alias("n_chars"),
    )
    write(docs, "documents")

    # embeddings: deterministic small per-copy perturbation (keeps the
    # vectors distinct so ANN structure is not a single dup cluster)
    emb = replicated(raw("embeddings"), factor).select(
        (F.col("vec_id") + F.col("__copy") * KEY_SHIFT).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x + (F.col("__copy") * (i + 1) % 97).cast("float") * F.lit(1e-4)
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    write(emb, "embeddings")

    print(f"wrote factor-{factor} copy of {src} to {dest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
