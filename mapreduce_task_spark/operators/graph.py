"""Graph analytics over pair tables (e.g. near-dup candidate edges).

``triangle_count`` implements the degree-oriented algorithm from the
MapReduce literature (Suri & Vassilvitskii's "curse of the last
reducer" fix): orient every edge from its lower-degree endpoint to
the higher-degree one (ties by id), enumerate wedges only from each
vertex's OUT-edges, and close them against the edge set. A hub of
degree d contributes O(d) wedges instead of O(d^2), bounding the
worst reducer by O(m^1.5) total wedge work — the difference between
a power-law graph finishing and one reducer running forever.

Shuffle plan: one degree aggregation, one self-join on the wedge
pivot, one closing semi-join — all on 8-byte vertex keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def canonical_edges(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Undirected edge set as distinct (u < v) rows, self-loops dropped."""
    u = F.least(F.col(src), F.col(dst))
    v = F.greatest(F.col(src), F.col(dst))
    return (
        pairs.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """One row per triangle (x < y < z by the degree order's ranks
    mapped back to ids): (a, b, c) with a < b < c.

    Each triangle is emitted exactly once: wedges are built from the
    degree-orientation's out-edges (lo -> hi), so the triangle's
    minimum-degree vertex is the unique wedge pivot."""
    e = canonical_edges(pairs, src, dst)
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): lo = smaller (d, id), hi = larger
    ed = (
        e.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            )
            .otherwise(F.struct(F.col("v").alias("lo"), F.col("u").alias("hi")))
            .alias("o")
        )
        .select(F.col("o.lo").alias("lo"), F.col("o.hi").alias("hi"))
    )
    # wedges from each pivot's out-edges (both legs oriented out of lo)
    w = (
        ed.alias("e1")
        .join(ed.alias("e2"), F.col("e1.lo") == F.col("e2.lo"))
        .filter(F.col("e1.hi") < F.col("e2.hi"))
        .select(
            F.col("e1.lo").alias("p"),
            F.col("e1.hi").alias("q"),
            F.col("e2.hi").alias("r"),
        )
    )
    # close the wedge against the undirected edge set (q < r already)
    tri = w.join(
        e, (F.col("q") == F.col("u")) & (F.col("r") == F.col("v")), "left_semi"
    )
    srt = F.array_sort(F.array("p", "q", "r"))
    return tri.select(
        srt[0].alias("a"), srt[1].alias("b"), srt[2].alias("c")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank on a directed edge list: (node, rank), sum(rank) == 1.

    Power iteration with the standard dangling-mass redistribution:
    each round is one contribution join (rank/out-degree along edges),
    one sum-by-destination, and a 1-row aggregate that collects the
    dangling mass to spread uniformly. Ranks and degrees are persisted
    with per-round swap (the connected-components pattern); lineage is
    cut by materializing each round, so plan depth stays constant.

    Scale: per round, one shuffle keyed by node id; the edge table is
    re-used unshuffled when pre-partitioned by src (bucketed graph
    layout), which is how a 1000-executor deployment avoids
    re-exchanging the (much larger) edge side every round.

    Determinism: fixed iteration count (no float-tolerance stopping),
    so results depend only on summation order; the test compares to a
    Python reference under a tolerance, not bitwise.
    """
    verts = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = verts.count()
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("to"))
    outd = e.groupBy("node").agg(F.count(F.lit(1)).alias("outd"))
    # degree-annotated vertices; dangling nodes get outd NULL
    vd = verts.join(outd, "node", "left").persist()
    vd.count()
    verts.unpersist()

    ranks = vd.select("node", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()
    try:
        for _ in range(iters):
            r = vd.join(ranks, "node")
            dangling = (
                r.filter(F.col("outd").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
                .collect()[0]["m"]
            )
            contribs = (
                r.filter(F.col("outd").isNotNull())
                .join(e, "node")
                .select(F.col("to").alias("node"), (F.col("rank") / F.col("outd")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("c"))
            )
            base = (1.0 - damping) / n + damping * dangling / n
            nxt = (
                vd.select("node")
                .join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                    ).alias("rank"),
                )
                .persist()
            )
            nxt.count()
            ranks.unpersist()
            ranks = nxt
        return ranks
    finally:
        vd.unpersist()
