"""Graph-analytics driver queries (operators/graph.py, driver-verified r6).

The lineitem table supplies two natural graphs over part keys:

- co-occurrence graph: parts appearing on the same order (capped at the
  first 3 line numbers so a hot order fans out at most C(3,2) edges) —
  undirected, for triangle counting;
- basket-sequence graph: part at line i -> part at line i+1 within an
  order — directed, for PageRank.

Triangle counting uses the degree-oriented wedge algorithm (see
operators.graph.triangle_count); its output is the canonical (a < b <
c) triangle set, which the oracle reproduces directly from the
canonical edge list (e(a,b), e(b,c), e(a,c)) without replaying the
orientation trick — the orientation changes the join sizes, never the
result set. PageRank runs in exact integer pico-units
(operators.graph.pagerank_int) precisely so a SQL oracle can unroll
the same ``_PR_ITERS`` rounds bit-for-bit: integer sums are
associative, so neither engine's accumulation order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.graph import PAGERANK_SCALE, pagerank_int, triangle_count
from ..registry import query, t

_TRI_MAX_LINE = 3  # co-occurrence cap: first 3 lines per order
_PR_ITERS = 6
_PR_DPPM = 850_000  # damping in ppm
_D6 = _PR_DPPM * 1_000_000


def _pagerank_round_ctes(i: int) -> str:
    p = f"pr{i - 1}"
    return f"""
dang{i} AS (SELECT CAST(coalesce(sum(p.r), 0) AS BIGINT) AS dm
            FROM {p} p LEFT JOIN outd o ON o.node = p.node
            WHERE o.node IS NULL),
ctr{i} AS (SELECT e.dst AS node,
                  CAST(sum(((p.r * {_PR_DPPM}) // 1000000) // o.outd) AS BIGINT) AS c
           FROM {p} p JOIN outd o ON o.node = p.node
           JOIN e ON e.src = p.node
           GROUP BY e.dst),
pr{i} AS (SELECT v.node,
                 CAST(({PAGERANK_SCALE} - {_D6}) // nc.n
                      + (({_PR_DPPM} * d.dm) // 1000000) // nc.n
                      + coalesce(c.c, 0) AS BIGINT) AS r
          FROM verts v CROSS JOIN nc CROSS JOIN dang{i} d
          LEFT JOIN ctr{i} c ON c.node = v.node)"""


_PR_ROUNDS_SQL = ",".join(_pagerank_round_ctes(i) for i in range(1, _PR_ITERS + 1))


@query(
    "graph_analytics",
    f"""
WITH li3 AS (SELECT l_orderkey, l_partkey FROM lineitem
             WHERE l_linenumber <= {_TRI_MAX_LINE}),
pe AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       FROM li3 a JOIN li3 b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM pe e1
        JOIN pe e2 ON e2.u = e1.v
        JOIN pe e3 ON e3.u = e1.u AND e3.v = e2.v),
nxt AS (SELECT l_partkey AS src,
               lead(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS dst
        FROM lineitem),
e AS (SELECT DISTINCT src, dst FROM nxt WHERE dst IS NOT NULL AND dst != src),
verts AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nc AS (SELECT count(*) AS n FROM verts),
outd AS (SELECT src AS node, count(*) AS outd FROM e GROUP BY src),
pr0 AS (SELECT node, CAST({PAGERANK_SCALE} // n AS BIGINT) AS r
        FROM verts CROSS JOIN nc),
{_PR_ROUNDS_SQL}
SELECT 'triangles' AS leg, a, b, c,
       CAST(NULL AS BIGINT) AS node, CAST(NULL AS BIGINT) AS rank_pu
FROM tri
UNION ALL
SELECT 'pagerank' AS leg, CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS b,
       CAST(NULL AS BIGINT) AS c, node, r AS rank_pu
FROM pr{_PR_ITERS}
""",
    doc="Graph analytics over lineitem part graphs as a two-leg tagged "
    "union (operators/graph.py, r4 pytest-only, driver-verified r6). "
    "triangles leg: one row per triangle (a<b<c) in the same-order "
    f"part co-occurrence graph (first {_TRI_MAX_LINE} lines per order "
    "bound the per-order fan-out), counted with the degree-oriented "
    "wedge algorithm — a hub of degree d contributes O(d) wedges, not "
    "O(d^2), bounding total wedge work by O(m^1.5) (the 'curse of the "
    f"last reducer' fix). pagerank leg: {_PR_ITERS} power-iteration "
    "rounds with dangling-mass redistribution over the directed "
    "basket-sequence graph (part at line i -> line i+1), in exact "
    "integer pico-units so the oracle's unrolled rounds replay "
    "bit-for-bit; one node-keyed shuffle per round, constant plan "
    "depth via lazy per-round checkpoints.",
)
def q_graph_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    li3 = li.filter(F.col("l_linenumber") <= _TRI_MAX_LINE).select(
        "l_orderkey", F.col("l_partkey").cast("long").alias("p")
    )
    pairs = (
        li3.join(li3.withColumnRenamed("p", "pb"), "l_orderkey")
        .filter(F.col("p") < F.col("pb"))
        .select(F.col("p").alias("id_a"), F.col("pb").alias("id_b"))
        .distinct()
    )
    tri = triangle_count(pairs)

    # the synthetic lineitem duplicates (orderkey, linenumber) pairs, so
    # the partkey tiebreak makes the sequence — and hence the edge SET —
    # total-order deterministic (tied equal partkeys collapse to the
    # same edges regardless of their relative order)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "src")
    nxt = li.select(
        "l_orderkey", "l_linenumber", F.col("l_partkey").cast("long").alias("src")
    ).withColumn("dst", F.lead("src").over(w))
    edges = (
        nxt.filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .select("src", "dst")
        .distinct()
    )
    pr = pagerank_int(edges, iters=_PR_ITERS, damping_ppm=_PR_DPPM)

    nul = F.lit(None).cast("long")
    tri_leg = tri.select(
        F.lit("triangles").alias("leg"),
        F.col("a").cast("long"),
        F.col("b").cast("long"),
        F.col("c").cast("long"),
        nul.alias("node"),
        nul.alias("rank_pu"),
    )
    pr_leg = pr.select(
        F.lit("pagerank").alias("leg"),
        nul.alias("a"),
        nul.alias("b"),
        nul.alias("c"),
        F.col("node").cast("long"),
        F.col("rank_pu").cast("long"),
    )
    return tri_leg.unionByName(pr_leg)
