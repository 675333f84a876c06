"""Iterative graph analytics over relational edges — PageRank.

The reference engine has no iterative operators at all (its DataFusion 48
core is a one-shot query engine; SURVEY.md §2B); this module demonstrates
the Spark-native pattern for fixed-point algorithms: a driver-side loop
over *lazy* DataFrame plans, where each iteration is one shuffle-join +
aggregate and the loop constant (edge list + degrees) is cached once.
`dedup_connected_components` (extensions/dedup.py) is the other member of
this family.

Scale notes (100 TB): the edge list is the only large state and it is
cached partitioned by `src`, so every iteration's `edges ⋈ rank` join is
co-partitioned after the first shuffle; contributions combine map-side
before the one exchange per iteration. Rank state is O(|nodes|), never
collected to the driver — the only driver-side scalar is the node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

_DAMPING = 0.85
_ITERATIONS = 3


def _pagerank_iterations_sql() -> str:
    """Unrolled DuckDB twin: r0 .. r{_ITERATIONS} as chained CTEs."""
    parts = [
        """
        WITH pairs AS (
          SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), edges AS (
          SELECT 'c' || ck AS src, 's' || sk AS dst FROM pairs
          UNION ALL
          SELECT 's' || sk AS src, 'c' || ck AS dst FROM pairs
        ), deg AS (
          SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY 1
        ), nodes AS (
          SELECT DISTINCT src AS node FROM edges
        ), nn AS (
          SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
        ), r0 AS (
          SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
        )
        """
    ]
    for i in range(1, _ITERATIONS + 1):
        parts.append(
            f"""
            , inflow{i} AS (
              SELECT e.dst AS node, sum(r.rank / d.outdeg) AS inflow
              FROM edges e
              JOIN r{i - 1} r ON r.node = e.src
              JOIN deg d ON d.src = e.src
              GROUP BY e.dst
            ), r{i} AS (
              SELECT n0.node,
                     (1 - {_DAMPING}) / nn.n
                       + {_DAMPING} * coalesce(i.inflow, 0) AS rank
              FROM nodes n0 CROSS JOIN nn
              LEFT JOIN inflow{i} i ON i.node = n0.node
            )
            """
        )
    parts.append(
        f"""
        SELECT CAST(substr(node, 2) AS BIGINT) AS suppkey,
               round(rank * nn.n, 6) AS rank_norm
        FROM r{_ITERATIONS} CROSS JOIN nn
        WHERE node LIKE 's%'
        """
    )
    return "".join(parts)


@query(
    "graph_pagerank_suppliers",
    oracle=_pagerank_iterations_sql(),
    doc="PageRank (damping 0.85, 3 iterations) on the undirected bipartite "
    "customer↔supplier graph induced by orders⋈lineitem. Each iteration "
    "is edges⋈rank⋈degree → groupBy(dst) sum — one shuffle per "
    "iteration with map-side combine; edges and degrees are computed "
    "once and cached. Undirected edges mean no dangling nodes, so the "
    "random-surfer mass balance needs no special casing. Output: "
    "per-supplier rank normalized by node count (≈1.0 for an "
    "average-centrality node). Oracle: the same three iterations "
    "unrolled as chained CTEs in DuckDB.",
)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    edges = (
        pairs.select(c.alias("src"), s.alias("dst"))
        .unionAll(pairs.select(s.alias("src"), c.alias("dst")))
        .persist()
    )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("outdeg")
    ).persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n = float(nodes.count())  # the one driver-side scalar

    rank = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(_ITERATIONS):
        inflow = (
            edges.join(rank, edges.src == rank.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("inflow"))
        )
        rank = nodes.join(
            inflow, nodes.node == inflow.dst, "left"
        ).select(
            "node",
            (
                F.lit((1 - _DAMPING) / n)
                + F.lit(_DAMPING) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
        )
        # Lineage hygiene: the plan nests two joins per iteration —
        # truncate it every 2 rounds so a deep run (e.g. _ITERATIONS=30
        # on a bigger graph) doesn't hit planner/codegen blowup.
        if (it + 1) % 2 == 0 and it + 1 < _ITERATIONS:
            rank = rank.localCheckpoint()

    return rank.filter(F.col("node").startswith("s")).select(
        F.substring("node", 2, 100).cast("bigint").alias("suppkey"),
        F.round(F.col("rank") * F.lit(n), 6).alias("rank_norm"),
    )
