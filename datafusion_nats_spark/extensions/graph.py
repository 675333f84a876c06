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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

_DAMPING = 0.85
_ITERATIONS = 3


def _edges_cte(materialized: bool = False) -> str:
    """Shared oracle prefix: the customer↔supplier bipartite edge list
    (pairs + symmetric 'c…'/'s…' union). One definition so the three
    iterative ops' oracles cannot drift apart; MATERIALIZED variants are
    for oracles whose rounds reference the CTE more than once (plain
    inlining would re-evaluate it exponentially)."""
    m = " MATERIALIZED" if materialized else ""
    return f"""
        WITH pairs AS{m} (
          SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), edges AS{m} (
          SELECT 'c' || ck AS src, 's' || sk AS dst FROM pairs
          UNION ALL
          SELECT 's' || sk AS src, 'c' || ck AS dst FROM pairs
        )
    """


def _bipartite_edges(spark: SparkSession, sf_dir: str):
    """Spark twin of :func:`_edges_cte`: (pairs, edges) DataFrames, edges
    persisted (every caller is an iterative loop reading it per round)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    c_node = F.concat(F.lit("c"), F.col("ck"))
    s_node = F.concat(F.lit("s"), F.col("sk"))
    edges = (
        pairs.select(c_node.alias("src"), s_node.alias("dst"))
        .unionByName(pairs.select(s_node.alias("src"), c_node.alias("dst")))
        .persist()
    )
    return pairs, edges


def _pagerank_iterations_sql() -> str:
    """Unrolled DuckDB twin: r0 .. r{_ITERATIONS} as chained CTEs."""
    parts = [
        _edges_cte()
        + """
        , deg AS (
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
    _, edges = _bipartite_edges(spark, sf_dir)
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


KNN_K = 3  # neighbors per vertex in the similarity graph


# Shared oracle prefix for every operator over the within-label cosine
# kNN graph (triangles, link prediction): embeddings → all within-label
# cosine pairs → per-vertex top-K → DISTINCT undirected (x < y) edges.
# One definition so the graph ops' edge sets cannot drift apart.
_KNN_UND_SQL = """
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS u, b.vec_id AS v,
        round(list_sum(list_transform(list_zip(a.emb, b.emb), p -> p[1]*p[2]))
              / (sqrt(list_sum(list_transform(a.emb, x -> x*x)))
                 * sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 6) AS c
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id
    ), knn AS (
      SELECT u, v FROM (
        SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY c DESC, v) AS rn
        FROM pairs
      ) WHERE rn <= {K}
    ), und AS (
      SELECT DISTINCT least(u, v) AS x, greatest(u, v) AS y FROM knn
    )
""".replace("{K}", str(KNN_K))


def _knn_und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :data:`_KNN_UND_SQL`: the persisted undirected
    (x < y) edge set of the within-label top-K cosine kNN graph."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )

    def cos(a, b):
        dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
        nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda s, v: s + v * v))  # noqa: E731
        return F.round(dot / (nrm(a) * nrm(b)), 6)

    a = e.select(F.col("vec_id").alias("u"), F.col("label").alias("la"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("v"), F.col("label").alias("lb"), F.col("emb").alias("eb"))
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("u") != F.col("v"))).select(
        "u", "v", cos(F.col("ea"), F.col("eb")).alias("c")
    )
    w = W.partitionBy("u").orderBy(F.desc("c"), "v")
    knn = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= KNN_K)
    return knn.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    ).distinct().persist()  # feeds degree + orientation/wedge + closing joins


@query(
    "graph_knn_triangles",
    oracle=_KNN_UND_SQL
    + """
    , deg AS (
      SELECT v, count(*) AS d
      FROM (SELECT x AS v FROM und UNION ALL SELECT y FROM und) GROUP BY v
    ), o AS (
      SELECT CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND x < y)) THEN x ELSE y END AS s,
             CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND x < y)) THEN y ELSE x END AS t
      FROM und JOIN deg dx ON dx.v = x JOIN deg dy ON dy.v = y
    ), o2 AS (
      SELECT o.s, o.t, d.d AS td FROM o JOIN deg d ON d.v = o.t
    ), tri AS (
      SELECT a.s AS x, a.t AS y, b.t AS z
      FROM o2 a JOIN o2 b ON a.s = b.s AND (a.td < b.td OR (a.td = b.td AND a.t < b.t))
      JOIN o c ON c.s = a.t AND c.t = b.t
    ), tv AS (
      SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
    )
    SELECT t.v AS vec_id, d.d AS degree, count(*) AS n_triangles
    FROM tv t JOIN deg d ON d.v = t.v
    GROUP BY 1, 2
    """,
    doc=f"Triangle counting over the within-label top-{KNN_K} cosine kNN "
    "graph with DEGREE-ORDERED edge orientation — every edge points from "
    "the (degree, id)-smaller endpoint, so each triangle is enumerated "
    "exactly once from its lowest-ordered apex and the wedge join fans "
    "out from LOW-degree vertices (the standard O(m^1.5), hub-skew-proof "
    "shape; a naive id-ordered triple join puts every hub's full "
    "neighborhood on one task). Emits per-vertex triangle participation "
    "+ degree; counts cross-checked against the naive enumeration in "
    "pytest.",
)
def graph_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _knn_und_edges(spark, sf_dir)
    deg = (
        und.select(F.col("x").alias("v"))
        .unionAll(und.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dxd"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dyd"))
    lower = (F.col("dxd") < F.col("dyd")) | (
        (F.col("dxd") == F.col("dyd")) & (F.col("x") < F.col("y"))
    )
    o = (
        und.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            F.when(lower, F.col("x")).otherwise(F.col("y")).alias("s"),
            F.when(lower, F.col("y")).otherwise(F.col("x")).alias("t"),
        )
        .persist()  # both wedge sides + the closing edge probe read it
    )
    dt = deg.select(F.col("v").alias("t"), F.col("d").alias("td"))
    o2 = o.join(F.broadcast(dt), "t").select("s", "t", "td")
    e1 = o2.select(F.col("s"), F.col("t").alias("t1"), F.col("td").alias("td1"))
    e2 = o2.select(F.col("s").alias("s2"), F.col("t").alias("t2"), F.col("td").alias("td2"))
    wedge_ord = (F.col("td1") < F.col("td2")) | (
        (F.col("td1") == F.col("td2")) & (F.col("t1") < F.col("t2"))
    )
    closing = o.select(F.col("s").alias("cs"), F.col("t").alias("ct"))
    tri = (
        e1.join(e2, (F.col("s") == F.col("s2")) & wedge_ord)
        .join(closing, (F.col("cs") == F.col("t1")) & (F.col("ct") == F.col("t2")))
        .select(F.col("s").alias("x"), F.col("t1").alias("y"), F.col("t2").alias("z"))
    )
    tv = (
        tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
    )
    return (
        tv.groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .join(F.broadcast(deg), "v")
        .select(F.col("v").alias("vec_id"), F.col("d").alias("degree"), "n_triangles")
    )


_BFS_ROUNDS = 3


def _bfs_oracle() -> str:
    parts = [
        _edges_cte(materialized=True)
        + """
        , nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM edges
        ), lvl0 AS MATERIALIZED (
          SELECT node,
                 CASE WHEN node = 'c' || (SELECT min(ck) FROM pairs)
                      THEN 0 ELSE 999 END AS lvl
          FROM nodes
        )
        """
    ]
    for i in range(1, _BFS_ROUNDS + 1):
        parts.append(
            f"""
            , lvl{i} AS MATERIALIZED (
              SELECT n.node,
                     least(n.lvl, coalesce(min(c.lvl + 1), 999)) AS lvl
              FROM lvl{i - 1} n
              LEFT JOIN (
                SELECT e.dst AS node, l.lvl
                FROM edges e JOIN lvl{i - 1} l ON e.src = l.node
                WHERE l.lvl < 999
              ) c ON c.node = n.node
              GROUP BY n.node, n.lvl
            )
            """
        )
    parts.append(
        f"""
        SELECT lvl AS level, CAST(count(*) AS BIGINT) AS n_nodes
        FROM lvl{_BFS_ROUNDS} WHERE lvl < 999
        GROUP BY lvl
        """
    )
    return "".join(parts)


@query(
    "graph_bfs_levels",
    oracle=_bfs_oracle(),
    doc=f"BFS level sets ({_BFS_ROUNDS} hops) from the lowest-keyed "
    "customer over the customer-supplier bipartite graph (same edge "
    "derivation as graph_pagerank_suppliers). Iterative min-level "
    "propagation — the Pregel/BSP pattern as a driver loop over lazy "
    "plans: each round is one edges-to-frontier equi-join + per-node min "
    "aggregate; the cached edge list is the loop constant, level state "
    "is O(|nodes|) and never collected. Emits nodes-per-level, the "
    "reachability profile. The oracle unrolls every round as "
    "MATERIALIZED CTEs (each round references its predecessor twice — "
    "plain CTE inlining would be exponential).",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, edges = _bipartite_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    src = pairs.agg(F.min("ck").alias("mn"))  # 1 row, broadcast
    cur = nodes.crossJoin(F.broadcast(src)).select(
        "node",
        F.when(F.col("node") == F.concat(F.lit("c"), F.col("mn")), 0)
        .otherwise(999)
        .alias("lvl"),
    )
    for _ in range(_BFS_ROUNDS):
        frontier = (
            edges.join(cur.filter(F.col("lvl") < 999), edges.src == F.col("node"))
            .select(F.col("dst").alias("node"), (F.col("lvl") + 1).alias("cand"))
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        nxt = (
            cur.join(frontier, "node", "left")
            .select(
                "node",
                F.least(F.col("lvl"), F.coalesce(F.col("cand"), F.lit(999))).alias("lvl"),
            )
            .localCheckpoint()  # truncate per-round plan growth
        )
        cur = nxt
    return (
        cur.filter(F.col("lvl") < 999)
        .groupBy(F.col("lvl").alias("level"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    parts = [
        _edges_cte(materialized=True)
        + """
        , lab0 AS MATERIALIZED (
          SELECT DISTINCT src AS node, src AS label FROM edges
        )
        """
    ]
    for i in range(1, _LPA_ROUNDS + 1):
        parts.append(
            f"""
            , cnt{i} AS MATERIALIZED (
              SELECT e.dst AS node, l.label, count(*) AS c
              FROM edges e JOIN lab{i - 1} l ON e.src = l.node
              GROUP BY 1, 2
            ), lab{i} AS MATERIALIZED (
              SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY c DESC, label) AS rn
                FROM cnt{i}
              ) WHERE rn = 1
            )
            """
        )
    summaries = [
        f"SELECT {i} AS round, label AS community, "
        f"CAST(count(*) AS BIGINT) AS size FROM lab{i} GROUP BY 1, 2"
        for i in range(1, _LPA_ROUNDS + 1)
    ]
    parts.append(" UNION ALL ".join(summaries))
    return "".join(parts)


@query(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    doc=f"Community detection via synchronous label propagation "
    f"({_LPA_ROUNDS} rounds) on the customer-supplier bipartite graph "
    "(same edge derivation as graph_pagerank_suppliers). Deterministic "
    "LPA variant: every node adopts the MOST FREQUENT label among its "
    "neighbors each round, ties broken by lexicographically-smallest "
    "label — unlike dedup_connected_components' min-label rule, "
    "frequency voting lets dense neighborhoods outvote a single "
    "low-id node, the actual community-detection semantics. Each round "
    "is one edges-to-labels equi-join, a (node, label) count aggregate "
    "(map-side combinable), and a PARTITIONED row_number top-1 per "
    "node; label state is O(|nodes|), lineage truncated per round "
    "(localCheckpoint), edges cached once. Every node is a dst of the "
    "symmetric edge union, so no frontier left-join is needed. Emits "
    "per-community sizes for EVERY round — the coarsening trajectory "
    "(many small communities after round 1 collapsing toward the "
    "bipartite fixed point), a much denser correctness fingerprint "
    "than the final state alone. Oracle: the same rounds unrolled as "
    "MATERIALIZED CTEs with one summary per round, UNION ALLed.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _bipartite_edges(spark, sf_dir)
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    top1 = W.partitionBy("dst").orderBy(F.desc("c"), F.asc("label"))
    summaries = []
    for rnd in range(1, _LPA_ROUNDS + 1):
        votes = (
            edges.join(lab, edges.src == lab.node)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            votes.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), "label")
            .localCheckpoint()  # truncate per-round plan growth
        )
        summaries.append(
            lab.groupBy(F.col("label").alias("community")).agg(
                F.count(F.lit(1)).cast("bigint").alias("size")
            ).select(F.lit(rnd).alias("round"), "community", "size")
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out


LINKPRED_TOP = 20


@query(
    "graph_adamic_adar_linkpred",
    oracle=_KNN_UND_SQL
    + f"""
    , deg AS (
      SELECT v, count(*) AS d
      FROM (SELECT x AS v FROM und UNION ALL SELECT y FROM und) GROUP BY v
    ), adj AS (
      SELECT x AS v, y AS nbr FROM und
      UNION ALL
      SELECT y AS v, x AS nbr FROM und
    ), wedge AS (
      SELECT a.nbr AS u, b.nbr AS w, a.v AS mid
      FROM adj a JOIN adj b ON a.v = b.v AND a.nbr < b.nbr
    ), cand AS (
      SELECT wg.u, wg.w,
             CAST(count(*) AS BIGINT) AS common_neighbors,
             round(sum(1.0 / ln(dg.d)), 6) AS adamic_adar
      FROM wedge wg JOIN deg dg ON dg.v = wg.mid
      WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.x = wg.u AND und.y = wg.w)
      GROUP BY wg.u, wg.w
    )
    SELECT u AS vec_a, w AS vec_b, common_neighbors, adamic_adar
    FROM cand
    ORDER BY adamic_adar DESC, vec_a, vec_b
    LIMIT {LINKPRED_TOP}
    """,
    doc=f"Link prediction on the within-label top-{KNN_K} cosine kNN "
    f"graph (same edge derivation as graph_knn_triangles): Adamic-Adar "
    "scores — sum over shared neighbors of 1/ln(degree) — for every "
    f"NON-adjacent vertex pair with >=1 common neighbor, top-{LINKPRED_TOP}. "
    "Wedge enumeration fans out from each MIDDLE vertex (one self-join "
    "of the adjacency list partitioned by the middle — per-task work is "
    "deg^2 of that vertex, bounded by the kNN construction, never an "
    "all-pairs product), existing edges are removed with a left_anti "
    "equi-join on the canonical (x < y) edge key, and the final ranking "
    "is TakeOrderedAndProject. A middle vertex of any wedge has degree "
    ">= 2, so ln(d) > 0 always; scores are rounded to 1e-6 BEFORE the "
    "ordering with a full (vec_a, vec_b) tie-break so summation-order "
    "noise cannot flip the top-k across engines.",
)
def graph_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = _knn_und_edges(spark, sf_dir)
    deg = (
        und.select(F.col("x").alias("v"))
        .unionAll(und.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    adj = und.select(F.col("x").alias("v"), F.col("y").alias("nbr")).unionAll(
        und.select(F.col("y").alias("v"), F.col("x").alias("nbr"))
    )
    a = adj.select("v", F.col("nbr").alias("u"))
    b = adj.select(F.col("v").alias("v2"), F.col("nbr").alias("w"))
    wedge = a.join(
        b, (F.col("v") == F.col("v2")) & (F.col("u") < F.col("w"))
    ).select("u", "w", F.col("v").alias("mid"))
    dm = deg.select(F.col("v").alias("mid"), "d")
    cand = (
        wedge.join(F.broadcast(dm), "mid")
        .join(
            und.select(F.col("x").alias("u"), F.col("y").alias("w")),
            ["u", "w"],
            "left_anti",
        )
        .groupBy("u", "w")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.round(F.sum(F.lit(1.0) / F.log(F.col("d").cast("double"))), 6).alias(
                "adamic_adar"
            ),
        )
    )
    return (
        cand.select(
            F.col("u").alias("vec_a"),
            F.col("w").alias("vec_b"),
            "common_neighbors",
            "adamic_adar",
        )
        .orderBy(F.desc("adamic_adar"), "vec_a", "vec_b")
        .limit(LINKPRED_TOP)
    )
