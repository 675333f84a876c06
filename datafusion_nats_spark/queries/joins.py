"""Join surface (SURVEY.md §2B join rows): equi inner/left/right/full,
semi, anti, cross, and non-equi (nested-loop) joins.

The reference inherits HashJoinExec/SortMergeJoinExec/NestedLoopJoinExec
from DataFusion; Spark picks broadcast-hash/SMJ/shuffle-hash via AQE.

Scale notes: dimension sides (`nation`, `region`, `supplier`) carry
explicit ``F.broadcast`` hints — at 100 TB the fact side must never
shuffle for a bounded dimension. Fact↔fact joins shuffle on the key and
rely on AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    """,
    doc="Inner equi-join orders↔customer (shuffle or broadcast by AQE).",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 200000
    """,
    doc="Left outer join with a join-side predicate (kept in ON, not WHERE).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 200000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, s_suppkey, s_name
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
    doc="Right outer join (nations with no supplier keep NULL supplier cols).",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000),
         big_ord  AS (SELECT o_custkey, count(*) AS n_orders
                      FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey)
    SELECT c_custkey, c_name, o_custkey, n_orders
    FROM big_cust FULL JOIN big_ord ON c_custkey = o_custkey
    """,
    doc="Full outer join of two filtered sides (NULLs on both flanks).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_custkey", "n_orders"
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
    doc="Left semi join ≡ EXISTS subquery.",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="Left anti join ≡ NOT EXISTS (customers with no large order).",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    doc="Cross join of two broadcastable dims (5×25 rows); the broadcast "
    "hint is the explicit boundedness assertion the registry-wide "
    "cartesian guard requires on every cross/theta join.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(F.broadcast(n))


@query(
    "join_non_equi",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s JOIN customer c
      ON c.c_acctbal > s.s_acctbal AND c.c_nationkey = s.s_nationkey
    """,
    doc="Mixed equi + range condition → hash join on nationkey with "
    "residual range filter (BroadcastNestedLoop if no equi part).",
)
def join_non_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").alias("s")
    c = load(spark, sf_dir, "customer").alias("c")
    cond = (F.col("c.c_acctbal") > F.col("s.s_acctbal")) & (
        F.col("c.c_nationkey") == F.col("s.s_nationkey")
    )
    return F.broadcast(s).join(c, cond).select("s.s_suppkey", "s.s_name", "c.c_custkey")


@query(
    "join_star_broadcast",
    oracle="""
    SELECT r_name, n_name, round(sum(s_acctbal), 2) AS total_bal, count(*) AS n_supp
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="Star-schema rollup with both dims broadcast — zero fact shuffles "
    "before the aggregation exchange.",
)
def join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_supp"),
        )
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT nullif(event_type, 'error') AS k, count(*) AS n_all
      FROM events GROUP BY 1
    ), b AS (
      SELECT nullif(event_type, 'error') AS k, count(*) AS n_big
      FROM events WHERE value > 50 GROUP BY 1
    )
    SELECT a.k, CAST(a.n_all AS BIGINT) AS n_all, CAST(b.n_big AS BIGINT) AS n_big
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    doc="Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT FROM): "
    "NULL keys match each other instead of dropping — still plans as a "
    "hash join (null-safe keys are hashable), not a nested loop.",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.nullif("event_type", F.lit("error")).alias("k")
    a = ev.groupBy(k).agg(F.count(F.lit(1)).alias("n_all")).alias("a")
    b = (
        ev.filter(F.col("value") > 50)
        .groupBy(k)
        .agg(F.count(F.lit(1)).alias("n_big"))
        .alias("b")
    )
    return a.join(b, F.col("a.k").eqNullSafe(F.col("b.k"))).select(
        F.col("a.k").alias("k"), "n_all", "n_big"
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 3
    ) t
    """,
    doc="Correlated LATERAL join (SQL:2016 lateral derived table, Spark "
    "3.2+/4.x JOIN LATERAL): top-3 orders per customer where the inner "
    "query references the outer row. Catalyst decorrelates the "
    "ORDER BY+LIMIT lateral into a window/filter over an equi-join — no "
    "per-row re-execution, so the plan scales as one shuffle on the "
    "join key rather than |customer| inner scans.",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        """
    )
