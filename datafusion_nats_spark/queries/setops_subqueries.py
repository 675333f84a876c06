"""Set operations, subqueries, and CTEs (SURVEY.md §2B rows "Set ops",
"Subqueries", "CTEs").

DataFusion rewrites INTERSECT/EXCEPT into semi/anti joins and
decorrelates subqueries; Catalyst does the same (RewritePredicateSubquery,
RewriteCorrelatedScalarSubquery) — expressed declaratively, the optimizer
handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, register_views


@query(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    """,
    doc="UNION ALL (bag union, no dedup exchange).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION DISTINCT (dedup via aggregate after bag union).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct) → left-semi join rewrite.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 40
    """,
    doc="EXCEPT (distinct) → left-anti join rewrite.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("okey")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select(
        F.col("l_orderkey").alias("okey")
    )
    return o.subtract(li)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey <= 50
    INTERSECT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey BETWEEN 25 AND 75
    """,
    doc="INTERSECT ALL (bag semantics, multiplicity = min of the two sides).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") <= 50).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_orderkey").between(25, 75)).select(
        F.col("l_returnflag").alias("flag")
    )
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey <= 50
    EXCEPT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_orderkey BETWEEN 40 AND 45
    """,
    doc="EXCEPT ALL (bag semantics, multiplicity subtraction).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_orderkey") <= 50).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_orderkey").between(40, 45)).select(
        F.col("l_returnflag").alias("flag")
    )
    return a.exceptAll(b)


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 2
          * (SELECT CAST(count(*) AS BIGINT) FROM orders)
        > 3 * (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) FROM orders)
    """,
    doc="Uncorrelated scalar subquery in a predicate. The price > 1.5x-mean membership test runs as 2*cents*count > 3*sum(cents) in exact int64 (two scalar subqueries), so an order that ties the threshold cannot flip with the float partial-sum order (FP playbook).",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 2
          * (SELECT CAST(count(*) AS BIGINT) FROM orders)
        > 3 * (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                           AS BIGINT) FROM orders)
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    """,
    doc="IN subquery → left-semi join.",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    """,
    doc="Correlated EXISTS → decorrelated to a semi join by the optimizer.",
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
        )
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 2) AS c_acctbal,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    """,
    doc="Correlated scalar subquery in the SELECT list (count per customer).",
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               round(c_acctbal, 2) AS c_acctbal,
               (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        """
    )


@query(
    "cte_chain",
    oracle="""
    WITH top_nations AS (
      SELECT c_nationkey, count(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ), named AS (
      SELECT n_name, n_cust
      FROM top_nations JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, n_cust FROM named WHERE n_cust >= 5
    """,
    doc="Chained CTEs feeding a final filter.",
)
def cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH top_nations AS (
          SELECT c_nationkey, count(*) AS n_cust
          FROM customer GROUP BY c_nationkey
        ), named AS (
          SELECT n_name, n_cust
          FROM top_nations JOIN nation ON c_nationkey = n_nationkey
        )
        SELECT n_name, n_cust FROM named WHERE n_cust >= 5
        """
    )


@query(
    "values_inline_table",
    oracle="""
    SELECT t.code, t.descr, n_name
    FROM (VALUES (0, 'zero-region'), (1, 'one-region')) AS t(code, descr)
    JOIN nation ON n_regionkey = t.code
    """,
    doc="Inline VALUES relation joined to a real table.",
)
def values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.code, t.descr, n_name
        FROM VALUES (0, 'zero-region'), (1, 'one-region') AS t(code, descr)
        JOIN nation ON n_regionkey = t.code
        """
    )


@query(
    "setop_union_by_name",
    oracle="""
    SELECT region_name, src, n FROM (
      SELECT r_name AS region_name, 'regions' AS src, CAST(NULL AS BIGINT) AS n
      FROM region
      UNION ALL BY NAME
      SELECT CAST(count(*) AS BIGINT) AS n, n_regionkey AS rk, 'nations' AS src
      FROM nation GROUP BY n_regionkey
    )
    """,
    doc="Position-independent union (unionByName + allowMissingColumns / "
    "DuckDB UNION ALL BY NAME): columns align by name, absent columns "
    "null-fill — schema-drift-tolerant ingestion at scale.",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select(
        F.col("r_name").alias("region_name"), F.lit("regions").alias("src")
    )
    n = (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("n"), F.col("n_regionkey").alias("rk"), F.lit("nations").alias("src"))
    )
    return r.unionByName(n, allowMissingColumns=True).select("region_name", "src", "n")


@query(
    "subquery_exists_projection",
    oracle="""
    SELECT c.c_custkey,
           EXISTS(SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)         AS has_big,
           c.c_nationkey IN (SELECT n_nationkey FROM nation
                             WHERE n_regionkey = 2)      AS in_region2
    FROM customer c
    """,
    doc="EXISTS / IN as PROJECTED booleans (mark-join shape) rather than "
    "WHERE-clause filters: every customer row survives, annotated with "
    "subquery truth values. Catalyst rewrites these to ExistenceJoin "
    "(a left outer join emitting the match flag) — the same mark-join "
    "DuckDB plans natively.",
)
def subquery_exists_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c.c_custkey,
               EXISTS(SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)        AS has_big,
               c.c_nationkey IN (SELECT n_nationkey FROM nation
                                 WHERE n_regionkey = 2)     AS in_region2
        FROM customer c
        """
    )
