"""Projection & filter surface (SURVEY.md §2B rows "Projection",
"Filter/predicates").

The reference inherits ProjectionExec/FilterExec from DataFusion
(reference: src/data_source.rs:51-52 receives projection/filters and
ignores them — Catalyst handles both above our scans for free, with
pushdown into parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load


@query(
    "projection_expressions",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      round(l_extendedprice * (1 - l_discount), 4) AS net_price,
      round(l_quantity * l_extendedprice, 4)       AS gross,
      l_returnflag || '/' || l_linestatus          AS flag_status,
      CASE WHEN l_quantity >= 30 THEN 'bulk'
           WHEN l_quantity >= 10 THEN 'mid'
           ELSE 'small' END                        AS qty_band,
      - l_discount                                 AS neg_disc,
      CAST(l_quantity AS INTEGER)                  AS qty_int
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
    doc="SELECT-list expressions: arithmetic, concat, CASE WHEN, negation, cast.",
)
def projection_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 4).alias("gross"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.when(F.col("l_quantity") >= 30, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        (-F.col("l_discount")).alias("neg_disc"),
        F.col("l_quantity").cast("int").alias("qty_int"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 1000 AND 50000
      AND o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
      AND NOT (o_orderkey % 7 = 0)
    """,
    doc="Boolean algebra: BETWEEN, IN, LIKE, IS NOT NULL, NOT, modulo.",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
        & ~(F.col("o_orderkey") % 7 == 0)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_regex_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE regexp_matches(p_name, '^[a-f].*e$')
       OR p_type ILIKE '%brass%'
    """,
    doc="Regex predicate (rlike) + case-insensitive LIKE.",
)
def filter_regex_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").rlike("^[a-f].*e$") | F.col("p_type").ilike("%brass%")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "limit_offset_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 10
    """,
    doc="ORDER BY + LIMIT/OFFSET → TakeOrderedAndProject (top-k, no full sort).",
)
def limit_offset_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(25)
    )


@query(
    "fn_tvf_range",
    oracle="""
    SELECT CAST(range % 7 AS BIGINT)            AS k,
           CAST(count(*) AS BIGINT)             AS n,
           CAST(sum(range * range) AS BIGINT)   AS sum_sq
    FROM range(0, 10000)
    GROUP BY 1
    """,
    doc="Table-valued function source: range() generates rows engine-side "
    "(Spark's Range exec: no I/O, split across tasks) — the synthetic-"
    "input surface for backfills and load generation.",
)
def fn_tvf_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT CAST(id % 7 AS BIGINT)      AS k,
               CAST(count(*) AS BIGINT)    AS n,
               CAST(sum(id * id) AS BIGINT) AS sum_sq
        FROM range(0, 10000)
        GROUP BY 1
        """
    )
