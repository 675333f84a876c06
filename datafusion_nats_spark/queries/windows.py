"""Window-function surface (SURVEY.md §2B rows "Window — ranking /
analytic / frames").

Inherited by the reference from DataFusion's BoundedWindowAggExec. Spark's
WindowExec requires a shuffle on the partition key + in-partition sort —
at 100 TB the partition key must be high-cardinality (here: per customer /
per order) so no single window partition exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load


@query(
    "window_ranking",
    oracle="""
    SELECT * FROM (
      SELECT
        o_custkey,
        o_orderkey,
        round(o_totalprice, 2) AS o_totalprice,
        row_number()   OVER w AS rn,
        rank()         OVER w AS rnk,
        dense_rank()   OVER w AS drnk,
        ntile(4)       OVER w AS quartile,
        round(percent_rank() OVER w, 6) AS prank,
        round(cume_dist()    OVER w, 6) AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 5
    """,
    doc="Ranking battery + top-5-per-customer pattern.",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            # DuckDB ranking fns return BIGINT; Spark's return INT — cast so
            # the driver's schema compare can't trip on integer width.
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "window_analytic",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      lag(o_orderkey)  OVER w                  AS prev_order,
      lead(o_orderkey) OVER w                  AS next_order,
      first_value(o_orderkey) OVER w           AS first_order,
      last_value(o_orderkey)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                               AS last_order,
      nth_value(o_orderkey, 2) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                               AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead/first/last/nth_value with explicit full frame for "
    "last_value (default frame stops at CURRENT ROW in both engines).",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@query(
    "window_frames_rows",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)  AS running_spend,
      round(avg(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)          AS moving_avg3,
      count(*) OVER (PARTITION BY o_custkey)                       AS n_in_part
    FROM orders
    """,
    doc="ROWS frames: running total, 3-row moving average, whole-partition count.",
)
def window_frames_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_spend"
        ),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg3"),
        F.count(F.lit(1)).over(W.partitionBy("o_custkey")).alias("n_in_part"),
    )


@query(
    "window_frames_range",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_quantity,
      round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey
            ORDER BY l_quantity
            RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING), 2) AS near_qty_price
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
    doc="RANGE frame over a numeric ordering key (value-based window).",
)
def window_frames_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    w = W.partitionBy("l_orderkey").orderBy("l_quantity").rangeBetween(-5, 5)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("near_qty_price"),
    )


@query(
    "window_frames_groups_rewrite",
    oracle="""
    WITH g AS (
      SELECT o_orderdate, sum(o_totalprice) AS g_sum
      FROM orders GROUP BY o_orderdate
    ), gw AS (
      SELECT o_orderdate,
             round(sum(g_sum) OVER (ORDER BY o_orderdate
                    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS grp_sum
      FROM g
    )
    SELECT o_orderkey, o_orderdate, grp_sum
    FROM orders JOIN gw USING (o_orderdate)
    WHERE o_orderkey < 5000
    ORDER BY o_orderkey
    """,
    doc="GROUPS window frame, rewritten: neither Spark nor DuckDB 1.0 "
    "implements SQL:2011 GROUPS frames (SURVEY §2B flags the gap), so "
    "'sum OVER (ORDER BY d GROUPS 1 PRECEDING)' becomes: aggregate per "
    "peer group -> ROWS frame over the (small) group relation -> join "
    "back to detail rows. The unpartitioned window runs over |distinct "
    "dates|, not |orders|, and the group relation broadcasts.",
)
def window_frames_groups_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderdate").agg(F.sum("o_totalprice").alias("g_sum"))
    w = W.orderBy("o_orderdate").rowsBetween(-1, 0)
    group_frame = per_group.select(
        "o_orderdate", F.round(F.sum("g_sum").over(w), 2).alias("grp_sum")
    )
    return (
        o.filter(F.col("o_orderkey") < 5000)
        .join(F.broadcast(group_frame), "o_orderdate")
        .select("o_orderkey", "o_orderdate", "grp_sum")
        .orderBy("o_orderkey")
    )


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                            IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING), 2) AS last_finished_price,
           round(first_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END
                             IGNORE NULLS)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING), 2) AS first_finished_price
    FROM orders
    WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
    """,
    doc="IGNORE NULLS analytic functions: running last/first non-null "
    "finished-order price per customer (the gap-filling / "
    "last-observation-carried-forward primitive). Spark expresses IGNORE "
    "NULLS via the ignoreNulls argument of first/last over a running "
    "frame; window partitions on the high-cardinality customer key.",
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    finished = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.last(finished, ignorenulls=True).over(w), 2).alias("last_finished_price"),
        F.round(F.first(finished, ignorenulls=True).over(w), 2).alias("first_finished_price"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_range_interval_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT)   AS n_7d,
           round(sum(value) OVER w, 2)       AS sum_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    """,
    doc="Interval-bounded RANGE frame: per-user rolling 7-day count/sum "
    "keyed on event time — the time-decayed rolling metric primitive. "
    "RANGE frames are peer-inclusive on the ordering timestamp, so the "
    "result is deterministic without a tiebreak column; the window "
    "partitions by user, keeping every sort partition-local at scale.",
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "user_id",
        "event_id",
        F.expr(f"CAST(count(1) {over} AS BIGINT)").alias("n_7d"),
        F.expr(f"round(sum(value) {over}, 2)").alias("sum_7d"),
    )


@query(
    "window_count_distinct_rewrite",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_of_type
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(first_of_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_so_far
    FROM flagged
    """,
    doc="Running COUNT(DISTINCT) over a window — unsupported natively by "
    "both Spark and DuckDB — via the standard rewrite: flag the first "
    "occurrence of each (user, event_type) with row_number()=1, then "
    "running-sum the flags. Two partition-local window passes over the "
    "same (user_id) shuffle; no state blow-up at scale because the "
    "distinct-ness is materialized as a 0/1 column, not a growing set.",
)
def window_count_distinct_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    flagged = ev.withColumn(
        "first_of_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_of_type").over(w_run).alias("n_types_so_far"),
    )


@query(
    "sort_null_ordering",
    oracle="""
    WITH t AS (
      SELECT event_id, event_type,
             CASE WHEN value < 10 THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id,
           CAST(row_number() OVER (
             PARTITION BY event_type
             ORDER BY v ASC NULLS FIRST, event_id) AS INTEGER)  AS rn_nulls_first,
           CAST(row_number() OVER (
             PARTITION BY event_type
             ORDER BY v DESC NULLS LAST, event_id) AS INTEGER)  AS rn_nulls_last
    FROM t
    """,
    doc="Explicit NULL ordering (ASC NULLS FIRST / DESC NULLS LAST — the "
    "opposite of Spark's defaults): made hash-observable by materializing "
    "each ordering as a row_number, since the correctness gate compares "
    "order-insensitive multisets. Partitioned by event_type so the sort "
    "stays partition-local at scale; event_id tiebreak keeps ranks "
    "deterministic under value ties.",
)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.when(F.col("value") < 10, F.lit(None)).otherwise(F.col("value"))
    t = ev.select("event_id", "event_type", v.alias("v"))
    w_nf = W.partitionBy("event_type").orderBy(
        F.col("v").asc_nulls_first(), "event_id"
    )
    w_nl = W.partitionBy("event_type").orderBy(
        F.col("v").desc_nulls_last(), "event_id"
    )
    return t.select(
        "event_id",
        F.row_number().over(w_nf).alias("rn_nulls_first"),
        F.row_number().over(w_nl).alias("rn_nulls_last"),
    )
