"""Aggregation surface (SURVEY.md §2B rows "Aggregation", "Aggregate
functions", "Approximate aggregates", "Grouping sets / cube / rollup").

Inherited by the reference from DataFusion's AggregateExec (partial/final);
Spark's HashAggregateExec does partial→final automatically, so every query
here map-side-combines before its single exchange — the property that makes
these plans survive a 100 TB fact table.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, register_views


@query(
    "agg_function_battery",
    oracle="""
    SELECT
      l_returnflag,
      count(*)                                   AS n_rows,
      CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      round(sum(l_quantity), 2)                  AS sum_qty,
      round(min(l_extendedprice), 2)             AS min_price,
      round(max(l_extendedprice), 2)             AS max_price,
      round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
            / count(*) / 100.0, 6)               AS avg_price,
      round(stddev_samp(l_quantity), 6)          AS sd_qty,
      round(var_samp(l_quantity), 6)             AS var_qty,
      round(stddev_pop(l_discount), 6)           AS sdp_disc,
      round(var_pop(l_discount), 6)              AS varp_disc,
      round(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
      round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
      round(covar_pop(l_quantity, l_extendedprice), 6)  AS covarp_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Full aggregate-function battery incl. distinct agg and 2nd moments.",
)
def agg_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The distinct count is computed SEPARATELY and broadcast-joined
    # back (round 9): with countDistinct inline, Spark's one-distinct
    # strategy keys the partial aggregation of ALL the other aggregates
    # by (l_returnflag, l_orderkey) — the round-9 stage profile measured
    # a 30 MB, 33-buffer-column exchange at ~distinct-pair cardinality
    # with ~3 s of executor time on EACH side at sf0.1 (it is the
    # per-row-linear stage the scale table flagged). Split, the regular
    # aggregates partial-reduce to |groups| rows per task (a ~KB
    # exchange) and the distinct side shuffles only the two key columns
    # after map-side dedup; the join side is |l_returnflag| rows —
    # always broadcastable. Costs one extra scan of 2 columns, which is
    # far cheaper at any scale than shuffling 33-wide buffers at
    # near-row cardinality (guide §2.3/§8: shuffle keys, not payloads).
    li = load(spark, sf_dir, "lineitem")
    n_orders = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    base = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        # exact cents sum: avg over the 2-decimal money column must not
        # depend on the float partial-aggregation order (FP playbook)
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / F.lit(100.0),
            6,
        ).alias("avg_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
        F.round(F.var_pop("l_discount"), 6).alias("varp_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 6).alias("covarp_qty_price"),
    )
    return base.join(F.broadcast(n_orders), "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        "n_orders",
        "sum_qty",
        "min_price",
        "max_price",
        "avg_price",
        "sd_qty",
        "var_qty",
        "sdp_disc",
        "varp_disc",
        "corr_qty_price",
        "covar_qty_price",
        "covarp_qty_price",
    )


@query(
    "agg_bool_bit",
    oracle="""
    SELECT
      event_type,
      bool_and(value >= 0)                 AS all_nonneg,
      bool_or(value > 90)                  AS any_big,
      CAST(bit_and(user_id) AS BIGINT)     AS band,
      CAST(bit_or(user_id) AS BIGINT)      AS bor,
      CAST(bit_xor(user_id) AS BIGINT)     AS bxor
    FROM events
    GROUP BY event_type
    """,
    doc="Boolean and bitwise aggregates over the events stream table.",
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 90).alias("any_big"),
        F.bit_and("user_id").alias("band"),
        F.bit_or("user_id").alias("bor"),
        F.bit_xor("user_id").alias("bxor"),
    )


@query(
    "agg_string_array",
    oracle="""
    SELECT
      n_regionkey,
      string_agg(n_name, ',' ORDER BY n_name) AS names_csv,
      len(list(n_name))                       AS names_n,
      list_sort(list(n_name))[1]              AS first_name
    FROM nation
    GROUP BY n_regionkey
    """,
    doc="string_agg / array_agg (deterministic via sorted order). The "
    "array_agg result is projected to scalars (length + first element) so "
    "the driver's pandas hash harness never sees a list cell.",
)
def agg_string_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names_csv"),
        F.size(F.collect_list("n_name")).alias("names_n"),
        F.element_at(F.sort_array(F.collect_list("n_name")), 1).alias("first_name"),
    )


@query(
    "agg_median_percentile",
    oracle="""
    SELECT
      l_linestatus,
      round(median(l_quantity), 6)                                       AS med_qty,
      round(quantile_cont(l_extendedprice, 0.5), 6)                      AS p50_price,
      round(quantile_cont(l_extendedprice, 0.9), 6)                      AS p90_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="Exact median + continuous percentiles (DataFusion: median / "
    "approx_percentile_cont; Spark: median / percentile).",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT date_trunc('month', l_shipdate)) AS BIGINT)
                                                        AS approx_ship_months,
           CAST(count(DISTINCT l_linestatus) AS BIGINT) AS approx_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++) per group, run in its documented "
    "EXACT regime (reference analogue: DataFusion approx_distinct). At "
    "rsd=0.005 the register array has m=2^16 cells and the estimator "
    "takes the linear-counting branch; for n distinct << sqrt(m) the "
    "rounded estimate equals the exact count. The estimated keys are "
    "CALENDAR-BOUNDED — distinct ship months (<=84, fixed by the "
    "TPC-H date range) and line statuses (3) — so the exact regime "
    "holds at ANY scale factor, not just the driver's correctness SFs "
    "(verified exact at sf0.001/0.01/0.1; an earlier supplier-key "
    "variant drifted at sf0.1's 1000 suppliers). The high-cardinality "
    "~0.5%-error regime — the scale/accuracy trade the operator exists "
    "for — is exercised by pytest on an unbounded key instead, where "
    "an exact oracle is the wrong contract.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct(F.trunc("l_shipdate", "month"), 0.005).alias(
            "approx_ship_months"
        ),
        F.approx_count_distinct("l_linestatus", 0.005).alias("approx_statuses"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (grand total + per-flag subtotals).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions (all 4 grouping-set combinations).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(grouping(l_returnflag) AS INTEGER)  AS g_flag,
           CAST(grouping(l_linestatus) AS INTEGER)  AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS + grouping() marker columns.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT
      l_returnflag,
      round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_o,
      round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot l_linestatus into columns (Spark .pivot ≡ conditional sums).",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
    )


@query(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="DISTINCT ≡ group-by-all-columns (ReplaceDistinctWithAggregate).",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
    doc="HAVING — post-aggregation filter.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") > 12)
    )


@query(
    "agg_stats_regression",
    oracle="""
    SELECT
      l_returnflag,
      round(skewness(l_quantity), 4)                          AS skew_qty,
      round(kurtosis(l_quantity), 4)                          AS kurt_qty,
      round(regr_slope(l_extendedprice, l_quantity), 6)       AS slope,
      round(regr_intercept(l_extendedprice, l_quantity), 6)   AS intercept,
      round(regr_r2(l_extendedprice, l_quantity), 6)          AS r2,
      CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
      round(regr_avgx(l_extendedprice, l_quantity), 6)        AS avgx,
      round(regr_avgy(l_extendedprice, l_quantity), 6)        AS avgy,
      count_if(l_quantity > 25)                               AS n_big
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Higher-moment + linear-regression aggregates: skewness, excess "
    "kurtosis, regr_slope/intercept/r2/count/avgx/avgy, count_if.",
)
def agg_stats_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        # 4dp: Spark and DuckDB use different one-pass moment updates —
        # they agree to ~1e-5, not 1e-6
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 6).alias("avgx"),
        F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 6).alias("avgy"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
    )


@query(
    "agg_countif_mode",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big_qty,
           CAST(count(*) FILTER (WHERE l_discount = 0.0) AS BIGINT) AS n_no_disc,
           mode(l_linestatus) AS status_mode
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="count_if (≡ FILTER-ed count) and mode() per group — newer "
    "aggregate surface (Spark 3.5+/4.x). mode is deterministic on this "
    "data: each returnflag group has a unique most-frequent linestatus "
    "at every SF (verified 0.001/0.01/0.1).",
)
def agg_countif_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_big_qty"),
            F.count_if(F.col("l_discount") == 0.0).alias("n_no_disc"),
            F.mode("l_linestatus").alias("status_mode"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_max_by_min_by",
    oracle="""
    -- arg_max with a composite ordering key is unsupported in DuckDB 1.0;
    -- tie-safe extremum picks via row_number (lexicographic == Spark's
    -- struct(o_totalprice, o_orderkey) comparator in max_by/min_by).
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC,  o_orderkey ASC)  AS rn_min
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)                        AS n,
           max(CASE WHEN rn_max = 1 THEN o_orderkey END)   AS biggest_order,
           max(CASE WHEN rn_min = 1 THEN o_orderkey END)   AS smallest_order,
           round(max(o_totalprice), 2)                     AS top_price,
           round(min(o_totalprice), 2)                     AS bottom_price
    FROM ranked
    GROUP BY o_orderpriority
    """,
    doc="max_by/min_by (DuckDB arg_max/arg_min): pick the argument at the "
    "extremum of an ordering expression, made tie-safe by a unique "
    "(price, orderkey) struct comparator — single hash aggregate, no "
    "window sort, map-side partials at scale.",
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    key = F.struct("o_totalprice", "o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.max_by("o_orderkey", key).alias("biggest_order"),
        F.min_by("o_orderkey", key).alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("top_price"),
        F.round(F.min("o_totalprice"), 2).alias("bottom_price"),
    )


@query(
    "agg_hll_partial_merge",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS approx_users
    FROM events
    GROUP BY event_type
    """,
    doc="Re-aggregatable approx-distinct: per (event_type, month) "
    "Datasketches HLL sketches built map-side (hll_sketch_agg, "
    "lgConfigK=21), then merged per event_type with hll_union_agg — the "
    "two-level partial/final pattern that lets a 100 TB rollup reuse "
    "daily sketches instead of rescanning raw data. EXACT regime: a "
    "Datasketches HLL stays in coupon (list/set) mode until ~3/4*2^lgK "
    "retained hashes, where the estimate is the exact coupon count; the "
    "~150 distinct users per type at test SFs sit far inside it, so the "
    "exact-SQL twin is a valid oracle (documented trade: estimates with "
    "~0.4% error at 100 TB cardinalities).",
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    partial = ev.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("month")
    ).agg(F.hll_sketch_agg("user_id", F.lit(21)).alias("sk"))
    return partial.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )


@query(
    "agg_percentile_within_group",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50_cont,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_cont,
           round(quantile_disc(o_totalprice, 0.25), 2) AS p25_disc,
           round(quantile_disc(o_totalprice, 0.75), 2) AS p75_disc
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Ordered-set aggregates (SQL:2008 WITHIN GROUP): percentile_cont "
    "linear interpolation + percentile_disc exact order statistic per "
    "priority class. DuckDB spells them quantile_cont/quantile_disc — "
    "identical (n-1)*p indexing, verified value-equal at both SFs.",
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50_cont,
               round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90_cont,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p25_disc,
               round(percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p75_disc
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact distinct counting via Spark 3.5 bitmap aggregates: keys are "
    "bucketed (bitmap_bucket_number), each bucket builds a fixed-size "
    "bitmap (bitmap_construct_agg of bit positions), and bucket "
    "cardinalities sum to the exact distinct count. Unlike "
    "count(DISTINCT) this is re-aggregatable: persisted per-bucket "
    "bitmaps OR-merge (bitmap_or_agg) across rollup levels without "
    "rescanning the fact table — the exact-count analogue of the HLL "
    "partial/merge pipeline. Oracle: plain count(DISTINCT).",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH buckets AS (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bkt,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
          FROM orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        SELECT o_orderpriority,
               CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_customers
        FROM buckets
        GROUP BY o_orderpriority
        """
    )


@query(
    "agg_regression_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)      AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)  AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 6)         AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6)       AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 6)       AS avgy
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Linear-regression aggregate family (SQL:2003 regr_*): slope, "
    "intercept, R², and the paired averages of price-vs-quantity per "
    "return flag. One hash aggregate with map-side partials — the "
    "moment sums are decomposable, so this scales like any sum.",
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               round(regr_slope(l_extendedprice, l_quantity), 4)      AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)  AS icept,
               round(regr_r2(l_extendedprice, l_quantity), 6)         AS r2,
               round(regr_avgx(l_extendedprice, l_quantity), 6)       AS avgx,
               round(regr_avgy(l_extendedprice, l_quantity), 6)       AS avgy
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_histogram_width_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 21
                ELSE CAST(floor(o_totalprice / 30000) + 1 AS BIGINT)
           END                      AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket(x, 0, 600000, 20): the "
    "single-pass binning aggregate (21 = overflow bucket). DuckDB 1.0 "
    "has no width_bucket, so the oracle spells out the same floor "
    "arithmetic — which also documents the exact bucket semantics.",
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = F.expr("width_bucket(o_totalprice, 0, 600000, 20)")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5)  AS p50_approx,
           quantile_disc(value, 0.99) AS p99_approx,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="approx_percentile (Greenwald-Khanna sketch) per event_type — the "
    "single-pass, mergeable quantile estimator that replaces exact "
    "percentile at 100 TB (exact needs a full sort or all values in "
    "memory per group; the sketch is O(accuracy) state and "
    "re-aggregatable map-side). EXACT regime: with accuracy=1e6 the GK "
    "summary keeps every sample while n_per_group <= accuracy, so the "
    "answer is the exact lower order statistic — quantile_disc is a "
    "valid oracle at test SFs (documented trade: rank error n/1e6 at "
    "100 TB group sizes).",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(1000000)).alias("p50_approx"),
        F.percentile_approx("value", F.lit(0.99), F.lit(1000000)).alias("p99_approx"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_grouped_pandas_udaf",
    oracle="""
    SELECT event_type,
           round(sum(value * (user_id + 1.0)) / sum(user_id + 1.0), 6) AS wmean
    FROM events
    GROUP BY event_type
    """,
    doc="Custom aggregate as a GROUPED_AGG pandas UDF: weighted mean over "
    "Arrow-batched group columns — the extension point for aggregates "
    "Spark lacks. Unlike builtin aggregates this holds each group's "
    "column in memory (no partial/final split), so at scale it needs "
    "bounded group cardinality; for decomposable stats prefer the "
    "builtin sum/count composition the oracle spells.",
)
def agg_grouped_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = load(spark, sf_dir, "events")
    # NB: a GROUPED_AGG pandas UDF cannot mix with builtin aggregates in
    # the same agg() — Spark plans it as AggregateInPandas
    return ev.groupBy("event_type").agg(
        F.round(
            wmean("value", F.col("user_id").cast("double") + 1.0), 6
        ).alias("wmean")
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           year(o_orderdate)            AS yr,
           count(*)                     AS n,
           round(sum(o_totalprice), 2)  AS total
    FROM orders
    GROUP BY ALL
    """,
    doc="GROUP BY ALL / ORDER BY ALL (modern SQL shorthand, Spark 4 and "
    "DuckDB both infer the grouping keys from the non-aggregate select "
    "items — including the computed year() column).",
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               year(o_orderdate)            AS yr,
               count(*)                     AS n,
               round(sum(o_totalprice), 2)  AS total
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      FROM orders GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY cnt DESC, o_orderpriority DESC) AS rn
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
    doc="Deterministic MODE (most frequent value): two-level aggregate — "
    "count per (group, value), then max_by over a (count, value) struct "
    "so ties break on the larger value instead of arbitrarily (both "
    "engines' native mode() is nondeterministic on ties). Two hash "
    "aggregates, no window over the raw table — the second aggregate "
    "input is only |groups|×|distinct values| rows.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    best = F.max_by(
        F.struct(F.col("o_orderpriority"), F.col("cnt")),
        F.struct(F.col("cnt"), F.col("o_orderpriority")),
    )
    return counts.groupBy("o_orderstatus").agg(
        best.getField("o_orderpriority").alias("mode_priority"),
        best.getField("cnt").alias("mode_count"),
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT l_returnflag,
           count(*)                                               AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05)              AS n_disc,
           round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2)
                                                                  AS rev_bulk,
           round(avg(l_quantity) FILTER (WHERE l_tax < 0.03), 4)  AS avg_lowtax,
           count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F')
                                                                  AS supp_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="SQL:2003 FILTER clause — per-aggregate predicates inside one "
    "grouped scan (the declarative form of conditional aggregation; "
    "one pass, no self-joins, each aggregate sees its own row subset).",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*)                                               AS n_all,
               count(*) FILTER (WHERE l_discount > 0.05)              AS n_disc,
               round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2)
                                                                      AS rev_bulk,
               round(avg(l_quantity) FILTER (WHERE l_tax < 0.03), 4)  AS avg_lowtax,
               count(DISTINCT l_suppkey) FILTER (WHERE l_linestatus = 'F')
                                                                      AS supp_f
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


# --- Count-min sketch, composed from relational primitives -------------
# Depth x width chosen so the sketch table is tiny (CMS_D*CMS_W cells);
# Kirsch-Mitzenmacher double hashing reuses ONE md5 per item (same
# construction as the MinHash family, so the DuckDB oracle is exact).
CMS_D, CMS_W = 4, 64


def _cms_slot(wcol, jcol):
    h1 = F.conv(F.substring(F.md5(wcol), 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(wcol), 17, 15), 16, 10).cast("bigint")
    return (h1 + jcol.cast("bigint") * h2) % CMS_W


@query(
    "agg_countmin_estimate",
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ), occ AS (
      SELECT w, j FROM words, range({CMS_D}) t(j)
    ), cells AS (
      SELECT j,
             (('0x'||substr(md5(w),1,15))::BIGINT
              + j * ('0x'||substr(md5(w),17,15))::BIGINT) % {CMS_W} AS slot,
             count(*) AS cell_n
      FROM occ GROUP BY j, slot
    ), probes AS (
      SELECT w, count(*) AS true_n FROM words GROUP BY w
    ), pe AS (
      SELECT w, true_n, j,
             (('0x'||substr(md5(w),1,15))::BIGINT
              + j * ('0x'||substr(md5(w),17,15))::BIGINT) % {CMS_W} AS slot
      FROM probes, range({CMS_D}) t(j)
    )
    SELECT w,
           CAST(true_n AS BIGINT)              AS true_n,
           CAST(min(cell_n) AS BIGINT)         AS est_n,
           CAST(min(cell_n) - true_n AS BIGINT) AS overcount
    FROM pe JOIN cells USING (j, slot)
    GROUP BY w, true_n
    """,
    doc="Count-min sketch composed from relational primitives: the "
    f"{CMS_D}x{CMS_W} cell table is ONE map-side-combined groupBy over "
    "the token stream (the sketch build is a bounded-size aggregate no "
    "matter how big the corpus), and point queries take min over the "
    "item's row slots via a broadcast join of the tiny cell table. "
    "CMS guarantees est >= true (overcount is never negative); double "
    "hashing gives the d rows from one md5, identically in the oracle. "
    "Mirrors Spark's builtin count_min_sketch() (binary blob) with a "
    "queryable, engine-portable plan.",
)
def agg_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
    js = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("j")
    occ = words.select("w", js)
    cells = occ.withColumn("slot", _cms_slot(F.col("w"), F.col("j"))).groupBy(
        "j", "slot"
    ).agg(F.count(F.lit(1)).alias("cell_n"))
    probes = words.groupBy("w").agg(F.count(F.lit(1)).alias("true_n"))
    pe = probes.select("w", "true_n", js).withColumn(
        "slot", _cms_slot(F.col("w"), F.col("j"))
    )
    return (
        pe.join(F.broadcast(cells), ["j", "slot"])
        .groupBy("w", "true_n")
        .agg(F.min("cell_n").alias("est_n"))
        .select(
            "w",
            "true_n",
            "est_n",
            (F.col("est_n") - F.col("true_n")).alias("overcount"),
        )
    )


@query(
    "agg_theta_sketch_setops",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND value > 150),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 150)
    SELECT (SELECT count(*) FROM a) AS users_a,
           (SELECT count(*) FROM b) AS users_b,
           (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS users_union,
           (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS users_intersect,
           (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS users_only_a
    """,
    doc="Theta sketches (Datasketches) with full set algebra: distinct "
    "high-value clickers vs purchasers, plus union / intersection / "
    "difference cardinalities computed ON THE SKETCHES — no re-scan, no "
    "shuffle of raw ids; each side collapses map-side into one 4KB "
    "sketch. Below 2^12 retained entries a theta sketch is EXACT, so "
    "the exact-SQL oracle is valid at test SFs (documented regime; at "
    "larger scale estimates carry ~1.6% relative error).",
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "click") & (F.col("value") > 150)).agg(
        F.theta_sketch_agg("user_id").alias("a")
    )
    b = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)).agg(
        F.theta_sketch_agg("user_id").alias("b")
    )
    return a.crossJoin(b).select(
        F.theta_sketch_estimate(F.col("a")).alias("users_a"),
        F.theta_sketch_estimate(F.col("b")).alias("users_b"),
        F.theta_sketch_estimate(F.theta_union(F.col("a"), F.col("b"))).alias(
            "users_union"
        ),
        F.theta_sketch_estimate(F.theta_intersection(F.col("a"), F.col("b"))).alias(
            "users_intersect"
        ),
        F.theta_sketch_estimate(F.theta_difference(F.col("a"), F.col("b"))).alias(
            "users_only_a"
        ),
    )


@query(
    "agg_kll_quantile_sketch",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT)   AS n_values,
           quantile_disc(value, 0.5)  AS p50_est,
           quantile_disc(value, 0.9)  AS p90_est
    FROM events
    GROUP BY event_type
    """,
    doc="Re-aggregatable quantiles via Datasketches KLL: per (event_type, "
    "month) partial sketches built map-side (kll_sketch_agg_double, "
    "k=65535), then merged per event_type with a higher-order reduce over "
    "the collected partials (kll_sketch_merge_double is a binary scalar) "
    "— the same partial/final pattern as the HLL rollup, for quantiles: "
    "a 100 TB daily pipeline keeps small sketches per bucket and answers "
    "p50/p90 over any bucket union without rescanning raw data. EXACT "
    "regime: a KLL sketch retains every item until ~k samples, where "
    "get_quantile returns the exact lower order statistic — "
    "quantile_disc is a valid oracle at test SFs (~2k values/group); at "
    "100 TB it degrades gracefully to ~1.7%-rank-error estimates.",
)
def agg_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    partial = ev.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("month")
    ).agg(F.kll_sketch_agg_double("value", F.lit(65535)).alias("sk"))
    merged = partial.groupBy("event_type").agg(F.collect_list("sk").alias("sks"))
    sk = F.reduce(
        F.slice("sks", 2, 1_000_000),
        F.element_at("sks", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return merged.select(
        "event_type",
        F.kll_sketch_get_n_double(sk).alias("n_values"),
        F.kll_sketch_get_quantile_double(sk, F.lit(0.5)).alias("p50_est"),
        F.kll_sketch_get_quantile_double(sk, F.lit(0.9)).alias("p90_est"),
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    """,
    doc="approx_top_k frequent-items sketch (Spark 4 Datasketches "
    "ItemsSketch) in its documented EXACT regime: maxItemsTracked=10000 "
    "far exceeds the 5 distinct event types, so every counter is exact "
    "and k=|distinct| returns the complete frequency table — the oracle "
    "is the plain GROUP BY count. At 100 TB with high-cardinality keys "
    "the same one-pass partial/final sketch merge degrades gracefully to "
    "epsilon-approximate heavy hitters instead of OOMing a hash "
    "aggregate. Struct-array output is exploded back to scalar "
    "(item, cnt) rows.",
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 5, 10000)").alias("tk"))
    return sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").cast("bigint").alias("cnt")
    )


@query(
    "agg_misc_battery",
    oracle="""
    SELECT l_returnflag,
           CAST(count_if(l_quantity > 25) AS BIGINT)       AS n_bulk,
           CAST(min(l_orderkey) AS BIGINT)                 AS any_key,
           CAST(count(DISTINCT l_linestatus) AS BIGINT)    AS n_statuses,
           round(sum(l_quantity) FILTER (WHERE l_discount > 0.05), 2)
                                                           AS discounted_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Miscellaneous-aggregate battery: count_if (SQL:2023 conditional "
    "count), any_value pinned to its deterministic min witness (raw "
    "any_value is legitimately nondeterministic, so the query asserts "
    "the determinism-safe usage), a DISTINCT count, and a FILTERed sum. "
    "All partial/final hash aggregates. The ordered-DISTINCT listagg "
    "lives in its own query, agg_listagg_ordered — Spark 4.1 "
    "ClassCastExceptions when it shares a SELECT with other "
    "distinct/filtered aggregates.",
)
def agg_misc_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    # any_value is nondeterministic by contract; the deterministic way to
    # say "give me one witness" is an explicit extremum (min)
    return spark.sql(
        """
        SELECT l_returnflag,
               count_if(l_quantity > 25)                     AS n_bulk,
               min(l_orderkey)                               AS any_key,
               count(DISTINCT l_linestatus)                  AS n_statuses,
               round(sum(l_quantity) FILTER (WHERE l_discount > 0.05), 2)
                                                             AS discounted_qty
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ','
                      ORDER BY l_linestatus) AS statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Spark 4 listagg(DISTINCT ...) WITHIN GROUP (ORDER BY ...) <-> "
    "DuckDB string_agg(DISTINCT ... ORDER BY ...). Kept as its own query: "
    "Spark 4.1 throws ClassCastException when an ordered-DISTINCT listagg "
    "shares a SELECT with other distinct/filtered aggregates (the "
    "rewrite rule mishandles the SortOrder) - documented engine quirk.",
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               listagg(DISTINCT l_linestatus, ',')
                 WITHIN GROUP (ORDER BY l_linestatus) AS statuses
        FROM lineitem
        GROUP BY l_returnflag
        """
    )
