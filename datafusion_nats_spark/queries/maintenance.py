"""Table-maintenance operators: upsert (SCD-1 merge) and slowly-changing-
dimension history (SCD-2) — the change-data-application surface a
long-lived 100 TB table needs. OSS Spark parquet has no MERGE INTO DML;
both are expressed as declarative join/window plans (exactly what Delta's
MERGE compiles to underneath): a full-outer key join for SCD-1, a
per-key version window for SCD-2. Both shuffle once on the (high-
cardinality) business key.

The change sets are derived deterministically from ``orders`` so the
DuckDB oracle can replay the identical merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

# deterministic change-set recipe shared by Spark and the oracle:
# every 7th order gets a 10% price update; every 97th key is re-inserted
# shifted by +10_000_000 (a brand-new key -> INSERT side of the merge)
_UPD_MOD, _INS_MOD, _INS_SHIFT = 7, 97, 10_000_000


def _changes(o: DataFrame) -> DataFrame:
    upd = o.filter(F.col("o_orderkey") % _UPD_MOD == 0).select(
        F.col("o_orderkey").alias("key"),
        F.floor(F.col("o_totalprice") * 1.1).alias("new_price"),
    )
    ins = o.filter(F.col("o_orderkey") % _INS_MOD == 0).select(
        (F.col("o_orderkey") + _INS_SHIFT).alias("key"),
        F.floor(F.col("o_totalprice")).alias("new_price"),
    )
    return upd.unionByName(ins)


_CHANGES_DUCK = f"""
      SELECT o_orderkey AS key, CAST(trunc(o_totalprice * 1.1) AS BIGINT) AS new_price
      FROM orders WHERE o_orderkey % {_UPD_MOD} = 0
      UNION ALL
      SELECT o_orderkey + {_INS_SHIFT} AS key, CAST(trunc(o_totalprice) AS BIGINT) AS new_price
      FROM orders WHERE o_orderkey % {_INS_MOD} = 0
"""


@query(
    "maintenance_upsert_scd1",
    oracle=f"""
    WITH changes AS ({_CHANGES_DUCK}),
    merged AS (
      SELECT coalesce(b.o_orderkey, c.key) AS key,
             coalesce(c.new_price, CAST(trunc(b.o_totalprice) AS BIGINT)) AS price,
             CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
                  WHEN c.key IS NULL THEN 'kept'
                  ELSE 'updated' END AS action
      FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
    )
    SELECT action,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price) AS BIGINT)  AS total_price
    FROM merged
    GROUP BY action
    """,
    doc="SCD-1 upsert (MERGE INTO semantics on plain parquet): base FULL "
    "OUTER change-set on the business key; matched rows take the new "
    "value, unmatched-by-source rows are kept, unmatched-by-target rows "
    "are inserts. One shuffle on the key — the same physical shape "
    "Delta's MERGE lowers to.",
)
def maintenance_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = _changes(o)
    b = o.select("o_orderkey", F.floor("o_totalprice").alias("old_price"))
    merged = b.join(c, b.o_orderkey == c.key, "full_outer").select(
        F.coalesce(F.col("o_orderkey"), F.col("key")).alias("key"),
        F.coalesce(F.col("new_price"), F.col("old_price")).alias("price"),
        F.when(F.col("o_orderkey").isNull(), "inserted")
        .when(F.col("key").isNull(), "kept")
        .otherwise("updated")
        .alias("action"),
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price").alias("total_price"),
    )


@query(
    "maintenance_scd2_history",
    oracle=f"""
    WITH snap1 AS (
      SELECT o_orderkey AS key, CAST(trunc(o_totalprice) AS BIGINT) AS price, 1 AS version
      FROM orders
    ), snap2 AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % {_UPD_MOD} = 0
                  THEN CAST(trunc(o_totalprice * 1.1) AS BIGINT)
                  ELSE CAST(trunc(o_totalprice) AS BIGINT) END AS price,
             2 AS version
      FROM orders
    ), united AS (
      SELECT * FROM snap1 UNION ALL SELECT * FROM snap2
    ), changed AS (
      -- keep only rows whose value differs from the previous version
      SELECT key, price, version
      FROM (SELECT key, price, version,
                   lag(price) OVER (PARTITION BY key ORDER BY version) AS prev
            FROM united)
      WHERE prev IS NULL OR price <> prev
    ), history AS (
      SELECT key, price, version AS valid_from,
             lead(version) OVER (PARTITION BY key ORDER BY version) AS valid_to
      FROM changed
    )
    SELECT (valid_to IS NULL)         AS is_current,
           CAST(count(*) AS BIGINT)   AS n_rows,
           CAST(count(DISTINCT key) AS BIGINT) AS n_keys,
           CAST(sum(price) AS BIGINT)  AS total_price
    FROM history
    GROUP BY is_current
    """,
    doc="SCD-2 history build: union of two snapshots -> per-key version "
    "window -> suppress no-op versions (value unchanged) -> open/closed "
    "validity ranges via lead(). Per-key windows keep every sort "
    "partition-local at scale.",
)
def maintenance_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    snap1 = o.select(
        F.col("o_orderkey").alias("key"),
        F.floor("o_totalprice").alias("price"),
        F.lit(1).alias("version"),
    )
    snap2 = o.select(
        F.col("o_orderkey").alias("key"),
        F.when(
            F.col("o_orderkey") % _UPD_MOD == 0, F.floor(F.col("o_totalprice") * 1.1)
        )
        .otherwise(F.floor("o_totalprice"))
        .alias("price"),
        F.lit(2).alias("version"),
    )
    united = snap1.unionByName(snap2)
    w = W.partitionBy("key").orderBy("version")
    changed = (
        united.withColumn("prev", F.lag("price").over(w))
        .filter(F.col("prev").isNull() | (F.col("price") != F.col("prev")))
        .drop("prev")
    )
    history = changed.withColumn("valid_to", F.lead("version").over(w)).withColumnRenamed(
        "version", "valid_from"
    )
    return history.groupBy(
        F.col("valid_to").isNull().alias("is_current")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("key").alias("n_keys"),
        F.sum("price").alias("total_price"),
    )


@query(
    "maintenance_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_totalprice AS p_old
      FROM orders WHERE o_orderkey % 7 <> 0
    ), new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS p_new
      FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT CASE WHEN p_old IS NULL THEN 'added'
                WHEN p_new IS NULL THEN 'removed'
                WHEN p_old = p_new THEN 'unchanged'
                ELSE 'changed' END AS status,
           count(*) AS n_rows,
           CAST(sum(k) AS BIGINT) AS key_checksum
    FROM old FULL OUTER JOIN new USING (k)
    GROUP BY status
    """,
    doc="Snapshot diff (table-format change detection): two versions of a "
    "keyed table are reconciled into added / removed / changed / "
    "unchanged classes via one full-outer join on the business key — the "
    "audit primitive behind incremental syncs and CDC backfills. Both "
    "snapshots shuffle once on the (unique, unskewed) key; at 100 TB "
    "bucket both snapshots on the key so the diff is a zero-exchange "
    "sort-merge join. Change sets are derived deterministically from "
    "orders (mod-7 deletes, mod-3 retention, mod-5 price bump) so the "
    "oracle replays the identical diff.",
)
def maintenance_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    old = o.filter(k % 7 != 0).select(k.alias("k"), F.col("o_totalprice").alias("p_old"))
    new = o.filter(k % 3 != 0).select(
        k.alias("k"),
        F.when(k % 5 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("p_new"),
    )
    j = old.join(new, "k", "full_outer")
    status = (
        F.when(F.col("p_old").isNull(), "added")
        .when(F.col("p_new").isNull(), "removed")
        .when(F.col("p_old") == F.col("p_new"), "unchanged")
        .otherwise("changed")
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").cast("bigint").alias("key_checksum"),
    )


_REFRESH_CUTOFF = "1997-01-01"  # orders on/after this date are the "new" load


@query(
    "maintenance_incremental_agg_refresh",
    oracle=f"""
    SELECT CAST(o_orderdate AS DATE)          AS order_date,
           CAST(count(*) AS BIGINT)           AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE)                    AS revenue,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                * 10000 // count(*) AS BIGINT) AS avg_price_micros
    FROM orders
    GROUP BY 1
    """,
    doc="Incremental materialized-aggregate refresh: the daily-revenue "
    "rollup is maintained as re-aggregatable partial state (sum, count "
    "per day) built from the historical partitions (< cutoff), and a new "
    "load (>= cutoff) is folded in by merging partials — sum-of-sums / "
    "sum-of-counts — with derived metrics (avg) computed only at read "
    "time. The oracle is the full recompute over all of orders, proving "
    "merge(old_state, delta) == recompute. At 100 TB this is the core "
    "continuous-aggregate maintenance pattern: a refresh scans ONLY the "
    "new partition (partition pruning on the date key), never the "
    "historical fact table, and state stays one row per (day) — "
    "re-aggregation is algebraic, so it also distributes over any "
    "partitioning of the delta.",
)
def maintenance_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit(_REFRESH_CUTOFF).cast("timestamp")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderdate").cast("date").alias("order_date")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(price).alias("rev_sum"),
        )

    state = partials(o.filter(F.col("o_orderdate") < cutoff))  # historical MV
    delta = partials(o.filter(F.col("o_orderdate") >= cutoff))  # new load only
    merged = (
        state.unionByName(delta)
        .groupBy("order_date")
        .agg(F.sum("n_orders").alias("n_orders"), F.sum("rev_sum").alias("rev_sum"))
    )
    return merged.select(
        "order_date",
        "n_orders",
        F.round("rev_sum", 2).cast("double").alias("revenue"),
        # integer micro-units, not a rounded double: at sf0.1 the exact
        # quotient hit a .xxxxxx5 half-way value and Spark (half-up) and
        # DuckDB (half-even) rounded it APART — floor integer division of
        # exact cents*10^4 is engine-exact at every scale
        F.expr(
            "CAST(rev_sum * 100 AS BIGINT) * CAST(10000 AS BIGINT) div n_orders"
        ).alias("avg_price_micros"),
    )


_ERASE_MOD = 97  # user_id % 97 == 0 plays the erasure-request list


@query(
    "maintenance_user_erasure",
    oracle=f"""
    SELECT event_type,
           CAST(sum(CASE WHEN user_id % {_ERASE_MOD} <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_kept,
           CAST(sum(CASE WHEN user_id % {_ERASE_MOD} = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_erased,
           CAST(count(DISTINCT CASE WHEN user_id % {_ERASE_MOD} = 0
                                    THEN user_id END) AS BIGINT) AS users_erased
    FROM events
    GROUP BY event_type
    """,
    doc="Right-to-erasure (GDPR Art. 17) apply + audit: every event of the "
    "requesting users (deterministic stand-in list: user_id % 97 == 0) is "
    "removed via broadcast anti-join — the erase list is small by nature, "
    "so the 100 TB fact table never shuffles, each file rewrites map-side "
    "— and the compliance audit reports kept/erased rows and distinct "
    "erased users per event type. The oracle recomputes both sides from "
    "the membership predicate.",
)
def maintenance_user_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    erase = (
        ev.select("user_id")
        .distinct()
        .filter(F.col("user_id") % _ERASE_MOD == 0)
    )  # the request list — tiny, broadcast
    kept = ev.join(F.broadcast(erase), "user_id", "left_anti")
    erased = ev.join(F.broadcast(erase), "user_id", "left_semi")
    k = kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("rows_kept"))
    e = erased.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("rows_erased"),
        F.countDistinct("user_id").alias("users_erased"),
    )
    return (
        k.join(e, "event_type", "full")
        .select(
            "event_type",
            F.coalesce("rows_kept", F.lit(0)).alias("rows_kept"),
            F.coalesce("rows_erased", F.lit(0)).alias("rows_erased"),
            F.coalesce("users_erased", F.lit(0)).alias("users_erased"),
        )
    )
