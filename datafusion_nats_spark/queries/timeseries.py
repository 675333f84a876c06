"""Time-series operator family over the ``events`` stream table.

The reference exposes NATS subjects as append-only tables (SURVEY.md
§1.1); the natural workload on such a table is time-series analysis.
These are the batch twins of the streaming windows in
``streaming/pipelines.py``: sessionization (gaps-and-islands), dense
resampling with LOCF gap-fill, and OHLC downsampling.

Scale notes: every operator here partitions by a high-cardinality key
(``user_id`` / ``event_type``×day) before any window sort, so no single
window partition exceeds executor memory at 100 TB; the gap-fill grid is
generated per-key (sequence/explode map-side — no shuffle beyond the
initial per-key aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

SESSION_GAP = "INTERVAL 30 MINUTES"


@query(
    "window_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*)                                          AS n_events,
           min(ts)                                           AS session_start,
           max(ts)                                           AS session_end,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s,
           round(sum(value), 2)                              AS total_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    doc="Batch sessionization (gaps-and-islands): a new session starts "
    "after a >30 min silence per user. The batch twin of the streaming "
    "session_window pipeline; timestamp arithmetic (not unix-seconds "
    "truncation) so the gap test is exact to the microsecond.",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr(SESSION_GAP)), 1
    ).otherwise(0)
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "timeseries_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             round(sum(value), 2) AS day_val
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT g.user_id, g.day,
           last_value(d.day_val IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_val,
           (d.day_val IS NOT NULL) AS is_observed
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
    doc="Dense daily resample with LOCF (last-observation-carried-forward) "
    "gap-fill: per-user date grid via sequence/explode, left join against "
    "observed days, IGNORE NULLS running last_value. The grid is generated "
    "map-side per user — no extra shuffle over the per-day aggregate.",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_val"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    filled = grid.join(daily, ["user_id", "day"], "left")
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return filled.select(
        "user_id",
        "day",
        F.last("day_val", ignorenulls=True).over(w).alias("filled_val"),
        F.col("day_val").isNotNull().alias("is_observed"),
    )


@query(
    "timeseries_ohlc_resample",
    oracle="""
    -- DuckDB 1.0's arg_min/arg_max reject a composite (row) ordering key,
    -- so the tie-safe (ts, event_id) pick is spelled as row_number windows;
    -- lexicographic (ts, event_id) ASC/DESC == Spark's struct min_by/max_by.
    WITH ranked AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts ASC,  event_id ASC)  AS rn_first,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM events
    )
    SELECT event_type, day,
           count(*)                                   AS n,
           max(CASE WHEN rn_first = 1 THEN value END) AS open,
           max(value)                                 AS high,
           min(value)                                 AS low,
           max(CASE WHEN rn_last = 1 THEN value END)  AS close,
           round(sum(value), 2)                       AS total
    FROM ranked
    GROUP BY event_type, day
    """,
    doc="OHLC downsampling: first/last-in-bucket via min_by/max_by over a "
    "unique (ts, event_id) ordering struct — a single hash aggregate, no "
    "window sort. open/high/low/close are picked raw doubles (no "
    "arithmetic), so they hash-match bit-exactly across engines.",
)
def timeseries_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tiebreak = F.struct("ts", "event_id")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("value", tiebreak).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", tiebreak).alias("close"),
        F.round(F.sum("value"), 2).alias("total"),
    )


@query(
    "funnel_click_attribution",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'
    ), per_purchase AS (
      SELECT p.user_id, p.purchase_id, count(c.cts) AS n_clicks
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id
       AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 30 DAY
      GROUP BY p.user_id, p.purchase_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)                          AS n_purchases,
           CAST(count(*) FILTER (WHERE n_clicks > 0) AS BIGINT) AS n_attributed,
           CAST(sum(n_clicks) AS BIGINT)                     AS total_clicks
    FROM per_purchase
    GROUP BY user_id
    """,
    doc="Funnel attribution: every purchase left-joined to the clicks that "
    "preceded it within 30 days, per user — an equi(user) + time-range "
    "join, the batch twin of a stream-stream interval join. The equi key "
    "keeps it a hash/SMJ partition-local range probe, never a cartesian.",
)
def funnel_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("cts")
    )
    pairs = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 30 DAYS")),
        "left",
    )
    per_purchase = pairs.groupBy("user_id", "purchase_id").agg(
        F.count("cts").alias("n_clicks")
    )
    return per_purchase.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count_if(F.col("n_clicks") > 0).alias("n_attributed"),
        F.sum("n_clicks").alias("total_clicks"),
    )


ROLLUP_CUTOFF = "2024-01-21 00:00:00"


@query(
    "rollup_continuous_aggregate",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT)                 AS n_events,
           round(sum(value), 2)                     AS sum_value,
           round(max(value), 6)                     AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hypertable-style continuous aggregate (TimescaleDB cagg / "
    "materialized rollup + real-time tail): history older than the "
    "refresh watermark is served from an HOURLY pre-aggregate and "
    "re-aggregated to days, the tail past the watermark is aggregated "
    "from raw rows, and the two branches union into one daily series. "
    "Every statistic is decomposable (count=sum of counts, sum=sum, "
    "max=max) so the rollup answer is EXACTLY the raw-scan answer — "
    "which is what the oracle checks. At 100 TB the hourly rollup is a "
    "persisted table refreshed incrementally; only the watermark tail "
    "ever touches raw data.",
)
def rollup_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit(ROLLUP_CUTOFF).cast("timestamp")
    day = F.date_trunc("day", "ts").alias("day")

    # materialized branch: hourly grains below the watermark (stands in
    # for the persisted rollup table), re-aggregated upward to days
    hourly = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
    )
    old_daily = hourly.groupBy(
        "event_type", F.date_trunc("day", "hour").alias("day")
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.max("max_value").alias("max_value"),
    )

    # real-time branch: raw rows at/after the watermark
    tail_daily = (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("event_type", day)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
    )

    # final merge — a day sliced by the watermark re-combines here
    return (
        old_daily.unionByName(tail_daily)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
            F.round(F.max("max_value"), 6).alias("max_value"),
        )
    )


@query(
    "window_session_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts)                       AS session_start,
           max(ts) + INTERVAL 30 MINUTE  AS session_end,
           count(*)                      AS n_events,
           round(sum(value), 4)          AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
    doc="Spark's NATIVE session_window() operator run in BATCH mode — the "
    "same merging-session-window physical operator the streaming path "
    "uses, so batch and streaming sessionization share one definition. "
    "Session end = last event + gap by definition; the oracle is the "
    "equivalent gaps-and-islands rewrite. Complements window_sessionize "
    "(the manual rewrite) by proving the two formulations agree.",
)
def window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "window_sliding_batch",
    oracle="""
    WITH based AS (
      SELECT event_type, value,
             CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS base
      FROM events
    ), exploded AS (
      SELECT event_type, value,
             make_timestamp((base - 900 * k) * 1000000) AS win_start
      FROM based, (SELECT unnest(range(0, 4)) AS k) ks
    )
    SELECT win_start,
           win_start + INTERVAL 1 HOUR AS win_end,
           event_type,
           count(*)             AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                * 10000 // count(*) AS BIGINT) AS avg_micros
    FROM exploded
    GROUP BY win_start, event_type
    """,
    doc="Sliding (hopping) window aggregation in BATCH mode: window(ts, "
    "'1 hour', '15 minutes') assigns each event to 4 overlapping "
    "buckets. The oracle materializes the same 4 bucket starts per row "
    "via range(0,4) — exactly what Spark's Expand operator does "
    "physically (map-side row replication, then one hash aggregate; "
    "no self-join, no window sort).",
)
def window_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        # avg as exact integer micro-units (values are exactly 2-decimal):
        # a rounded-double avg over power-of-two counts lands on .xxxxxx5
        # half-way values that Spark (half-up) and DuckDB (half-even)
        # round apart — same fix as maintenance_incremental_agg_refresh
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("vsum"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n",
            F.expr(
                "CAST(vsum * 100 AS BIGINT) * CAST(10000 AS BIGINT) div n"
            ).alias("avg_micros"),
        )
    )


@query(
    "timeseries_rolling_zscore_anomaly",
    oracle="""
    WITH rolled AS (
      SELECT event_id, user_id, ts, value,
             avg(value)         OVER w AS mu,
             stddev_samp(value) OVER w AS sd,
             count(*)           OVER w AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, value,
           round((value - mu) / sd, 4) AS zscore
    FROM rolled
    WHERE n >= 10 AND sd > 0 AND abs((value - mu) / sd) > 2.5
    """,
    doc="Rolling z-score anomaly detection: each event scored against the "
    "trailing 20-event window of ITS OWN series (frame ends at 1 "
    "PRECEDING so the point never contaminates its own baseline; "
    "warm-up of <10 points suppressed). Partitioned by user_id — the "
    "window sort is per-key, so no global sort and no single-partition "
    "bottleneck at scale.",
)
def timeseries_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    rolled = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count("*").over(w).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        rolled.filter((F.col("n") >= 10) & (F.col("sd") > 0) & (F.abs(z) > 2.5))
        .select("event_id", "user_id", "ts", "value", F.round(z, 4).alias("zscore"))
    )


@query(
    "timeseries_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id))
               - epoch_us(ts) AS dt
      FROM events
    )
    SELECT user_id,
           count(*)                             AS n_segments,
           CAST(sum(dt) AS BIGINT)              AS total_dt_us,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT) * dt) AS DOUBLE)
                 / CAST(sum(dt) AS DOUBLE) / 100.0, 6) AS twa,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100.0, 6)         AS plain_avg
    FROM seg WHERE dt IS NOT NULL
    GROUP BY user_id
    """,
    doc="Time-weighted average over irregular samples (the TimescaleDB "
    "time_weight operator): each reading is held until the next one "
    "(LOCF interpolation), so its weight is the microsecond gap to its "
    "successor; the last reading of a series carries no weight. One "
    "lead() window partitioned per user (per-key sort, no global sort) "
    "followed by an ordinary grouped aggregate on the same key — AQE "
    "coalesces the two stages onto one exchange. plain_avg is emitted "
    "alongside to expose the sampling bias the weighting corrects.",
)
def timeseries_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.withColumn(
        "dt", F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).filter(F.col("dt").isNotNull())
    # events.value is exact cents: carry it as bigint cents so every sum
    # is an associative integer sum — the float-partial-sum path put the
    # per-user means on 5e-7 rounding boundaries that flip with the
    # partial-aggregation tree (same class as the sim_silhouette fix).
    # Headroom: cents*dt_us <= ~1e5 * 2.6e12 per user-month << 2^63.
    v_c = F.round(F.col("value") * 100).cast("bigint")
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dt").cast("bigint").alias("total_dt_us"),
        F.round(
            F.sum(v_c * F.col("dt")).cast("double")
            / F.sum("dt").cast("double")
            / F.lit(100.0),
            6,
        ).alias("twa"),
        F.round(
            F.sum(v_c).cast("double") / F.count(F.lit(1)) / F.lit(100.0), 6
        ).alias("plain_avg"),
    )


@query(
    "funnel_ordered_stages",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), base AS (SELECT DISTINCT user_id FROM events)
    SELECT base.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS stage,
           t1, t2, t3,
           epoch_us(t3) - epoch_us(t1) AS funnel_us
    FROM base
    LEFT JOIN t1 USING (user_id)
    LEFT JOIN t2 USING (user_id)
    LEFT JOIN t3 USING (user_id)
    """,
    doc="Ordered event funnel (ClickHouse windowFunnel semantics, strict "
    "order): per user, the earliest view, the earliest click AFTER that "
    "view, the earliest purchase AFTER that click — each stage's anchor "
    "is the previous stage's min-timestamp, so the funnel is three "
    "keyed aggregates chained by join, all hash-partitioned on user_id "
    "(one logical shuffle key; AQE reuses the partitioning). No window "
    "over the whole series and no per-user sort of all events.",
)
def funnel_ordered_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    base = ev.select("user_id").distinct()
    j = (
        base.join(t1, "user_id", "left")
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
    )
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return j.select(
        "user_id",
        stage.alias("stage"),
        "t1",
        "t2",
        "t3",
        (F.unix_micros("t3") - F.unix_micros("t1")).alias("funnel_us"),
    )


@query(
    "timeseries_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), sizes AS (
      SELECT cohort_week, count(*) AS cohort_size FROM first_seen GROUP BY cohort_week
    ), activity AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                            CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS week_n,
             e.user_id
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT a.cohort_week, a.week_n,
           count(DISTINCT a.user_id) AS active_users,
           s.cohort_size,
           round(CAST(count(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size, 6)
             AS retention
    FROM activity a JOIN sizes s ON s.cohort_week = a.cohort_week
    GROUP BY a.cohort_week, a.week_n, s.cohort_size
    """,
    doc="Weekly cohort retention: cohort = week of each user's first "
    "event, cell (cohort, weeks-since) = distinct active users and their "
    "share of the cohort — the classic retention triangle. Two shuffles "
    "(per-user min, then the cohort-cell aggregate); the cohort-size "
    "table is week-cardinality and broadcasts into the rate join.",
)
def timeseries_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_seen = (
        e.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    )
    sizes = first_seen.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    activity = e.join(first_seen, "user_id").select(
        "cohort_week",
        (
            F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
            / 7
        )
        .cast("int")
        .alias("week_n"),
        "user_id",
    )
    return (
        activity.groupBy("cohort_week", "week_n")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_n",
            "active_users",
            "cohort_size",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


# EWMA over the most recent 8 observations: weights 0.5^k, k = lag
# distance. A finite-impulse formulation (8 explicit lags) rather than
# the infinite recursion keeps the operator a single per-key window sort
# in BOTH engines — no iterative state, no UDF — and at 100 TB the only
# shuffle is the hash partition on user_id before the window sort.
_EWMA_K = 8
_EWMA_NUM = " + ".join(
    f"coalesce(lag(value, {k}) OVER w, 0) * {0.5 ** k!r}" for k in range(_EWMA_K)
)
_EWMA_DEN = " + ".join(
    f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0 ELSE {0.5 ** k!r} END"
    for k in range(_EWMA_K)
)


@query(
    "timeseries_ewma_smooth",
    oracle=f"""
    SELECT user_id, event_id,
           round(value, 6) AS v,
           round(({_EWMA_NUM}) / ({_EWMA_DEN}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Exponentially-weighted moving average (trend smoothing) per user "
    "over event time. Finite-impulse EWMA: the 8 most recent samples with "
    "exactly-representable binary weights 0.5^k, normalized by the weight "
    "mass actually present (so early rows are unbiased). One window sort "
    "per user_id partition — the identical closed form runs on both "
    "engines, so no recursion or stateful UDF is needed.",
)
def timeseries_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(_EWMA_K):
        lagv = F.lag("value", k).over(w) if k else F.col("value")
        wt = 0.5**k
        num = num + F.coalesce(lagv, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lagv.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("v"),
        F.round(num / den, 6).alias("ewma"),
    )


@query(
    "timeseries_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(min(d.med), 6)  AS med,
           round(min(m.mad), 6)  AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN m.mad > 0 AND 0.6745 * d.adev > 3.5 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection via median absolute deviation: per "
    "event_type, median -> MAD -> count of points with modified z-score "
    "0.6745*|x-med|/MAD > 3.5 (Iglewicz-Hoaglin). Unlike the rolling "
    "z-score operator this is mean/stddev-free, so single extreme values "
    "cannot mask themselves. Two tiny per-group percentile aggregates are "
    "broadcast back against the big scan — the corpus shuffles only for "
    "the final per-group count, and the group-stat frames are O(|types|).",
)
def timeseries_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col("mad") > 0)
                    & (F.lit(0.6745) * F.col("adev") > F.lit(3.5) * F.col("mad")),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "timeseries_daily_count_spikes",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             round(avg(n), 6) AS mean_n,
             round(coalesce(stddev_samp(n), 0), 6) AS sd_n
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           s.mean_n, s.sd_n,
           CAST(sum(CASE WHEN s.sd_n > 0
                          AND d.n > s.mean_n + 3 * s.sd_n
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_spike_days
    FROM daily d JOIN stats s USING (event_type)
    GROUP BY d.event_type, s.mean_n, s.sd_n
    """,
    doc="Volume-anomaly detection on the COUNT dimension (traffic spikes), "
    "complementing the value-based detectors (rolling z-score, MAD): "
    "events roll up to per-(type, day) counts, per-type mean/stddev of "
    "the daily series broadcast back, days above mean+3sd flagged. The "
    "big table collapses to |types|x|days| rows in the FIRST aggregate, "
    "so everything after the initial rollup is negligible at any scale.",
)
def timeseries_daily_count_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.round(F.avg("n"), 6).alias("mean_n"),
        F.round(F.coalesce(F.stddev_samp("n"), F.lit(0.0)), 6).alias("sd_n"),
    )
    spike = F.when(
        (F.col("sd_n") > 0) & (F.col("n") > F.col("mean_n") + 3 * F.col("sd_n")), 1
    ).otherwise(0)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "mean_n", "sd_n")
        .agg(F.count(F.lit(1)).alias("n_days"), F.sum(spike).alias("n_spike_days"))
        .select("event_type", "n_days", "mean_n", "sd_n", "n_spike_days")
    )


@query(
    "timeseries_concurrency_sweepline",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, sid, min(ts) AS t_start, max(ts) AS t_end
      FROM (
        SELECT user_id, ts,
               sum(new_session) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
      )
      GROUP BY user_id, sid
    ), deltas AS (
      SELECT t_start AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT t_end, -1 FROM sess
    ), curve AS (
      SELECT t, sum(delta) AS net
      FROM deltas GROUP BY t
    )
    SELECT t,
           CAST(sum(net) OVER (ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS concurrent_sessions
    FROM curve
    """,
    doc="Concurrent-sessions curve via the SWEEP-LINE pattern: each "
    "session (30-min-gap sessionization, same recipe as "
    "window_sessionize) contributes +1 at its start and -1 at its end; "
    "collapsing deltas per timestamp and running-summing gives exact "
    "concurrency at every change point under the standard HALF-OPEN "
    "[start, end) convention — a session no longer counts at its own "
    "end point (pinned against an independent interval-count model in "
    "tests/test_sweepline_model.py). The scale story is WHY this "
    "pattern exists: the naive form (join every timestamp against every "
    "overlapping interval) is an interval theta-join that degenerates "
    "quadratically; the sweep line is two narrow aggregates + a "
    "SEGMENTED prefix sum over |2×sessions| rows: per-day partitioned "
    "running sums, then the per-day carry-in offsets (a |days|-row "
    "aggregate — calendar-bounded at any corpus size) derived by a "
    "broadcast theta-join and added back. No stage funnels the "
    "change-point curve through a single partition and the plan "
    "contains no unpartitioned window at all.",
)
def timeseries_concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (F.col("ts") > F.lag("ts").over(wu) + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = (
        flagged.select(
            "user_id",
            "ts",
            F.sum("new_session")
            .over(wu.rowsBetween(W.unboundedPreceding, 0))
            .alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
    )
    deltas = sess.select(F.col("t_start").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("t_end").alias("t"), F.lit(-1).alias("delta"))
    )
    curve = deltas.groupBy("t").agg(F.sum("delta").alias("net")).withColumn(
        "bucket", F.to_date("t")
    )
    # segmented prefix sum: partitioned running sums within each day...
    wday = W.partitionBy("bucket").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    within = curve.select("bucket", "t", F.sum("net").over(wday).alias("run_in"))
    # ...plus the carry-in from all prior days: a broadcast theta-join
    # over the AGGREGATED per-day totals (|days| rows, calendar-bounded)
    # — no unpartitioned window anywhere in the plan
    day = curve.groupBy("bucket").agg(F.sum("net").alias("day_net"))
    carry = (
        day.join(
            F.broadcast(
                day.select(F.col("bucket").alias("_pb"), F.col("day_net").alias("_pn"))
            ),
            F.col("_pb") < F.col("bucket"),
            "left",
        )
        .groupBy("bucket")
        .agg(F.coalesce(F.sum("_pn"), F.lit(0)).alias("carry"))
    )
    return within.join(F.broadcast(carry), "bucket").select(
        "t",
        (F.col("run_in") + F.col("carry")).cast("bigint").alias("concurrent_sessions"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH first_view AS (
      SELECT user_id, min(ts) AS v_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), first_purchase AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN first_view v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
      GROUP BY e.user_id
    ), joined AS (
      SELECT v.user_id,
             (epoch_us(p.p_ts) - epoch_us(v.v_ts)) / 60000000.0 AS mins
      FROM first_view v LEFT JOIN first_purchase p ON p.user_id = v.user_id
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_viewers,
           CAST(count(mins) AS BIGINT)                    AS n_converted,
           round(CAST(count(mins) AS DOUBLE) / count(*), 6) AS conv_rate,
           round(quantile_cont(mins, 0.5), 6)             AS med_minutes,
           round(quantile_cont(mins, 0.9), 6)             AS p90_minutes
    FROM joined
    """,
    doc="Funnel latency: per user, minutes from first 'view' to the first "
    "'purchase' at-or-after it, rolled up to conversion rate and "
    "median/p90 time-to-convert. Two per-user min-aggregates (partial/"
    "final, the corpus collapses to |users| rows immediately) and one "
    "user-keyed join; the percentile runs over the already-tiny "
    "converter set. The companion view of funnel_ordered_stages (which "
    "counts stage reach, not latency).",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    first_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    joined = first_view.join(first_purchase, "user_id", "left").select(
        "user_id",
        (
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).cast("double")
            / 60000000.0
        ).alias("mins"),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.count("mins").alias("n_converted"),
        F.round(F.count("mins").cast("double") / F.count(F.lit(1)), 6).alias(
            "conv_rate"
        ),
        F.round(F.expr("percentile(mins, 0.5)"), 6).alias("med_minutes"),
        F.round(F.expr("percentile(mins, 0.9)"), 6).alias("p90_minutes"),
    )


@query(
    "timeseries_seasonality_index",
    oracle="""
    WITH monthly AS (
      SELECT CAST(month(o_orderdate) AS INTEGER) AS m,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             count(*) AS n
      FROM orders GROUP BY 1
    ), base AS (
      SELECT sum(rev) AS tot_rev, sum(n) AS tot_n FROM monthly
    )
    SELECT m.m AS month,
           CAST(m.n AS BIGINT) AS n_orders,
           CAST(round(m.rev, 2) AS DOUBLE) AS revenue,
           round((CAST(m.rev AS DOUBLE) / m.n)
                 / (CAST(b.tot_rev AS DOUBLE) / b.tot_n), 6) AS seasonal_index
    FROM monthly m, base b
    """,
    doc="Multiplicative seasonality index: month-of-year average order "
    "value relative to the overall average (index > 1 = seasonally "
    "strong month). The corpus collapses to 12 rows in the first "
    "aggregate (exact decimal money sums); the global base is a 1-row "
    "broadcast. The classical ratio-to-moving-average first step of "
    "seasonal decomposition, kept exactly SQL-twin-able.",
)
def timeseries_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(F.month("o_orderdate").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    base = monthly.agg(
        F.sum("rev").alias("tot_rev"), F.sum("n_orders").alias("tot_n")
    )
    return monthly.crossJoin(F.broadcast(base)).select(
        "month",
        "n_orders",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            (F.col("rev").cast("double") / F.col("n_orders"))
            / (F.col("tot_rev").cast("double") / F.col("tot_n")),
            6,
        ).alias("seasonal_index"),
    )


@query(
    "timeseries_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             count(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT wk,
           CAST(n AS BIGINT) AS n_orders,
           CAST(round(rev, 2) AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE)
                 / nullif(CAST(lag(rev) OVER (ORDER BY wk) AS DOUBLE), 0)
                 - 1, 6) AS wow_growth
    FROM weekly
    """,
    doc="Week-over-week growth: weekly revenue rollup (exact decimal "
    "sums) with lag-ratio growth rates. The corpus collapses to "
    "|weeks| rows in the first aggregate, so the ordered lag window "
    "runs over a few hundred rows regardless of fact size — the "
    "single-partition window is bounded by construction, not by data. "
    "The growth ratio divides as double AFTER the exact sums (a ratio "
    "of two large decimals is generically irrational — no half-way "
    "boundary class here, unlike count-divided averages).",
)
def timeseries_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("wk")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy("wk")
    return weekly.select(
        "wk",
        "n_orders",
        F.round("rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.nullif(F.lag("rev").over(w).cast("double"), F.lit(0))
            - 1,
            6,
        ).alias("wow_growth"),
    )


@query(
    "events_pareto_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), thresh AS (
      SELECT quantile_cont(n, 0.9) AS p90 FROM per_user
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_users,
           CAST(sum(u.n) AS BIGINT)                          AS n_events,
           round(t.p90, 6)                                   AS p90_events,
           CAST(sum(CASE WHEN u.n > t.p90 THEN 1 ELSE 0 END)
                AS BIGINT)                                   AS n_heavy_users,
           round(CAST(sum(CASE WHEN u.n > t.p90 THEN u.n ELSE 0 END)
                      AS DOUBLE) / sum(u.n), 6)              AS heavy_share
    FROM per_user u, thresh t
    GROUP BY t.p90
    """,
    doc="Pareto concentration (the 80/20 engagement report): how much of "
    "total event volume the above-p90 heavy users generate. "
    "Deliberately computed WITHOUT a global rank/cumulative window — a "
    "percentile threshold from a tiny aggregate replaces the "
    "single-partition sort over |users| rows that the naive cumulative-"
    "share formulation needs, so the shape survives any user count. "
    "Strict > on the threshold keeps the boundary group out of the "
    "heavy set deterministically in both engines.",
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    thresh = per_user.agg(F.expr("percentile(n, 0.9)").alias("p90"))
    heavy = F.when(F.col("n") > F.col("p90"), 1).otherwise(0)
    return (
        per_user.crossJoin(F.broadcast(thresh))
        .groupBy("p90")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n").alias("n_events"),
            F.sum(heavy).alias("n_heavy_users"),
            F.round(
                F.sum(F.when(F.col("n") > F.col("p90"), F.col("n")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("n"),
                6,
            ).alias("heavy_share"),
        )
        .select(
            "n_users",
            "n_events",
            F.round("p90", 6).alias("p90_events"),
            "n_heavy_users",
            "heavy_share",
        )
    )


@query(
    "timeseries_changepoint_meanshift",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), framed AS (
      SELECT event_type, day,
             avg(n)   OVER wl AS left_mean,
             count(*) OVER wl AS left_n,
             avg(n)   OVER wr AS right_mean,
             count(*) OVER wr AS right_n
      FROM daily
      WINDOW wl AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING),
             wr AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)
    )
    SELECT event_type, day,
           round(left_mean, 6)               AS left_mean,
           round(right_mean, 6)              AS right_mean,
           round(right_mean - left_mean, 6)  AS shift
    FROM framed
    WHERE left_n = 7 AND right_n = 7
    ORDER BY abs(right_mean - left_mean) DESC, event_type, day
    LIMIT 20
    """,
    doc="Mean-shift changepoint scan over the per-(type, day) count "
    "series: for every day with a full 7-row history and a full 7-row "
    "future, compare the trailing-week mean against the leading-week "
    "mean and surface the 20 largest level shifts (deterministic "
    "tie-break on type+day). The sliding comparison is two ROWS-frame "
    "window aggregates PARTITIONED BY event_type over the already-"
    "aggregated daily rollup — the raw event table collapses to "
    "|types|x|days| rows in the first hash aggregate, so the window "
    "sort is over a calendar-bounded series per type, never the raw "
    "stream; the final top-20 is TakeOrderedAndProject, not a global "
    "sort. Frame means are sums of integers divided by 7, so the "
    "floats are bit-identical across engines. Row-based neighbors "
    "(observed days), not calendar-gap-aware — the gap-fill operator "
    "is the densifying complement.",
)
def timeseries_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wl = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    wr = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(0, 6)
    )
    framed = daily.select(
        "event_type",
        "day",
        F.avg("n").over(wl).alias("left_mean"),
        F.count(F.lit(1)).over(wl).alias("left_n"),
        F.avg("n").over(wr).alias("right_mean"),
        F.count(F.lit(1)).over(wr).alias("right_n"),
    )
    return (
        framed.filter((F.col("left_n") == 7) & (F.col("right_n") == 7))
        .orderBy(
            F.abs(F.col("right_mean") - F.col("left_mean")).desc(),
            "event_type",
            "day",
        )
        .limit(20)
        .select(
            "event_type",
            "day",
            F.round("left_mean", 6).alias("left_mean"),
            F.round("right_mean", 6).alias("right_mean"),
            F.round(F.col("right_mean") - F.col("left_mean"), 6).alias("shift"),
        )
    )


ACF_MAX_LAG = 7


@query(
    "timeseries_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, avg(n) AS mu FROM daily GROUP BY 1
    ), den AS (
      SELECT d.event_type, sum((d.n - s.mu) * (d.n - s.mu)) AS den
      FROM daily d JOIN stats s USING (event_type)
      GROUP BY 1
    ), num AS (
      SELECT a.event_type, l.lag,
             sum((a.n - s.mu) * (b.n - s.mu)) AS num,
             count(*) AS n_pairs
      FROM daily a
      CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) AS l(lag)
      JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + l.lag
      JOIN stats s ON s.event_type = a.event_type
      GROUP BY 1, 2
    )
    SELECT n.event_type, CAST(n.lag AS INTEGER) AS lag,
           round(n.num / d.den, 6) AS acf,
           CAST(n.n_pairs AS BIGINT) AS n_pairs
    FROM num n JOIN den d USING (event_type)
    WHERE d.den > 0
    """,
    doc=f"Sample autocorrelation function of the per-(type, day) count "
    f"series at calendar lags 1..{ACF_MAX_LAG}: r_k = sum((x_t - mu)"
    "(x_t+k - mu)) / sum((x_t - mu)^2), pairing day t with day t+k by "
    "CALENDAR arithmetic (missing days pair with nothing — documented "
    "convention; the gap-fill operator is the densifying complement). "
    "Spark-first shape: the raw stream collapses to |types|x|days| rows "
    "in the first hash aggregate; the per-type mean and variance "
    "denominator are tiny broadcast aggregates, the lag pairing is one "
    "equi-join of the collapsed series with itself on (type, day+lag) "
    "after a 7-way map-side lag explode. Counts are integers, so mu and "
    "every product are bit-identical across engines; only the final "
    "sum order differs (~1e-13), absorbed by round(..., 6).",
)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    stats = daily.groupBy("event_type").agg(F.avg("n").alias("mu"))
    den = (
        daily.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(F.sum((F.col("n") - F.col("mu")) * (F.col("n") - F.col("mu"))).alias("den"))
    )
    a = (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            "mu",
            F.explode(F.array(*[F.lit(i) for i in range(1, ACF_MAX_LAG + 1)])).alias("lag"),
        )
    )
    b = daily.select(
        F.col("event_type").alias("bt"), F.col("day").alias("bday"), F.col("n").alias("bn")
    )
    num = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bday") == F.date_add(F.col("day"), F.col("lag"))),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.sum((F.col("n") - F.col("mu")) * (F.col("bn") - F.col("mu"))).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .filter(F.col("den") > 0)
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.round(F.col("num") / F.col("den"), 6).alias("acf"),
            F.col("n_pairs").alias("n_pairs"),
        )
    )


@query(
    "events_growth_accounting",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ), maxw AS (
      SELECT max(week) AS mw FROM wk
    ), seq AS (
      SELECT user_id, week,
             lag(week)  OVER w AS prev_week,
             lead(week) OVER w AS next_week,
             min(week)  OVER (PARTITION BY user_id) AS first_week
      FROM wk
      WINDOW w AS (PARTITION BY user_id ORDER BY week)
    ), status AS (
      SELECT week,
             CASE WHEN week = first_week THEN 'new'
                  WHEN prev_week = week - 7 THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM seq
      UNION ALL
      SELECT week + 7 AS week, 'churned'
      FROM seq CROSS JOIN maxw
      WHERE (next_week IS NULL OR next_week > week + 7) AND week + 7 <= mw
    )
    SELECT week,
           CAST(count(*) FILTER (WHERE status = 'new')         AS BIGINT) AS n_new,
           CAST(count(*) FILTER (WHERE status = 'retained')    AS BIGINT) AS n_retained,
           CAST(count(*) FILTER (WHERE status = 'resurrected') AS BIGINT) AS n_resurrected,
           CAST(count(*) FILTER (WHERE status = 'churned')     AS BIGINT) AS n_churned
    FROM status
    GROUP BY week
    """,
    doc="Weekly growth accounting (the standard new / retained / "
    "resurrected / churned user-lifecycle ledger): per-user distinct "
    "active weeks, each classified against the user's previous active "
    "week — first week ever = new, consecutive = retained, gap = "
    "resurrected — plus a churn row in week+1 for every activity week "
    "not followed immediately (clipped at the corpus's last observed "
    "week, which is a 1-row broadcast). The raw stream collapses to "
    "|users|x|weeks| DISTINCT rows first; the lag/lead window partitions "
    "by user_id (high-cardinality), and the final ledger is a "
    "|weeks|-row conditional-count aggregate. Pure integer counts and "
    "calendar arithmetic — no FP anywhere. Both engines truncate weeks "
    "to Monday; the CAST to DATE normalizes Spark's timestamp return.",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    maxw = wk.agg(F.max("week").alias("mw"))
    w = W.partitionBy("user_id").orderBy("week")
    seq = wk.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
        F.min("week").over(W.partitionBy("user_id")).alias("first_week"),
    )
    status = seq.select(
        "week",
        F.when(F.col("week") == F.col("first_week"), F.lit("new"))
        .when(F.col("prev_week") == F.date_sub(F.col("week"), 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("status"),
    ).unionByName(
        seq.crossJoin(F.broadcast(maxw))
        .filter(
            (F.col("next_week").isNull() | (F.col("next_week") > F.date_add(F.col("week"), 7)))
            & (F.date_add(F.col("week"), 7) <= F.col("mw"))
        )
        .select(F.date_add(F.col("week"), 7).alias("week"), F.lit("churned").alias("status"))
    )
    return status.groupBy("week").agg(
        F.count(F.when(F.col("status") == "new", 1)).alias("n_new"),
        F.count(F.when(F.col("status") == "retained", 1)).alias("n_retained"),
        F.count(F.when(F.col("status") == "resurrected", 1)).alias("n_resurrected"),
        F.count(F.when(F.col("status") == "churned", 1)).alias("n_churned"),
    )


PATH_TOP = 20


@query(
    "events_session_path_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS step1, e2 AS step2, e3 AS step3,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT {PATH_TOP}
    """,
    doc=f"Top-{PATH_TOP} three-step behavioral paths (event-type "
    "trigrams over each user's chronological stream — the sequential-"
    "pattern-mining / Sankey-diagram primitive): two lead() columns per "
    "event in ONE window pass partitioned by user_id (high-cardinality, "
    "never a global sort), ordered by (ts, event_id) so concurrent "
    "events cannot flip trigrams across engines; the path space "
    "collapses to at most |types|^3 rows in the counting aggregate and "
    "the final ranking is TakeOrderedAndProject with a full-path "
    "tie-break. Cross-user windows never join — a trigram never spans "
    "two users.",
)
def events_session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .groupBy(
            F.col("event_type").alias("step1"),
            F.col("e2").alias("step2"),
            F.col("e3").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "step1", "step2", "step3")
        .limit(PATH_TOP)
    )


XCORR_MAX_LAG = 3


@query(
    "timeseries_cross_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             a.n AS x, b.n AS y
      FROM daily a
      CROSS JOIN (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) AS l(lag)
      JOIN daily b ON b.event_type > a.event_type AND b.day = a.day + l.lag
    ), s AS (
      SELECT type_a, type_b, lag, CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM lagged GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, CAST(lag AS INTEGER) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS xcorr
    FROM s
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
    doc=f"Lagged cross-correlation between every unordered pair of "
    f"event-type daily-count series at calendar lags -{XCORR_MAX_LAG}.."
    f"+{XCORR_MAX_LAG} — the lead/lag detector (does 'view' traffic "
    "predict 'purchase' traffic two days later?) complementing "
    "timeseries_autocorrelation's self-lags. Pearson r over the "
    "OVERLAP sample: the raw stream collapses to |types|x|days| rows "
    "first, the pairing is one self-equi-join of that rollup on "
    "(day + lag) with a type_a < type_b canonicalization, and each "
    "(pair, lag) cell reduces to a 6-sum closed form — identical IEEE "
    "expressions on both engines, round(..., 6) absorbing summation "
    "order. Degenerate (constant-series) cells are excluded by the "
    "variance guard on BOTH sides.",
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = daily.select(
        F.col("event_type").alias("type_a"),
        F.col("day").alias("day_a"),
        F.col("n").alias("x"),
        F.explode(
            F.array(*[F.lit(i) for i in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1)])
        ).alias("lag"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("n").alias("y"),
    )
    lagged = a.join(
        b,
        (F.col("type_b") > F.col("type_a"))
        & (F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag"))),
    )
    s = lagged.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return (
        s.filter(((n * sxx - sx * sx) > 0) & ((n * syy - sy * sy) > 0))
        .select(
            "type_a",
            "type_b",
            F.col("lag").cast("int").alias("lag"),
            n.cast("bigint").alias("n_pairs"),
            F.round(
                (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("xcorr"),
        )
    )


@query(
    "events_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, CAST(count(*) AS DOUBLE) AS n_days,
             sum(n) AS sx, sum(n * n) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(sx / n_days, 6) AS mean_daily,
           round((sxx / n_days - (sx / n_days) * (sx / n_days))
                 / (sx / n_days), 6) AS fano_factor,
           round((sqrt(sxx / n_days - (sx / n_days) * (sx / n_days)) - sx / n_days)
                 / (sqrt(sxx / n_days - (sx / n_days) * (sx / n_days)) + sx / n_days), 6)
             AS burstiness
    FROM s
    WHERE sx > 0
    """,
    doc="Burstiness profile of each event type's daily-count series: the "
    "Fano factor (population variance / mean — 1.0 for a Poisson "
    "process, >1 over-dispersed/bursty) and the Goh-Barabasi "
    "burstiness index B = (sigma - mu)/(sigma + mu) in [-1, 1] "
    "(-1 periodic, 0 Poisson-like, ->1 extremely bursty). The stream "
    "collapses to |types|x|days| rows in the first hash aggregate and "
    "each type reduces to a 3-sum closed form — population variance "
    "via identical sxx/n - (sx/n)^2 IEEE expressions on both engines, "
    "round(..., 6) absorbing summation order.",
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_days"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    nd, sx, sxx = F.col("n_days"), F.col("sx"), F.col("sxx")
    mean = sx / nd
    var = sxx / nd - mean * mean
    sigma = F.sqrt(var)
    return s.filter(sx > 0).select(
        "event_type",
        nd.cast("bigint").alias("n_days"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var / mean, 6).alias("fano_factor"),
        F.round((sigma - mean) / (sigma + mean), 6).alias("burstiness"),
    )


@query(
    "events_ks_drift",
    oracle="""
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1 FROM events
    ), ev AS (
      SELECT value AS v,
             CASE WHEN epoch_us(ts) < (b.t0 + b.t1) // 2
                  THEN 1 ELSE 0 END AS early
      FROM events CROSS JOIN bounds b
    ), g AS (
      SELECT v,
             sum(early) AS ne,
             count(*) - sum(early) AS nl
      FROM ev GROUP BY v
    ), tot AS (
      SELECT CAST(sum(ne) AS DOUBLE) AS te, CAST(sum(nl) AS DOUBLE) AS tl FROM g
    ), cum AS (
      SELECT v,
             CAST(sum(ne) OVER w AS DOUBLE) / t.te AS ce,
             CAST(sum(nl) OVER w AS DOUBLE) / t.tl AS cl
      FROM g CROSS JOIN tot t
      WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
    ), d AS (
      SELECT v, abs(ce - cl) AS dd,
             row_number() OVER (ORDER BY abs(ce - cl) DESC, v) AS rk
      FROM cum
    )
    SELECT CAST(t.te AS BIGINT) AS n_early, CAST(t.tl AS BIGINT) AS n_late,
           round(d.dd, 6) AS ks_d, d.v AS ks_at_value
    FROM d CROSS JOIN tot t WHERE d.rk = 1
    """,
    doc="Two-sample Kolmogorov-Smirnov drift test between the event-value "
    "distributions of the first and second halves of the time range — "
    "the classic training-data distribution-drift monitor. The split "
    "point is integer epoch-microsecond arithmetic on a 1-row broadcast "
    "(identical classification on both engines); the corpus collapses "
    "to per-distinct-value counts (values are exact cents, so the grid "
    "is DOMAIN-bounded, not row-bounded); both ECDFs are one cumulative "
    "window over that aggregated grid and D = max |ECDF_early - "
    "ECDF_late| is exact: integer cumulative sums divided by integer "
    "totals are bit-identical IEEE operations, so the argmax (value "
    "tie-break) cannot flip across engines — round(..., 6) is cosmetic.",
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.unix_micros("ts")).alias("t0"), F.max(F.unix_micros("ts")).alias("t1")
    )
    ev = e.crossJoin(F.broadcast(bounds)).select(
        F.col("value").alias("v"),
        F.when(
            F.unix_micros("ts") < F.floor((F.col("t0") + F.col("t1")) / 2), 1
        )
        .otherwise(0)
        .alias("early"),
    )
    g = ev.groupBy("v").agg(
        F.sum("early").alias("ne"),
        (F.count(F.lit(1)) - F.sum("early")).alias("nl"),
    )
    tot = g.agg(
        F.sum("ne").cast("double").alias("te"), F.sum("nl").cast("double").alias("tl")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = g.crossJoin(F.broadcast(tot)).select(
        "v",
        "te",
        "tl",
        (F.sum("ne").over(w).cast("double") / F.col("te")).alias("ce"),
        (F.sum("nl").over(w).cast("double") / F.col("tl")).alias("cl"),
    )
    rk = W.orderBy(F.abs(F.col("ce") - F.col("cl")).desc(), "v")
    return (
        cum.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            F.col("te").cast("bigint").alias("n_early"),
            F.col("tl").cast("bigint").alias("n_late"),
            F.round(F.abs(F.col("ce") - F.col("cl")), 6).alias("ks_d"),
            F.col("v").alias("ks_at_value"),
        )
    )


@query(
    "events_ab_test_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS cohort,
             CASE WHEN coalesce(max(CASE WHEN event_type = 'purchase'
                                         THEN value END), 0) > 250
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1, 2
    ), c AS (
      SELECT cohort, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(converted) AS DOUBLE) AS k
      FROM assign GROUP BY 1
    ), w AS (
      SELECT max(CASE WHEN cohort = 0 THEN n END) AS n_a,
             max(CASE WHEN cohort = 0 THEN k END) AS k_a,
             max(CASE WHEN cohort = 1 THEN n END) AS n_b,
             max(CASE WHEN cohort = 1 THEN k END) AS k_b
      FROM c
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(k_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(k_b AS BIGINT) AS conv_b,
           round(k_a / n_a, 6) AS rate_a,
           round(k_b / n_b, 6) AS rate_b,
           round(CASE WHEN (k_a + k_b) / (n_a + n_b) <= 0
                        OR (k_a + k_b) / (n_a + n_b) >= 1 THEN 0
                 ELSE (k_a / n_a - k_b / n_b)
                      / sqrt(((k_a + k_b) / (n_a + n_b))
                             * (1 - (k_a + k_b) / (n_a + n_b))
                             * (1 / n_a + 1 / n_b)) END, 6) AS z_score
    FROM w
    """,
    doc="Two-proportion z-test between deterministic user cohorts "
    "(user_id parity — the hash-split every A/B framework uses): "
    "per-cohort conversion = share of users whose largest purchase "
    "exceeds 250, pooled-variance z = (p_a - p_b) / "
    "sqrt(p(1-p)(1/n_a + 1/n_b)) — the experimentation primitive on "
    "top of the funnel operators. The stream collapses to one row per "
    "user in the first aggregate (max-value conversion flag, map-side "
    "combinable), cohorts reduce to a 2-row aggregate pivoted onto one "
    "row, and the statistic is a closed form over four integers — "
    "bit-identical across engines before the cosmetic round. The "
    "degenerate all-convert / none-convert pool (zero pooled "
    "variance) pins z to 0 on BOTH sides rather than dividing by "
    "zero under ANSI mode.",
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    assign = e.groupBy(
        "user_id", (F.col("user_id") % 2).alias("cohort")
    ).agg(
        F.when(
            F.coalesce(
                F.max(F.when(F.col("event_type") == "purchase", F.col("value"))),
                F.lit(0.0),
            )
            > 250,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    c = assign.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("converted").cast("double").alias("k"),
    )
    w = c.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("cohort") == 0, F.col("k"))).alias("k_a"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("cohort") == 1, F.col("k"))).alias("k_b"),
    )
    na, ka, nb, kb = F.col("n_a"), F.col("k_a"), F.col("n_b"), F.col("k_b")
    p = (ka + kb) / (na + nb)
    return w.select(
        na.cast("bigint").alias("n_a"),
        ka.cast("bigint").alias("conv_a"),
        nb.cast("bigint").alias("n_b"),
        kb.cast("bigint").alias("conv_b"),
        F.round(ka / na, 6).alias("rate_a"),
        F.round(kb / nb, 6).alias("rate_b"),
        F.round(
            F.when((p <= 0) | (p >= 1), F.lit(0.0)).otherwise(
                (ka / na - kb / nb)
                / F.sqrt(p * (1 - p) * (F.lit(1) / na + F.lit(1) / nb))
            ),
            6,
        ).alias("z_score"),
    )


PERIODOGRAM_PERIODS = (2, 3, 4, 5, 6, 7, 8, 9, 10)
_TWO_PI = 6.283185307179586


@query(
    "timeseries_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT d.event_type, d.n,
             CAST(d.day - m.d0 AS DOUBLE) AS t
      FROM daily d
      JOIN (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1) m
        USING (event_type)
    ), terms AS (
      SELECT i.event_type, p.period,
             sum(i.n * cos({_TWO_PI} * i.t / p.period)) AS sc,
             sum(i.n * sin({_TWO_PI} * i.t / p.period)) AS ss,
             sum(i.n) AS tot,
             count(*) AS n_days
      FROM idx i
      CROSS JOIN (VALUES {", ".join(f"({p})" for p in PERIODOGRAM_PERIODS)})
        AS p(period)
      GROUP BY 1, 2
    )
    SELECT event_type, CAST(period AS INTEGER) AS period,
           CAST(n_days AS BIGINT) AS n_days,
           round((sc * sc + ss * ss) / (tot * tot), 6) AS norm_power
    FROM terms
    WHERE tot > 0
    """,
    doc=f"Discrete-Fourier periodogram of each event type's daily-count "
    f"series at candidate periods {PERIODOGRAM_PERIODS[0]}.."
    f"{PERIODOGRAM_PERIODS[-1]} days — the spectral seasonality "
    "detector (a spike at period 7 = weekly rhythm) complementing the "
    "calendar-bucketed seasonality index. Power at period T is "
    "(sum n_t cos(2*pi*t/T))^2 + (sum n_t sin(2*pi*t/T))^2 normalized "
    "by the squared total so the statistic is O(1) and round(..., 6) "
    "absorbs both summation order and the <=1-ulp cross-engine trig "
    "differences (the same tolerance regime fn_trig_battery pins). "
    "t is the CALENDAR day index from each type's first day — integer "
    "date subtraction, identical on both engines. The raw stream "
    "collapses to |types|x|days| rows first; each (type, period) cell "
    "is one map-side-combinable 2-sum aggregate after a 9-way literal "
    "period explode. 2*pi appears as the same 17-digit literal in both "
    "engines.",
)
def timeseries_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    idx = daily.join(F.broadcast(d0), "event_type").select(
        "event_type",
        "n",
        F.datediff(F.col("day"), F.col("d0")).cast("double").alias("t"),
        F.explode(
            F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS])
        ).alias("period"),
    )
    ang = F.lit(_TWO_PI) * F.col("t") / F.col("period")
    terms = idx.groupBy("event_type", "period").agg(
        F.sum(F.col("n") * F.cos(ang)).alias("sc"),
        F.sum(F.col("n") * F.sin(ang)).alias("ss"),
        F.sum("n").alias("tot"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return terms.filter(F.col("tot") > 0).select(
        "event_type",
        F.col("period").cast("int").alias("period"),
        F.col("n_days").alias("n_days"),
        F.round(
            (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
            / (F.col("tot") * F.col("tot")),
            6,
        ).alias("norm_power"),
    )


HOLT_WINDOW = 8  # newest samples fed to the double-exponential recursion
_HOLT_ALPHA = 0.5  # exactly representable: every Holt step stays dyadic
_HOLT_BETA = 0.5


def _holt_oracle() -> str:
    pivot_cols = ", ".join(
        f"max(CASE WHEN rn = {HOLT_WINDOW + 1 - k} THEN n END) AS x{k}"
        for k in range(1, HOLT_WINDOW + 1)
    )
    parts = [
        f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT event_type, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day DESC) AS rn
      FROM daily
    ), px AS (
      SELECT event_type, {pivot_cols}
      FROM ranked WHERE rn <= {HOLT_WINDOW}
      GROUP BY event_type
      HAVING count(*) = {HOLT_WINDOW}
    ), h1 AS (
      SELECT *, x1 AS s1, x2 - x1 AS b1 FROM px
    )"""
    ]
    for t in range(2, HOLT_WINDOW + 1):
        parts.append(
            f""", h{t} AS (
      SELECT *,
             {_HOLT_ALPHA} * x{t} + {1 - _HOLT_ALPHA} * (s{t - 1} + b{t - 1}) AS s{t},
             {_HOLT_BETA} * ({_HOLT_ALPHA} * x{t}
                             + {1 - _HOLT_ALPHA} * (s{t - 1} + b{t - 1}) - s{t - 1})
               + {1 - _HOLT_BETA} * b{t - 1} AS b{t}
      FROM h{t - 1}
    )"""
        )
    last = HOLT_WINDOW
    parts.append(
        f"""
    SELECT event_type,
           round(s{last}, 6) AS level,
           round(b{last}, 6) AS trend,
           round(s{last} + b{last}, 6) AS forecast_next
    FROM h{last}
    """
    )
    return "".join(parts)


@query(
    "timeseries_holt_linear",
    oracle=_holt_oracle(),
    doc=f"Holt's linear-trend double exponential smoothing over each "
    f"event type's {HOLT_WINDOW} newest daily counts (alpha = beta = "
    f"{_HOLT_ALPHA}): level_t = a*x_t + (1-a)*(level+trend), trend_t = "
    "b*(level_t - level) + (1-b)*trend, initialized s1 = x1, b1 = x2 - "
    "x1, emitting the final level/trend and the one-step forecast — "
    "the trend-aware upgrade of timeseries_ewma_smooth (which cannot "
    "follow a ramp). The recursion is unrolled at plan-build time over "
    "a per-type pivot of the newest samples, so the whole operator is "
    "one partitioned window rank + one pivot aggregate — bounded rows "
    "per type by construction, no iteration at runtime. With "
    "exactly-representable 0.5 coefficients every intermediate is a "
    "dyadic rational: the recursion is BIT-exact across engines "
    "(rounds are cosmetic); types with fewer than "
    f"{HOLT_WINDOW} observed days are excluded on both sides.",
)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = W.partitionBy("event_type").orderBy(F.desc("day"))
    ranked = daily.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= HOLT_WINDOW
    )
    px = (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            *[
                F.max(
                    F.when(F.col("rn") == HOLT_WINDOW + 1 - k, F.col("n"))
                ).alias(f"x{k}")
                for k in range(1, HOLT_WINDOW + 1)
            ],
        )
        .filter(F.col("n_obs") == HOLT_WINDOW)
    )
    df = px.withColumn("s1", F.col("x1")).withColumn(
        "b1", F.col("x2") - F.col("x1")
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA
    for t in range(2, HOLT_WINDOW + 1):
        s_new = F.lit(a) * F.col(f"x{t}") + F.lit(1 - a) * (
            F.col(f"s{t - 1}") + F.col(f"b{t - 1}")
        )
        df = df.withColumn(f"s{t}", s_new)
        df = df.withColumn(
            f"b{t}",
            F.lit(b) * (F.col(f"s{t}") - F.col(f"s{t - 1}"))
            + F.lit(1 - b) * F.col(f"b{t - 1}"),
        )
    last = HOLT_WINDOW
    return df.select(
        "event_type",
        F.round(F.col(f"s{last}"), 6).alias("level"),
        F.round(F.col(f"b{last}"), 6).alias("trend"),
        F.round(F.col(f"s{last}") + F.col(f"b{last}"), 6).alias("forecast_next"),
    )
