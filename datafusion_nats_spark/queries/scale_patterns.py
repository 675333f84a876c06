"""Scale-technique operators: the patterns that keep plans alive at
100 TB — skew salting, two-phase aggregation, bucketed co-location.

These produce the same answers as their naive forms (oracle-checked);
what changes is the shuffle shape. At local test scale the effect is
invisible; at cluster scale they are the difference between a straggler
task holding 1000 executors hostage and an even spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

N_SALTS = 16


@query(
    "skew_salted_aggregation",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS total,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / count(*) / 100.0, 6) AS mean
    FROM events
    GROUP BY event_type
    """,
    doc="Two-phase salted aggregation over a 5-hot-key distribution: "
    "phase 1 groups by (key, salt) — 16-way spread of each hot key — "
    "phase 2 merges partials per key. Same answer as the naive groupBy "
    "(the oracle), but no single reducer ever owns a whole hot key. "
    "avg is recomposed from (sum, count), never averaged-of-averages; "
    "value is exact cents, so the partials are int64 cent sums — the "
    "salted recomposition is bit-identical to the naive plan no matter "
    "how the salt spreads the rows (FP playbook).",
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    salted = ev.withColumn("salt", (F.col("event_id") % N_SALTS).cast("int"))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("psum_c"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("psum_c").cast("double") / F.lit(100.0), 2).alias("total"),
            F.round(
                F.sum("psum_c").cast("double") / F.sum("pn") / F.lit(100.0), 6
            ).alias("mean"),
        )
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT e.event_type, count(*) AS n_events, round(sum(t.weight), 2) AS total_weight
    FROM events e
    JOIN (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0),
                 ('signup', 5.0), ('error', 0.0)) AS t(event_type, weight)
      ON e.event_type = t.event_type
    GROUP BY e.event_type
    """,
    doc="Skew-safe join against a hot-key dimension: the 5-row dim is "
    "exploded 16× with salt ids and the fact side joins on "
    "(key, fact_salt) — every hot key's rows spread over 16 reducers. "
    "(With a dim this small broadcast is the real answer — the salt "
    "machinery is exercised so the pattern is tested end-to-end.)",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "fact_salt", (F.col("event_id") % N_SALTS).cast("int")
    )
    weights = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        "w_type string, weight double",
    )
    # replicate the dim once per salt value
    salted_dim = weights.crossJoin(
        spark.range(N_SALTS).select(F.col("id").cast("int").alias("dim_salt"))
    )
    joined = ev.join(
        salted_dim,
        (F.col("event_type") == F.col("w_type")) & (F.col("fact_salt") == F.col("dim_salt")),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("weight"), 2).alias("total_weight"),
    )


@query(
    "histogram_value_buckets",
    oracle="""
    WITH b AS (
      SELECT CAST(least(floor(value / 10), 9) AS INTEGER) AS bucket
      FROM events WHERE value >= 0
    )
    SELECT bucket,
           count(*) AS n,
           round(count(*) * 100.0 / (SELECT count(*) FROM b), 6) AS pct
    FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Fixed-width histogram (10 buckets over [0,100)) with percentage "
    "shares — single scan, one aggregation, broadcast scalar total.",
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value") >= 0)
    b = ev.select(
        F.least(F.floor(F.col("value") / 10), F.lit(9)).cast("int").alias("bucket")
    )
    total = b.agg(F.count(F.lit(1)).alias("tot"))
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n",
            F.round(F.col("n") * 100.0 / F.col("tot"), 6).alias("pct"),
        )
        .orderBy("bucket")
    )


RANGE_BUCKET_SECONDS = 600


@query(
    "join_range_bucketed",
    oracle="""
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    GROUP BY a.user_id
    """,
    doc="Range self-join (pairs of same-user events within 10 minutes) "
    "rewritten as an EQUI-join: each left row replicates into its own "
    "10-minute bucket and the next (explode of 2 bucket ids), the join "
    "runs on (user_id, bucket) through the hash-join machinery, and the "
    "exact range predicate filters the candidates. A naive theta join "
    "is a per-key nested loop (O(n²) in the hot key); the bucketed form "
    "shuffles once and touches only adjacent-bucket candidates — the "
    "standard interval-join strategy (Flink interval join / "
    "point-in-range bucketing). Oracle: the direct theta join.",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    bkt = F.floor(F.unix_timestamp("ts") / RANGE_BUCKET_SECONDS)
    left = ev.select(
        "user_id",
        F.col("ts").alias("a_ts"),
        F.explode(F.array(bkt, bkt + 1)).alias("bkt"),
    )
    right = ev.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("b_ts"),
        bkt.alias("bkt"),
    )
    pairs = left.join(
        right, (left.user_id == right.r_user) & (left.bkt == right.bkt)
    ).filter(
        (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


# Interval-overlap bucketing: 300 s buckets; durations come from the
# events.value column (≤ ~328 s) so an interval spans 1–3 buckets —
# VARIABLE replication, unlike join_range_bucketed's fixed 2 buckets.
OVERLAP_BUCKET_US = 300 * 1_000_000


@query(
    "join_interval_overlap_bucketed",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000 AS e
      FROM events
    )
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_pairs
    FROM iv a JOIN iv b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id
    """,
    doc="Interval-OVERLAP self-join (same-user event intervals "
    "[ts, ts + floor(value) seconds] that intersect) as an EQUI-join: "
    "each interval explodes to the sequence of 300 s buckets it spans "
    "(variable 1-3 per row here — the replication factor is the "
    "interval length, bounded by construction), the join runs on "
    "(user_id, bucket), the exact predicate filters candidates, and a "
    "DISTINCT collapses pairs that share several buckets — the dedup "
    "step point-bucketing (join_range_bucketed) does not need. Any "
    "overlapping pair shares the bucket containing the intersection, "
    "so coverage is exact; all arithmetic is integer epoch-micros. "
    "Oracle: the direct theta join.",
)
def join_interval_overlap_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    s = F.unix_micros(F.col("ts"))
    e = s + (F.floor("value").cast("long") * F.lit(1_000_000))
    iv = ev.select("user_id", "event_id", s.alias("s"), e.alias("e"))
    bs = F.floor(F.col("s") / OVERLAP_BUCKET_US).cast("long")
    be = F.floor(F.col("e") / OVERLAP_BUCKET_US).cast("long")
    left = iv.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
        F.explode(F.sequence(bs, be)).alias("bkt"),
    )
    right = iv.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("b_id"),
        F.col("s").alias("b_s"),
        F.col("e").alias("b_e"),
        F.explode(F.sequence(bs, be)).alias("bkt"),
    )
    pairs = (
        left.join(right, (left.user_id == right.r_user) & (left.bkt == right.bkt))
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
        )
        .select("user_id", "a_id", "b_id")
        .distinct()  # a pair can share up to 3 buckets
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


# DIY Bloom prefilter: 2^15 bit positions packed as 1024 x 32-bit words
# (32-bit so the DuckDB oracle's signed BIGINT << never reaches the sign bit).
_BLOOM_BITS = 1 << 15


@query(
    "join_bloom_prefilter",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ), bloom AS (
      SELECT (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
              % {_BLOOM_BITS}) // 32 AS word_ix,
             bit_or(1::BIGINT << (
               (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                % {_BLOOM_BITS}) % 32)) AS mask
      FROM dim GROUP BY 1
    ), pre AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      FROM orders o
      JOIN bloom b
        ON (('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT
            % {_BLOOM_BITS}) // 32 = b.word_ix
       AND ((b.mask >> ((('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT
            % {_BLOOM_BITS}) % 32)) & 1) = 1
    )
    SELECT d.c_mktsegment,
           CAST(count(*) AS BIGINT)          AS n_orders,
           CAST(round(sum(CAST(p.o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE)                   AS revenue
    FROM pre p JOIN dim d ON p.o_custkey = d.c_custkey
    GROUP BY d.c_mktsegment
    """,
    doc="Bloom-filter semi-join reduction built from relational primitives "
    "(bloom_filter_agg is not in Spark's public registry): the dim side's "
    "keys are hashed into a 2^15-bit filter packed as <=1024 (word, bit_or "
    "mask) rows, broadcast, and the fact table is PREfiltered by a bit "
    "test before the exact equi-join — false positives are removed by the "
    "join itself, so the result is exactly the plain join (the oracle). "
    "At 100 TB this is the classic shuffle reducer: the fact side that "
    "reaches the join shuffle shrinks to ~|matching| rows while the "
    "filter itself stays a few KB regardless of fact size. The md5-"
    "derived hash makes the filter contents engine-portable so DuckDB "
    "replays the identical prefilter.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")

    def bitpos(key):
        h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        ) % _BLOOM_BITS
        return (h / 32).cast("bigint").alias("word_ix"), (h % 32).alias("bit_ix")

    d_word, d_bit = bitpos(F.col("c_custkey"))
    bloom = (
        c.select(d_word, d_bit)
        .groupBy("word_ix")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit_ix AS INT)))").alias(
                "mask"
            )
        )
    )
    o_word, o_bit = bitpos(F.col("o_custkey"))
    pre = (
        o.select("o_orderkey", "o_custkey", "o_totalprice", o_word, o_bit)
        .join(F.broadcast(bloom), "word_ix")
        .filter(F.expr("(shiftrightunsigned(mask, CAST(bit_ix AS INT)) & 1) = 1"))
    )
    return (
        pre.join(c.select("c_custkey", "c_mktsegment"), pre.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # exact decimal money sum (same idiom as q11): source prices are
            # 2-decimal, so the sum is engine-exact — no FP half-cent flips
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "report_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS key, count(*) AS n
      FROM orders GROUP BY o_custkey
    ), stats AS (
      SELECT count(*) AS n_keys,
             sum(n) AS n_rows,
             max(n) AS max_n,
             round(avg(n), 6) AS mean_n,
             round(quantile_cont(n, 0.5), 6)  AS p50_n,
             round(quantile_cont(n, 0.99), 6) AS p99_n
      FROM per_key
    ), top AS (
      SELECT key, n,
             row_number() OVER (ORDER BY n DESC, key) AS rk
      FROM per_key
    )
    SELECT t.rk, t.key, CAST(t.n AS BIGINT) AS n,
           CAST(s.n_keys AS BIGINT) AS n_keys,
           round(CAST(t.n AS DOUBLE) / s.n_rows, 6)  AS row_share,
           round(CAST(s.max_n AS DOUBLE) / s.mean_n, 6) AS imbalance,
           s.p50_n, s.p99_n
    FROM top t, stats s
    WHERE t.rk <= 10
    """,
    doc="Shuffle-key skew profiler (operational tooling for the "
    "1000-executor cluster): per-key row counts for a prospective "
    "join/groupBy key, the top-10 heaviest keys with their row share, "
    "and distribution stats (p50/p99, max/mean imbalance ratio — the "
    "straggler predictor: a reducer owning max_n rows finishes "
    "imbalance x later than the average). Run this BEFORE choosing a "
    "partitioning; imbalance >> 1 says salt the key or broadcast the "
    "other side. One partial/final count per key + a 1-row stats "
    "aggregate broadcast against the bounded top-10.",
)
def report_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.round(F.avg("n"), 6).alias("mean_n"),
        F.round(F.expr("percentile(n, 0.5)"), 6).alias("p50_n"),
        F.round(F.expr("percentile(n, 0.99)"), 6).alias("p99_n"),
    )
    # TakeOrderedAndProject bounds the global sort to a top-10 heap per
    # partition + driver merge; the ranking window then runs over 10 rows
    # only (a global row_number over the full key set would be a
    # single-partition sort of n_keys rows — the thing this report exists
    # to prevent)
    top10 = per_key.orderBy(F.desc("n"), "key").limit(10)
    top = top10.select(
        "key", "n", F.row_number().over(W.orderBy(F.desc("n"), "key")).alias("rk")
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "rk",
        "key",
        "n",
        "n_keys",
        F.round(F.col("n").cast("double") / F.col("n_rows"), 6).alias("row_share"),
        F.round(F.col("max_n").cast("double") / F.col("mean_n"), 6).alias("imbalance"),
        "p50_n",
        "p99_n",
    )


@query(
    "join_skew_salted_shuffle",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE)          AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-resilient SHUFFLE join on the key report_key_skew profiles "
    "(orders.o_custkey): the fact side salts with pmod(o_orderkey, 16), "
    "the dim side replicates 16x over the salt ids, and a shuffle_hash "
    "hint pins the shuffled strategy so the demonstrated partitioning is "
    "visible in the plan — both shuffles hash on (custkey, salt), so a "
    "hot customer's rows spread over 16 reducers instead of one straggler "
    "partition. Identical answer to the plain join (the oracle); the "
    "100-TB recipe for a skewed fact key when the dim is too large to "
    "broadcast (replication cost = 16x the dim, spread evenly). "
    "Plan-pinned by test_salted_join_partitions_on_salt.",
)
def join_skew_salted_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        F.pmod(F.col("o_orderkey"), F.lit(N_SALTS)).cast("int").alias("fact_salt"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted_dim = c.crossJoin(
        spark.range(N_SALTS).select(F.col("id").cast("int").alias("dim_salt"))
    ).hint("shuffle_hash")
    joined = o.join(
        salted_dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("fact_salt") == F.col("dim_salt")),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue"),
    )


def segmented_ntile(
    df: DataFrame,
    bucket_expr,
    order_cols: list,
    out_name: str,
    n_tiles: int = 4,
) -> DataFrame:
    """EXACT ``ntile(n)`` over a total order without a single-partition
    global sort — the segmented-rank pattern.

    ``bucket_expr`` must be a coarsening of the sort order (bucket(a) <
    bucket(b) implies a sorts before b); rows then rank with a PARTITIONED
    ``row_number`` within their bucket, the cumulative count of all prior
    buckets (a tiny per-bucket aggregate) broadcasts back as the carry-in,
    and the global rank ``carry + row_number`` feeds the closed-form ntile
    bucket formula: the first ``N % n`` tiles hold ``N div n + 1`` rows,
    the rest ``N div n``. Identical output to ``ntile(n) OVER (ORDER BY
    ...)`` (integer ``div`` arithmetic end-to-end), but NO stage ever
    funnels the relation through one partition: the carry-in prefix is a
    broadcast theta-join over the per-bucket counts (O(|buckets|^2)
    comparisons on a relation that is bounded by construction — choose a
    bucket granularity with at most a few thousand distinct values).
    """
    from pyspark.sql import Window as W

    d = df.withColumn("_bkt", bucket_expr)
    counts = d.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_bn"))
    carry = (
        counts.join(
            F.broadcast(
                counts.select(
                    F.col("_bkt").alias("_pb"), F.col("_bn").alias("_pn")
                )
            ),
            F.col("_pb") < F.col("_bkt"),
            "left",
        )
        .groupBy("_bkt")
        .agg(F.coalesce(F.sum("_pn"), F.lit(0)).alias("_carry"))
    )
    total = counts.agg(F.sum("_bn").alias("_N"))
    rn = F.row_number().over(W.partitionBy("_bkt").orderBy(*order_cols))
    n = n_tiles
    return (
        d.join(F.broadcast(carry), "_bkt")
        .crossJoin(F.broadcast(total))
        .withColumn("_r", F.col("_carry") + rn)
        .withColumn(
            out_name,
            F.expr(
                f"CAST(CASE WHEN _r <= (_N % {n}) * ((_N div {n}) + 1) "
                f"THEN (_r - 1) div ((_N div {n}) + 1) + 1 "
                f"ELSE (_N % {n}) + (_r - (_N % {n}) * ((_N div {n}) + 1) - 1) "
                f"div (_N div {n}) + 1 END AS INT)"
            ),
        )
        .drop("_bkt", "_carry", "_N", "_r")
    )


BOOTSTRAP_B = 32

# Cumulative Poisson(1) CDF thresholds for the inverse-CDF draw; the
# SAME literals appear in the oracle so the weight of every (row,
# replicate) pair is decided by an identical IEEE comparison.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _pois_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
    )
    return f"CASE{branches} ELSE {len(_POIS1_CDF)} END"


@query(
    "agg_bootstrap_ci_mean",
    oracle=f"""
    WITH rep AS (
      SELECT o_totalprice AS x, b.b,
             ('0x' || substr(md5(o_orderkey || ':' || b.b), 1, 6))::BIGINT
               / 16777216.0 AS u
      FROM orders CROSS JOIN (
        SELECT unnest(range({BOOTSTRAP_B})) AS b
      ) b
    ), weighted AS (
      SELECT b, {_pois_case_sql('u')} AS w, x FROM rep
    ), means AS (
      SELECT b, sum(w * x) / sum(w) AS m
      FROM weighted GROUP BY b HAVING sum(w) > 0
    ), ranked AS (
      SELECT m,
             row_number() OVER (ORDER BY m, b) AS lo_rk,
             row_number() OVER (ORDER BY m DESC, b DESC) AS hi_rk
      FROM means
    ), full_mean AS (
      SELECT sum(o_totalprice) / count(*) AS fm FROM orders
    )
    SELECT CAST({BOOTSTRAP_B} AS INTEGER) AS b_replicates,
           round((SELECT fm FROM full_mean), 6) AS mean_full,
           round((SELECT m FROM ranked WHERE lo_rk = 2), 6) AS ci_lo,
           round((SELECT m FROM ranked WHERE hi_rk = 2), 6) AS ci_hi
    """,
    doc=f"Poisson-bootstrap confidence interval for the mean order value "
    f"— the scale pattern for uncertainty estimates over data too big "
    f"to resample by shuffling: each of {BOOTSTRAP_B} replicates weights "
    "every row by an independent Poisson(1) draw (the classic "
    "big-data bootstrap approximation of multinomial resampling), so "
    "the whole procedure is ONE map-side explode + a "
    f"{BOOTSTRAP_B}-group aggregate with map-side combine — no "
    "sampling shuffle, no driver loop. Draws are deterministic: a "
    "24-bit md5 uniform per (order, replicate) pushed through the "
    "inverse Poisson CDF with literal thresholds identical in both "
    "engines, so every weight matches bit-for-bit. The CI is the "
    "2nd-smallest / 2nd-largest replicate mean (exact order "
    "statistics with replicate tie-breaks — never an interpolating "
    "percentile, whose conventions differ across engines).",
)
def agg_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rep = o.select(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey"),
        F.explode(F.array(*[F.lit(b) for b in range(BOOTSTRAP_B)])).alias("b"),
    ).select(
        "x",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":"), F.col("b").cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("bigint")
            / F.lit(16777216.0)
        ).alias("u"),
    )
    w_expr = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w_expr = F.when(F.col("u") < F.lit(_POIS1_CDF[k]), k).otherwise(w_expr)
    weighted = rep.select("b", w_expr.alias("w"), "x")
    means = (
        weighted.groupBy("b")
        .agg(F.sum(F.col("w") * F.col("x")).alias("swx"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select("b", (F.col("swx") / F.col("sw")).alias("m"))
    )
    lo = W.orderBy("m", "b")
    hi = W.orderBy(F.desc("m"), F.desc("b"))
    ranked = means.select(
        "m",
        F.row_number().over(lo).alias("lo_rk"),
        F.row_number().over(hi).alias("hi_rk"),
    )
    full_mean = o.agg(
        (F.sum("o_totalprice") / F.count(F.lit(1))).alias("fm")
    )
    ci_lo = ranked.filter(F.col("lo_rk") == 2).select(F.col("m").alias("ci_lo"))
    ci_hi = ranked.filter(F.col("hi_rk") == 2).select(F.col("m").alias("ci_hi"))
    return (
        full_mean.crossJoin(F.broadcast(ci_lo))
        .crossJoin(F.broadcast(ci_hi))
        .select(
            F.lit(BOOTSTRAP_B).cast("int").alias("b_replicates"),
            F.round("fm", 6).alias("mean_full"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
        )
    )
