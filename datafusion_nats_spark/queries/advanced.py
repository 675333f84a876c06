"""Advanced relational patterns beyond the reference's surface:
as-of joins, map/struct construction, unnest/explode, unpivot,
string-distance joins, recursive CTEs.

The reference inherits none of these from DataFusion 48 core (no ASOF
JOIN there — SURVEY §2B "Joins — range/as-of"); they're standard needs of
a streaming/analytics engine, each expressed as a composition of Spark
built-ins that survives scale (window-based as-of instead of O(n²)
inequality joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.queries.scale_patterns import segmented_ntile
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, register_views


@query(
    "asof_join_last_purchase",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           p.ts AS last_purchase_ts,
           round(p.value, 2) AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="As-of join: each non-purchase event picks the latest purchase by "
    "the same user at-or-before its timestamp. Implemented as a union + "
    "last-non-null window (single shuffle on user_id, ordered scan) — "
    "never an inequality join; oracle is DuckDB's native ASOF JOIN.",
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
        F.lit(1).alias("is_purchase"),
    )
    others = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("e_ts"),
        F.col("event_id"),
        F.lit(0).alias("is_purchase"),
    )
    # interleave both row kinds on (user, time); purchases sort first on
    # ties so an event at exactly a purchase ts sees that purchase
    merged = purchases.select(
        "user_id",
        F.col("p_ts").alias("ts"),
        F.lit(None).cast("long").alias("event_id"),
        "p_ts",
        "p_value",
        "is_purchase",
    ).unionByName(
        others.select(
            "user_id",
            F.col("e_ts").alias("ts"),
            "event_id",
            F.lit(None).cast("timestamp").alias("p_ts"),
            F.lit(None).cast("double").alias("p_value"),
            "is_purchase",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.desc("is_purchase"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("last_purchase_ts", F.last("p_ts", ignorenulls=True).over(w))
        .withColumn(
            "last_purchase_value",
            F.round(F.last("p_value", ignorenulls=True).over(w), 2),
        )
        .filter(F.col("is_purchase") == 0)
        .select("event_id", "user_id", F.col("ts"), "last_purchase_ts", "last_purchase_value")
    )


@query(
    "map_struct_functions",
    oracle="""
    SELECT
      n_nationkey,
      ({'name': n_name, 'region': n_regionkey}).name   AS info_name,
      ({'name': n_name, 'region': n_regionkey}).region AS info_region,
      array_to_string(CAST(map_keys(map {'nation': n_name, 'key2': 'x'}) AS VARCHAR[]), ',') AS mkeys,
      map_values(map {'a': n_regionkey, 'b': n_nationkey})[1] AS first_val,
      list_contains(map_keys(map {'a': n_regionkey}), 'a') AS has_a
    FROM nation
    """,
    doc="Struct + map construction, field access, map_keys/map_values "
    "(results projected to scalars — map/struct cells hash differently "
    "across engines).",
)
def map_struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    info = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    m = F.create_map(F.lit("a"), F.col("n_regionkey"), F.lit("b"), F.col("n_nationkey"))
    return n.select(
        "n_nationkey",
        info.getField("name").alias("info_name"),
        info.getField("region").alias("info_region"),
        F.array_join(
            F.map_keys(F.create_map(F.lit("nation"), F.col("n_name"), F.lit("key2"), F.lit("x"))),
            ",",
        ).alias("mkeys"),
        F.element_at(F.map_values(m), 1).alias("first_val"),
        F.map_contains_key(F.create_map(F.lit("a"), F.col("n_regionkey")), "a").alias("has_a"),
    )


@query(
    "explode_unnest",
    oracle="""
    SELECT doc_id,
           CAST(u[2] AS BIGINT) - 1 AS pos,
           CAST(u[1] AS VARCHAR)    AS token
    FROM (
      SELECT doc_id,
             unnest(list_zip(toks, range(1, len(toks) + 1))) AS u
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents WHERE doc_id < 20)
    )
    """,
    doc="posexplode/unnest-with-ordinality of a tokenized column.",
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select("doc_id", F.posexplode(toks).alias("pos", "token")).select(
        "doc_id", F.col("pos").cast("bigint").alias("pos"), "token"
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    )
    """,
    doc="Unpivot (wide→long) via stack(), oracle as UNION ALL expansion.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        ).alias("metric", "raw"),
    ).select("c_custkey", "metric", F.round("raw", 2).alias("val"))


@query(
    "string_distance_join",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE a.p_partkey < 100 AND b.p_partkey < 100
      AND levenshtein(a.p_name, b.p_name) <= 6
    """,
    doc="Fuzzy self-join on edit distance, blocked by brand (blocking keeps "
    "the pair space linear-ish — same pattern as embedding near-dup).",
)
def string_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= 6)
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.alias("dist"),
        )
    )


@query(
    "recursive_cte_series",
    oracle="""
    WITH RECURSIVE series(n, fib_a, fib_b) AS (
      SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT n + 1, fib_b, fib_a + fib_b FROM series WHERE n < 30
    )
    SELECT n, fib_a AS fib FROM series
    """,
    doc="Recursive CTE (Spark 4.1 WITH RECURSIVE): 30-step Fibonacci "
    "iteration — the iterative-computation primitive.",
)
def recursive_cte_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE series(n, fib_a, fib_b) AS (
          SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
          UNION ALL
          SELECT n + 1, fib_b, fib_a + fib_b FROM series WHERE n < 30
        )
        SELECT n, fib_a AS fib FROM series
        """
    )


@query(
    "topk_per_group_orders",
    oracle="""
    SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rn <= 3
    """,
    doc="Top-k per group (k=3 biggest orders per market segment) — join + "
    "window + filter; at scale pre-aggregate with min_by/top-k pushdown.",
)
def topk_per_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@query(
    "fn_variant_extract",
    oracle="""
    SELECT o_orderkey,
           json_extract_string(
             to_json(struct_pack(k := o_orderkey, s := o_orderstatus,
                                 p := o_totalprice)), '$.s') AS status,
           round(CAST(json_extract(
             to_json(struct_pack(k := o_orderkey, s := o_orderstatus,
                                 p := o_totalprice)), '$.p') AS DOUBLE), 2)
             AS price
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    doc="Spark 4 VARIANT path: to_json → parse_json → variant_get typed "
    "extraction (the semi-structured column type the reference's engine "
    "lacks entirely — DataFusion core 48 has no JSON functions, SURVEY "
    "§2B 'JSON functions'). The oracle walks the same JSON via DuckDB "
    "json_extract.",
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    v = F.parse_json(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("s"),
                F.col("o_totalprice").alias("p"),
            )
        )
    )
    return (
        o.select("o_orderkey", v.alias("v"))
        .select(
            "o_orderkey",
            F.variant_get("v", "$.s", "string").alias("status"),
            F.round(F.variant_get("v", "$.p", "double"), 2).alias("price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "udtf_word_positions",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents
      WHERE doc_id < 50
    )
    SELECT doc_id,
           count(*) AS n_words,
           count(DISTINCT word) AS n_unique,
           min(word) AS first_alpha
    FROM words
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Python UDTF (Spark 3.5+/4.x table function): a lateral-join word "
    "tokenizer emitting (word, pos) rows per document, aggregated back to "
    "per-doc stats — the UDF-surface capability class (reference defines "
    "no UDFs at all, SURVEY §2B 'UDF surface'). The UDTF is the "
    "demonstration; the oracle is the equivalent unnest(split()).",
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class WordPositions:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield (w, i)

    spark.udtf.register("word_positions", WordPositions)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs_in")
    words = spark.sql(
        "SELECT doc_id, w.word, w.pos "
        "FROM udtf_docs_in, LATERAL word_positions(text) AS w"
    )
    return (
        words.groupBy("doc_id")
        .agg(
            F.count(lit(1)).alias("n_words"),
            F.countDistinct("word").alias("n_unique"),
            F.min("word").alias("first_alpha"),
        )
        .orderBy("doc_id")
    )


@query(
    "explode_outer_long_tokens",
    oracle="""
    WITH arr AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                         w -> len(w) >= 8) AS zs
      FROM documents
    ), exploded AS (
      SELECT doc_id, lang,
             unnest(CASE WHEN len(zs) = 0 THEN [CAST(NULL AS VARCHAR)]
                         ELSE zs END) AS ztok
      FROM arr
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)                          AS n_rows,
           CAST(count(ztok) AS BIGINT)                       AS n_tokens,
           CAST(count(*) FILTER (WHERE ztok IS NULL) AS BIGINT) AS n_docs_without
    FROM exploded
    GROUP BY lang
    """,
    doc="explode_outer: docs whose long-word (len>=8) array is EMPTY survive as a NULL row "
    "(plain explode drops them — silently losing every document without "
    "a match). The oracle spells the same semantics as a NULL-padded "
    "unnest, since DuckDB has no outer unnest.",
)
def explode_outer_long_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    zs = F.filter(toks, lambda w: F.length(w) >= 8)
    exploded = d.select("doc_id", "lang", F.explode_outer(zs).alias("ztok"))
    return exploded.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("ztok").alias("n_tokens"),
        F.count_if(F.col("ztok").isNull()).alias("n_docs_without"),
    )


@query(
    "cogroup_asof_join",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ), c0 AS (
      SELECT user_id, ts AS cts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.user_id, p.purchase_id, p.pts, c0.cts AS click_ts, c0.click_id
    FROM p ASOF LEFT JOIN c0
      ON p.user_id = c0.user_id AND p.pts >= c0.cts
    """,
    doc="As-of join implemented as a cogrouped-Pandas custom operator: "
    "both sides shuffle once on user_id, then each key's purchase and "
    "click groups meet in one Arrow batch where pandas.merge_asof does "
    "the per-key backward search. This is the imperative scale path for "
    "as-of semantics Spark lacks natively (vs the window-composition "
    "rewrite in asof_join_last_purchase): per-key work is a local "
    "sort-merge, state never exceeds one key group, and the only shuffle "
    "is the cogroup exchange. Click side pre-deduped per (user, ts) with "
    "max(event_id) so the as-of pick is unambiguous under ts ties. "
    "Oracle: DuckDB native ASOF LEFT JOIN.",
)
def cogroup_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("cts"))
        .agg(F.max("event_id").alias("click_id"))
    )

    out_schema = (
        "user_id long, purchase_id long, pts timestamp, "
        "click_ts timestamp, click_id long"
    )

    def asof_merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "purchase_id", "pts", "click_ts", "click_id"]
        if left.empty:  # key has clicks but no purchases → no output rows
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "purchase_id": pd.Series(dtype="int64"),
                    "pts": pd.Series(dtype="datetime64[us]"),
                    "click_ts": pd.Series(dtype="datetime64[us]"),
                    "click_id": pd.Series(dtype="Int64"),
                }
            )
        left = left.sort_values("pts")
        if right.empty:
            res = left.copy()
            res["click_ts"] = pd.NaT
            res["click_id"] = pd.array([None] * len(left), dtype="Int64")
            return res[cols]
        right = right.sort_values("cts").rename(columns={"cts": "click_ts"})[
            ["click_ts", "click_id"]
        ]
        merged = pd.merge_asof(
            left,
            right,
            left_on="pts",
            right_on="click_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        merged["click_id"] = merged["click_id"].astype("Int64")
        return merged[cols]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(asof_merge, out_schema)
    )


@query(
    "fn_posexplode_ordinality",
    oracle="""
    SELECT doc_id,
           CAST(p[2] - 1 AS INTEGER) AS pos,
           p[1]                      AS word
    FROM (
      SELECT doc_id, unnest(list_zip(l, range(1, len(l) + 1))) AS p
      FROM (SELECT doc_id, string_split(text, ' ')[1:5] AS l FROM documents)
    )
    """,
    doc="posexplode — UNNEST WITH ORDINALITY: each array element arrives "
    "with its 0-based position (first 5 words per document). DuckDB 1.0 "
    "has no WITH ORDINALITY, so the oracle zips the list with its index "
    "range; unnamed-struct fields are accessed positionally (p[1]/p[2]).",
)
def fn_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    first5 = F.slice(F.split("text", " "), 1, 5)
    return d.select("doc_id", F.posexplode(first5).alias("pos", "word"))


@query(
    "fn_inline_structs",
    oracle="""
    SELECT o_orderkey, u.part AS slice_name, u.amt AS slice_amt
    FROM (
      SELECT o_orderkey,
             unnest([
               {'part': 'base',  'amt': CAST(floor(o_totalprice * 0.8  * 100) AS BIGINT)},
               {'part': 'tax',   'amt': CAST(floor(o_totalprice * 0.15 * 100) AS BIGINT)},
               {'part': 'fees',  'amt': CAST(floor(o_totalprice * 0.05 * 100) AS BIGINT)}
             ]) AS u
      FROM orders
      WHERE o_orderkey < 2000
    )
    """,
    doc="inline() — explode an ARRAY<STRUCT> into columns (one row per "
    "struct, struct fields become top-level columns): the idiomatic way "
    "to unpack nested repeated records. Map-side Generate, no shuffle.",
)
def fn_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    # floor-to-cents, not round(x, 2): double rounding is HALF_UP in Spark
    # but HALF_EVEN in DuckDB; floor is IEEE-identical in both
    part = lambda name, frac: F.struct(
        F.lit(name).alias("slice_name"),
        F.floor(F.col("o_totalprice") * frac * 100).cast("bigint").alias("slice_amt"),
    )
    slices = F.array(part("base", 0.8), part("tax", 0.15), part("fees", 0.05))
    return o.select("o_orderkey", F.inline(slices))


@query(
    "unpivot_sql_syntax",
    oracle="""
    SELECT c_custkey, metric, round(val, 4) AS val
    FROM (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE)      AS balance,
             CAST(c_nationkey AS DOUBLE)    AS nation,
             CAST(length(c_name) AS DOUBLE) AS name_len
      FROM customer
    )
    UNPIVOT (val FOR metric IN (balance, nation, name_len))
    """,
    doc="ANSI UNPIVOT clause (wide → long), the SQL-syntax twin of the "
    "stack()-based unpivot_stack query. Map-side Expand — no shuffle.",
)
def unpivot_sql_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, metric, round(val, 4) AS val
        FROM (
          SELECT c_custkey,
                 CAST(c_acctbal AS DOUBLE)      AS balance,
                 CAST(c_nationkey AS DOUBLE)    AS nation,
                 CAST(length(c_name) AS DOUBLE) AS name_len
          FROM customer
        )
        UNPIVOT (val FOR metric IN (balance, nation, name_len))
        """
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id, lang AS lang_back, length(lang) AS ct_longer
    FROM documents
    WHERE doc_id < 300
    """,
    doc="aes_encrypt/aes_decrypt round-trip (ECB mode is deterministic — "
    "GCM would salt a random IV per row). The oracle is the identity on "
    "the plaintext: decrypt(encrypt(x)) = x, plus a sanity bit that the "
    "ciphertext length is a positive AES block multiple, surfaced as "
    "the plaintext length both engines can compute.",
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    ct = F.aes_encrypt(F.col("lang"), key, F.lit("ECB"))
    pt = F.aes_decrypt(ct, key, F.lit("ECB")).cast("string")
    return d.select(
        "doc_id",
        pt.alias("lang_back"),
        F.when(F.length(ct) % 16 == 0, F.length("lang"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("ct_longer"),
    )


@query(
    "mba_item_pair_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
    ), freq AS (
      SELECT l_partkey, count(*) AS f FROM items GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_x, b.l_partkey AS part_y, count(*) AS co_count
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT p.part_x, p.part_y, p.co_count,
           round(CAST(p.co_count AS DOUBLE) * n.n_orders / (fx.f * fy.f), 6) AS lift,
           round(CAST(p.co_count AS DOUBLE) / n.n_orders, 8) AS support
    FROM pairs p
    JOIN freq fx ON fx.l_partkey = p.part_x
    JOIN freq fy ON fy.l_partkey = p.part_y
    CROSS JOIN n
    """,
    doc="Market-basket pair lift: parts co-purchased in the same order "
    "with support >= 2, scored by lift vs independence — the classic "
    "association-rule building block. The pair expansion is the "
    "within-order self-join (bounded by basket size, co-partitioned on "
    "the order key — never a global cross of the catalog); the item "
    "frequency table is catalog-sized and broadcasts; the order total "
    "rides along as a 1-row broadcast cross join.",
)
def mba_item_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    ).persist()  # feeds the order total, item frequencies, and the pair join
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_x"))
    b = items.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_y"))
    pairs = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("part_x") < F.col("part_y")))
        .groupBy("part_x", "part_y")
        .agg(F.count(F.lit(1)).alias("co_count"))
        .filter(F.col("co_count") >= 2)
    )
    fx = freq.select(F.col("l_partkey").alias("part_x"), F.col("f").alias("fx"))
    fy = freq.select(F.col("l_partkey").alias("part_y"), F.col("f").alias("fy"))
    return (
        pairs.join(F.broadcast(fx), "part_x")
        .join(F.broadcast(fy), "part_y")
        .crossJoin(F.broadcast(n))
        .select(
            "part_x",
            "part_y",
            "co_count",
            F.round(
                F.col("co_count").cast("double") * F.col("n_orders")
                / (F.col("fx") * F.col("fy")),
                6,
            ).alias("lift"),
            F.round(F.col("co_count").cast("double") / F.col("n_orders"), 8).alias(
                "support"
            ),
        )
    )


@query(
    "curation_quantile_bins",
    oracle="""
    WITH binned AS (
      SELECT lang, n_chars,
             CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS INT)
               AS bin
      FROM documents
    )
    SELECT lang, bin, count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM binned GROUP BY lang, bin
    """,
    doc="Per-language quartile binning of document length (feature "
    "discretization): ntile over (n_chars, doc_id) — a total order, so "
    "bin edges are engine-stable — then per-(lang, bin) stats. The "
    "window partitions on the language key, never one global sort.",
)
def curation_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        d.select("lang", "n_chars", F.ntile(4).over(w).alias("bin"))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "mba_rfm_segments",
    oracle="""
    WITH mx AS (
      SELECT max(o_orderdate) AS max_d FROM orders
    ), cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), (SELECT max_d FROM mx)) AS recency,
             count(*) AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(16,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, monetary,
             CAST(ntile(4) OVER (ORDER BY recency, o_custkey) AS INT) AS r_score,
             CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
             CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INT) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score, count(*) AS n_customers,
           CAST(sum(monetary) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
    doc="RFM customer segmentation: per-customer recency (days since "
    "last order vs corpus max date), order frequency, and exact-decimal "
    "monetary total, quartile-scored with (value, custkey) total orders "
    "and aggregated to segment counts. Each quartile score is an EXACT "
    "ntile(4) computed via segmented_ntile (scale_patterns.py): rows "
    "bucket by a monotone coarsening of the sort key (recency days, "
    "-frequency, -$1000 monetary band), rank with a PARTITIONED "
    "row_number per bucket, and add the broadcast per-bucket carry-in "
    "counts — bit-identical to the oracle's global ntile windows, but "
    "no single reducer ever sorts the whole customer relation.",
)
def mba_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("max_d"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(16,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(F.col("max_d"), F.col("last_d")).alias("recency"),
            "frequency",
            "monetary",
        )
    )
    scored = cust
    for bucket, order, out in [
        (F.col("recency").cast("bigint"), [F.asc("recency"), F.asc("o_custkey")], "r_score"),
        (-F.col("frequency"), [F.desc("frequency"), F.asc("o_custkey")], "f_score"),
        (
            -F.floor(F.col("monetary") / 1000).cast("bigint"),
            [F.desc("monetary"), F.asc("o_custkey")],
            "m_score",
        ),
    ]:
        scored = segmented_ntile(scored, bucket, order, out)
    scored = scored.select("o_custkey", "monetary", "r_score", "f_score", "m_score")
    # the segment total stays in exact decimal until the final cast —
    # an avg would divide in double and can straddle a round-half
    # boundary differently per engine (Spark rounds the shortest decimal
    # repr, DuckDB the binary value)
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary").cast("double").alias("total_monetary"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), cnt AS (
      SELECT cur_type, next_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), tot AS (
      SELECT cur_type, sum(n) AS t FROM cnt GROUP BY cur_type
    )
    SELECT c.cur_type, c.next_type, CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / t.t, 6) AS p
    FROM cnt c JOIN tot t ON t.cur_type = c.cur_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead() within (user, ts, event_id) — the window "
    "partitions on the high-cardinality user key — then transition "
    "counts normalized per source state (the totals table is "
    "|event_type|-cardinality and broadcasts).",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    cnt = seq.groupBy("cur_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("cur_type").agg(F.sum("n").alias("t"))
    return cnt.join(F.broadcast(tot), "cur_type").select(
        "cur_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("p"),
    )


@query(
    "pipe_syntax_summary",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    """,
    doc="SQL pipe syntax (Spark 4.0 |> operators, SIGMOD'24 'SQL Has "
    "Problems' pipe-syntax proposal): FROM |> WHERE |> AGGREGATE ... "
    "GROUP BY |> WHERE over the orders table. Same Catalyst plan as the "
    "classic formulation (the oracle) — this pins the alternative SQL "
    "surface users of a 2024+ engine expect.",
)
def pipe_syntax_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        """
    )


@query(
    "lateral_view_explode_sql",
    oracle="""
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           min(word)                AS first_word
    FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
      FROM documents WHERE doc_id < 20
    )
    GROUP BY doc_id
    """,
    doc="HiveQL LATERAL VIEW explode(...) syntax (the third explode "
    "surface besides F.explode and ANSI LATERAL join) — the form most "
    "migrated Hive/legacy-Spark SQL uses. Same Generate plan as the "
    "DataFrame API.",
)
def lateral_view_explode_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        r"""
        SELECT doc_id,
               count(*)  AS n_words,
               min(word) AS first_word
        FROM documents
        LATERAL VIEW explode(split(trim(lower(text)), '\\s+')) t AS word
        WHERE doc_id < 20
        GROUP BY doc_id
        """
    )
