"""Scalar-function families (SURVEY.md §2B rows "String/Regex/Math/
Date-time/Conditional/Array/Map/JSON functions", "Casts").

All built-in `pyspark.sql.functions` — JVM-side, whole-stage-codegen'd;
no Python UDFs anywhere on these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load


@query(
    "fn_string_battery",
    oracle="""
    SELECT
      c_custkey,
      upper(c_name)                      AS up_name,
      lower(c_mktsegment)                AS low_seg,
      CAST(length(c_name) AS INTEGER)    AS name_len,
      substr(c_name, 1, 8)               AS name_prefix,
      trim(c_name)                       AS trimmed,
      lpad(CAST(c_custkey AS VARCHAR), 8, '0')  AS padded_key,
      replace(c_name, '#', '-')          AS dashed,
      reverse(c_mktsegment)              AS rev_seg,
      repeat(c_mktsegment, 2)            AS seg2,
      left(c_name, 4)                    AS l4,
      right(c_name, 4)                   AS r4,
      CAST(strpos(c_name, '#') AS INTEGER)  AS hash_pos,
      starts_with(c_mktsegment, 'BU')    AS is_bu,
      ends_with(c_mktsegment, 'RY')      AS ends_ry,
      split_part(c_name, '#', 1)         AS name_head,
      CAST(ascii(c_mktsegment) AS INTEGER)  AS first_code,
      md5(c_name)                        AS name_md5,
      concat(c_mktsegment, ':', c_name)  AS tagged
    FROM customer
    """,
    doc="String-function battery (upper/lower/length/substr/pad/replace/"
    "reverse/repeat/left/right/strpos/starts/ends/split_part/ascii/md5).",
)
def fn_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim("c_name").alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.repeat("c_mktsegment", 2).alias("seg2"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.col("c_name").substr(F.length("c_name") - 3, F.lit(4)).alias("r4"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.startswith("c_mktsegment", F.lit("BU")).alias("is_bu"),
        F.endswith("c_mktsegment", F.lit("RY")).alias("ends_ry"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.ascii("c_mktsegment").alias("first_code"),
        F.md5("c_name").alias("name_md5"),
        F.concat("c_mktsegment", F.lit(":"), "c_name").alias("tagged"),
    )


@query(
    "fn_regex_battery",
    oracle="""
    SELECT
      doc_id,
      regexp_matches(text, 'data|spark')                    AS mentions_eng,
      regexp_replace(text, '[aeiou]', '_', 'g')             AS devoweled,
      regexp_extract(text, '([a-z]+)', 1)                   AS first_word,
      CAST(length(text) - length(replace(text, ' ', '')) AS INTEGER) AS n_spaces
    FROM documents
    WHERE doc_id < 50
    """,
    doc="Regex predicate/replace/extract (simple RE2-and-Java-safe patterns).",
)
def fn_regex_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.col("text").rlike("data|spark").alias("mentions_eng"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias(
            "n_spaces"
        ),
    )


@query(
    "fn_math_battery",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      round(abs(l_discount - 0.05), 6)              AS abs_d,
      CAST(ceil(l_quantity) AS BIGINT)              AS ceil_q,
      CAST(floor(l_quantity) AS BIGINT)             AS floor_q,
      round(exp(l_discount), 6)                     AS exp_d,
      round(ln(l_extendedprice), 6)                 AS ln_p,
      round(log10(l_extendedprice), 6)              AS log10_p,
      round(log2(l_quantity + 1), 6)                AS log2_q,
      round(pow(l_quantity, 2), 6)                  AS q_sq,
      round(sqrt(l_extendedprice), 6)               AS sqrt_p,
      round(cbrt(l_extendedprice), 6)               AS cbrt_p,
      round(sin(l_discount), 6)                     AS sin_d,
      round(cos(l_discount), 6)                     AS cos_d,
      round(atan2(l_quantity, l_extendedprice), 6)  AS at2,
      round(sign(l_discount - 0.05), 1)             AS sgn,
      round(degrees(l_discount), 6)                 AS deg_d,
      round(radians(l_quantity), 6)                 AS rad_q,
      CAST(l_orderkey % 97 AS BIGINT)               AS mod97,
      round(greatest(l_quantity, l_extendedprice / 1000), 6) AS big,
      round(least(l_quantity, l_extendedprice / 1000), 6)    AS small
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
    doc="Math-function battery (rounded to 6dp for cross-engine libm drift).",
)
def fn_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
        F.ceil("l_quantity").cast("bigint").alias("ceil_q"),
        F.floor("l_quantity").cast("bigint").alias("floor_q"),
        F.round(F.exp("l_discount"), 6).alias("exp_d"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_p"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_p"),
        F.round(F.log2(F.col("l_quantity") + 1), 6).alias("log2_q"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("q_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_p"),
        F.round(F.cbrt("l_extendedprice"), 6).alias("cbrt_p"),
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 6).alias("at2"),
        F.round(F.signum(F.col("l_discount") - 0.05), 1).alias("sgn"),
        F.round(F.degrees("l_discount"), 6).alias("deg_d"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
        (F.col("l_orderkey") % 97).alias("mod97"),
        F.round(F.greatest(F.col("l_quantity"), F.col("l_extendedprice") / 1000), 6).alias(
            "big"
        ),
        F.round(F.least(F.col("l_quantity"), F.col("l_extendedprice") / 1000), 6).alias(
            "small"
        ),
    )


@query(
    "fn_datetime_battery",
    oracle="""
    SELECT
      o_orderkey,
      CAST(extract(year  FROM o_orderdate) AS INTEGER) AS yr,
      CAST(extract(month FROM o_orderdate) AS INTEGER) AS mo,
      CAST(extract(day   FROM o_orderdate) AS INTEGER) AS dy,
      CAST(extract(quarter FROM o_orderdate) AS INTEGER) AS qtr,
      CAST(extract(dow   FROM o_orderdate) AS INTEGER)  AS dow_sun0,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      strftime(o_orderdate, '%Y-%m')                    AS ym,
      o_orderdate + INTERVAL 30 DAY                     AS due_date,
      CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
                                                        AS days_since_95,
      CAST(epoch(o_orderdate) AS BIGINT)                AS epoch_s,
      make_date(2000, 1, CAST(extract(day FROM o_orderdate) AS INTEGER)) AS fake_date,
      CAST(o_orderdate AS DATE)                         AS as_date
    FROM orders
    WHERE o_orderkey <= 200
    """,
    doc="Date/time battery: extract, date_trunc, format, interval math, "
    "datediff, epoch, make_date, cast-to-date.",
)
def fn_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        # DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1.
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_95"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.make_date(F.lit(2000), F.lit(1), F.dayofmonth("o_orderdate")).alias("fake_date"),
        F.col("o_orderdate").cast("date").alias("as_date"),
    )


@query(
    "fn_date_bin_bucketing",
    oracle="""
    SELECT
      time_bucket(INTERVAL '1 hour', ts) AS hour_bucket,
      event_type,
      count(*)              AS n,
      round(sum(value), 2)  AS total_value
    FROM events
    GROUP BY hour_bucket, event_type
    """,
    doc="date_bin/time-bucket rollup — the streaming-window batch analogue "
    "(DataFusion date_bin ≈ Spark window()/date_trunc).",
)
def fn_date_bin_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("hour_bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "fn_conditional_null",
    oracle="""
    SELECT
      e.event_id,
      coalesce(nullif(e.event_type, 'error'), 'ERR')        AS type_or_err,
      CASE WHEN e.value > 50 THEN 'hi'
           WHEN e.value > 20 THEN 'mid'
           ELSE 'lo' END                                    AS band,
      (e.value IS NULL)                                     AS v_null,
      (e.event_type IS NOT NULL)                            AS t_set,
      if(e.value > 50, 1, 0)                                AS hi_flag,
      greatest(e.value, 50.0)                               AS at_least_50,
      least(e.value, 50.0)                                  AS at_most_50
    FROM events e
    WHERE e.event_id <= 300
    """,
    doc="Conditional/null family: coalesce, nullif, CASE, IS NULL, if, "
    "greatest/least.",
)
def fn_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR")).alias(
            "type_or_err"
        ),
        F.when(F.col("value") > 50, "hi")
        .when(F.col("value") > 20, "mid")
        .otherwise("lo")
        .alias("band"),
        F.col("value").isNull().alias("v_null"),
        F.col("event_type").isNotNull().alias("t_set"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("hi_flag"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("at_least_50"),
        F.least(F.col("value"), F.lit(50.0)).alias("at_most_50"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k')                    AS k_str,
      CAST(json_extract_string(props, '$.k') AS BIGINT)    AS k_num
    FROM events
    WHERE event_id <= 500
    """,
    doc="JSON field extraction from the events.props payload column "
    "(Spark get_json_object; exceeds reference parity — DataFusion core "
    "48 ships no JSON functions, SURVEY §2B).",
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
    )


@query(
    "fn_array_battery",
    oracle="""
    SELECT
      vec_id,
      CAST(len(embedding) AS INTEGER)                AS dim,
      round(CAST(embedding[1] AS DOUBLE), 6)         AS first_val,
      round(CAST(embedding[8] AS DOUBLE), 6)         AS eighth_val,
      round(list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))), 6) AS head3_sum,
      round(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS l1_norm,
      round(CAST(list_max(embedding) AS DOUBLE), 6)  AS max_val,
      list_contains([label], 3)                      AS is_label3
    FROM embeddings
    WHERE vec_id < 100
    """,
    doc="Array/higher-order functions over array<float> embeddings: size, "
    "element_at, slice, transform, aggregate (L1 norm), array_max, contains.",
)
def fn_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb_d, 1), 6).alias("first_val"),
        F.round(F.element_at(emb_d, 8), 6).alias("eighth_val"),
        F.round(
            F.aggregate(F.slice(emb_d, 1, 3), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head3_sum"),
        F.round(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("l1_norm"),
        F.round(F.array_max(emb_d), 6).alias("max_val"),
        F.array_contains(F.array(F.col("label")), 3).alias("is_label3"),
    )


@query(
    "fn_cast_trycast",
    oracle="""
    SELECT
      event_id,
      CAST(trunc(value) AS INTEGER)                  AS v_int,
      CAST(round(value, 2) AS VARCHAR)               AS v_str,
      TRY_CAST(event_type AS DOUBLE)                 AS t_num,
      TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      CAST(CAST(trunc(value) AS INTEGER) AS BOOLEAN) AS v_bool
    FROM events
    WHERE event_id <= 200
    """,
    doc="CAST / TRY_CAST battery incl. failing casts → NULL.",
)
def fn_cast_trycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    return ev.select(
        "event_id",
        # Spark's double→int cast truncates; DuckDB's rounds — trunc() on the
        # oracle side pins both to truncation semantics.
        F.col("value").cast("int").alias("v_int"),
        F.round(F.col("value"), 2).cast("string").alias("v_str"),
        F.col("event_type").try_cast("double").alias("t_num"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.col("value").cast("int").cast("boolean").alias("v_bool"),
    )


@query(
    "fn_string_battery2",
    oracle="""
    SELECT
      p_partkey,
      translate(p_name, 'aeiou', '12345')                 AS translated,
      sha256(p_name)                                      AS name_sha256,
      to_base64(encode(p_brand))                          AS brand_b64,
      CAST(decode(from_base64(to_base64(encode(p_name)))) AS VARCHAR) AS b64_roundtrip,
      CAST(levenshtein(p_brand, p_type) AS INTEGER)       AS brand_type_dist,
      CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels,
      upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS sentence_case
    FROM part
    WHERE p_partkey <= 120
    """,
    doc="Second string battery: translate, sha2-256, base64 encode/decode "
    "roundtrip, levenshtein, regexp_count, manual initcap "
    "(single-sentence form; DuckDB lacks initcap).",
)
def fn_string_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 120)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "12345").alias("translated"),
        F.sha2("p_name", 256).alias("name_sha256"),
        F.base64(F.encode("p_brand", "utf-8")).alias("brand_b64"),
        F.decode(F.unbase64(F.base64(F.encode("p_name", "utf-8"))), "utf-8").alias(
            "b64_roundtrip"
        ),
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.regexp_count("p_name", F.lit("[aeiou]")).alias("n_vowels"),
        F.concat(
            F.upper(F.substring("p_type", 1, 1)),
            F.lower(F.expr("substring(p_type, 2)")),
        ).alias("sentence_case"),
    )


@query(
    "fn_math_battery2",
    oracle="""
    SELECT
      l_linenumber,
      CAST(factorial(l_linenumber) AS BIGINT)      AS fact_n,
      isnan(CAST('nan' AS DOUBLE) + l_quantity)    AS qnan,
      isnan(CAST(l_quantity AS DOUBLE))            AS qnotnan,
      round(floor(CAST(l_quantity AS DOUBLE) / 7), 1) AS qdiv7,
      CAST(abs(-l_linenumber) AS INTEGER)          AS absn,
      round(pi(), 6)                               AS pi6,
      round(power(2, l_linenumber), 1)             AS pow2n
    FROM lineitem
    WHERE l_orderkey <= 40
    """,
    doc="Second math battery: factorial, isnan, integer division, pi, power.",
)
def fn_math_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 40)
    return li.select(
        "l_linenumber",
        F.factorial("l_linenumber").alias("fact_n"),
        # ANSI mode (Spark 4 default) errors on x/0 — construct the NaN via
        # literal propagation instead
        F.isnan(F.lit(float("nan")) + F.col("l_quantity")).alias("qnan"),
        F.isnan(F.col("l_quantity").cast("double")).alias("qnotnan"),
        F.round(F.floor(F.col("l_quantity") / 7).cast("double"), 1).alias("qdiv7"),
        F.abs(-F.col("l_linenumber")).alias("absn"),
        F.round(F.lit(3.14159265358979), 6).alias("pi6"),
        F.round(F.pow(F.lit(2), F.col("l_linenumber")), 1).alias("pow2n"),
    )


@query(
    "fn_datetime_battery2",
    oracle="""
    SELECT
      o_orderkey,
      last_day(CAST(o_orderdate AS DATE))                       AS month_end,
      CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH              AS plus_3mo,
      CAST(date_trunc('week', o_orderdate) AS DATE)             AS week_start,
      CAST(extract(doy FROM o_orderdate) AS INTEGER)            AS day_of_year,
      CAST(extract(week FROM o_orderdate) AS INTEGER)           AS week_of_year,
      greatest(CAST(o_orderdate AS DATE), DATE '1996-06-01')    AS clamped
    FROM orders
    WHERE o_orderkey <= 150
    """,
    doc="Second datetime battery: last_day, add_months, week truncation, "
    "day-of-year, ISO week, date greatest.",
)
def fn_datetime_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 150)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.dayofyear("o_orderdate").alias("day_of_year"),
        F.weekofyear("o_orderdate").alias("week_of_year"),
        F.greatest(d, F.lit("1996-06-01").cast("date")).alias("clamped"),
    )


@query(
    "fn_regex_extract_all",
    oracle="""
    SELECT
      doc_id,
      coalesce(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), '|'), '') AS long_words_csv,
      CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INTEGER) AS n_long
    FROM documents
    WHERE doc_id < 40
    """,
    doc="regexp_extract_all returning the full match array, projected to a "
    "joined string + count so the driver's pandas hash harness never sees a "
    "list cell (it cannot hash them).",
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    # idx=0 (whole match): Spark defaults to group 1, DuckDB to group 0
    matches = F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0)
    return d.select(
        "doc_id",
        F.array_join(matches, "|").alias("long_words_csv"),
        F.size(matches).alias("n_long"),
    )


@query(
    "fn_bitwise_battery",
    oracle="""
    SELECT o_orderkey,
           (o_orderkey & 15)        AS b_and,
           (o_orderkey | 48)        AS b_or,
           xor(o_orderkey, 85)      AS b_xor,
           (~o_orderkey)            AS b_not,
           (o_orderkey << 2)        AS b_shl,
           (o_orderkey >> 1)        AS b_shr,
           bit_count(o_orderkey)    AS b_pop
    FROM orders
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    doc="Scalar bitwise battery: AND/OR/XOR/NOT, shifts, popcount — the "
    "expression-level complement of the bit_and/or/xor aggregates "
    "(DataFusion inherits these as operators; Spark exposes them as "
    "functions + SQL operators).",
)
def fn_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(15).alias("b_and"),
        k.bitwiseOR(48).alias("b_or"),
        k.bitwiseXOR(85).alias("b_xor"),
        F.bitwise_not(k).alias("b_not"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 1).alias("b_shr"),
        F.bit_count(k).cast("bigint").alias("b_pop"),
    ).orderBy("o_orderkey")


@query(
    "fn_collation_ci",
    oracle="""
    WITH mixed AS (
      SELECT event_type AS s FROM events
      UNION ALL SELECT upper(event_type) FROM events
      UNION ALL SELECT concat(upper(substr(event_type, 1, 1)),
                              substr(event_type, 2)) FROM events
    )
    SELECT count(DISTINCT s)        AS n_case_sensitive,
           count(DISTINCT lower(s)) AS n_case_insensitive
    FROM mixed
    """,
    doc="Spark 4 collation support: COLLATE UNICODE_CI makes DISTINCT "
    "case-insensitive at the comparison level (the oracle's portable "
    "twin is count(DISTINCT lower(s))). 3 casings of 5 event types -> "
    "15 CS-distinct vs 5 CI-distinct.",
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(F.col("event_type").alias("s"))
    mixed = (
        ev.unionAll(ev.select(F.upper("s").alias("s")))
        .unionAll(ev.select(F.initcap("s").alias("s")))
    )
    return mixed.agg(
        F.countDistinct("s").alias("n_case_sensitive"),
        F.countDistinct(F.collate("s", "UNICODE_CI")).alias("n_case_insensitive"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1)          AS proto,
           regexp_extract(url, '://([^/]+)/', 1)           AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1)      AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1)         AS lang_param
    FROM (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    doc="URL parsing: Spark's parse_url(HOST/PATH/QUERY/PROTOCOL) over "
    "synthesized per-doc URLs; the oracle is the equivalent regexp "
    "extraction (DuckDB has no parse_url). Map-only, JVM-side.",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    ).orderBy("doc_id")


@query(
    "fn_regexp_extract_all",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\b\w{6,}\b')) AS INTEGER) AS n_long,
           regexp_extract_all(text, '\b\w{6,}\b')[1]                    AS first_long,
           split_part(concat(lang, '_', source, '_', CAST(doc_id AS VARCHAR)),
                      '_', 2)                                           AS src_part
    FROM documents
    """,
    doc="Multi-match regex extraction (regexp_extract_all → array of all "
    "matches, Java regex on the Spark side, RE2 on the oracle side — the "
    r"\b\w{n,} class behaves identically) plus split_part field access. "
    "Map-only over the scan; the extracted array stays columnar.",
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pat = F.lit(r"\b\w{6,}\b")
    matches = F.regexp_extract_all(F.col("text"), pat, F.lit(0))
    tagged = F.concat_ws("_", "lang", "source", F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.size(matches).alias("n_long"),
        F.try_element_at(matches, F.lit(1)).alias("first_long"),
        F.split_part(tagged, F.lit("_"), F.lit(2)).alias("src_part"),
    )


@query(
    "fn_array_setops",
    oracle="""
    SELECT doc_id,
           array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ') AS uniq_sorted_csv,
           array_to_string(
               flatten([string_split(text, ' ')[1:3],
                        string_split(text, ' ')[4:6]]), ' ')           AS first6_csv,
           CAST(len(list_distinct(string_split(text, ' ')))
                AS INTEGER)                                            AS n_uniq
    FROM documents
    """,
    doc="Array set operations: distinct + canonical sort (set-equality "
    "normal form — array_distinct alone is order-dependent between "
    "engines, array_sort makes it comparable), slice windows, and "
    "flatten of nested arrays. All columnar JVM higher-order "
    "functions, map-only over the scan. Arrays are projected through "
    "array_join so the driver's pandas hash harness only sees scalars.",
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(words)), " ").alias(
            "uniq_sorted_csv"
        ),
        F.array_join(
            F.flatten(F.array(F.slice(words, 1, 3), F.slice(words, 4, 3))), " "
        ).alias("first6_csv"),
        F.size(F.array_distinct(words)).alias("n_uniq"),
    )


@query(
    "fn_xml_xpath",
    oracle="""
    SELECT doc_id,
           lang                         AS xl,
           source                       AS xs,
           CAST(n_chars AS INTEGER)     AS xn
    FROM documents
    """,
    doc="XML extraction via Spark's xpath_string/xpath_int over "
    "field-wrapped XML documents (the round-trip proves the XPath "
    "evaluation, not the construction). DuckDB has no XML support, so "
    "the oracle is the identity on the wrapped fields — any XPath "
    "mis-evaluation breaks the hash.",
)
def fn_xml_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    xml = F.concat(
        F.lit("<d><l>"), F.col("lang"),
        F.lit("</l><s>"), F.col("source"),
        F.lit("</s><n>"), F.col("n_chars").cast("string"),
        F.lit("</n></d>"),
    )
    return d.select(
        "doc_id",
        F.xpath_string(xml, F.lit("/d/l")).alias("xl"),
        F.xpath_string(xml, F.lit("/d/s")).alias("xs"),
        F.xpath_int(xml, F.lit("/d/n")).alias("xn"),
    )


@query(
    "fn_python_udf_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / (l_quantity + 1.0) AS score
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
    doc="Arrow-optimized scalar Python UDF (@udf(useArrow=True)): scalar "
    "row semantics, but values cross the JVM↔Python boundary as Arrow "
    "batches instead of pickled rows. Returns the raw IEEE division "
    "(bit-identical in every engine) — NO Python round(), which is "
    "half-to-even and diverges from SQL rounding on boundary values. "
    "Kept OFF hot paths per the UDF hierarchy: builtin >> pandas_udf "
    ">> arrow udf >> pickled udf.",
)
def fn_python_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf(returnType="double", useArrow=True)
    def price_score(price: float, qty: float) -> float:
        return price / (qty + 1.0)

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price_score("l_extendedprice", "l_quantity").alias("score"),
    )


@query(
    "fn_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 1 MONTH   AS plus_month,
           o_orderdate + INTERVAL 14 MONTH  AS plus_ym,
           o_orderdate + INTERVAL 3 DAY + INTERVAL 4 HOUR
             + INTERVAL 5 MINUTE + INTERVAL 6 SECOND AS plus_dts,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2002-01-01') AS INTEGER) AS days_to_cutoff
    FROM orders
    """,
    doc="Interval arithmetic: calendar-aware month addition (add_months "
    "clamps month-end overflow identically in both engines), ANSI "
    "year-month ('1-2') and day-time ('3 04:05:06') interval literals, "
    "and day difference. add_months returns DATE in Spark — cast back "
    "to TIMESTAMP for the cross-engine hash.",
)
def fn_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 1).cast("timestamp").alias("plus_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL '1-2' YEAR TO MONTH")).alias(
            "plus_ym"
        ),
        (
            F.col("o_orderdate") + F.expr("INTERVAL '3 04:05:06' DAY TO SECOND")
        ).alias("plus_dts"),
        F.datediff(F.lit("2002-01-01").cast("date"), "o_orderdate").alias(
            "days_to_cutoff"
        ),
    )


@query(
    "fn_from_csv_json",
    oracle="""
    SELECT doc_id,
           '{"lang":"' || lang || '","n":' || n_chars || '}' AS j,
           n_chars                   AS n_back,
           CAST(n_chars AS INTEGER)  AS n_csv
    FROM documents
    """,
    doc="Structured-text codecs as expressions: to_json(named_struct) "
    "serialization, from_json round-trip, and from_csv line parsing — "
    "the per-column twins of the source-level codecs (codec.py). The "
    "oracle string-builds the exact JSON Spark emits (no-space "
    "separators, field order = struct order).",
)
def fn_from_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payload = F.named_struct(F.lit("lang"), F.col("lang"), F.lit("n"), F.col("n_chars"))
    j = F.to_json(payload)
    return d.select(
        "doc_id",
        j.alias("j"),
        F.from_json(j, "lang string, n bigint").getField("n").alias("n_back"),
        F.from_csv(
            F.concat_ws(",", "lang", F.col("n_chars").cast("string")),
            F.lit("lang string, n int"),
        )
        .getField("n")
        .alias("n_csv"),
    )


@query(
    "fn_map_higher_order",
    oracle="""
    SELECT n_nationkey,
           CAST(n_regionkey * 2 AS BIGINT)  AS rk2,
           CAST(CASE WHEN n_nationkey > 10 THEN 1 ELSE 0 END
              + CASE WHEN n_regionkey > 10 THEN 1 ELSE 0 END AS INTEGER)
                                            AS n_big,
           CAST(n_nationkey * 3 AS BIGINT)  AS nk3,
           CAST(n_nationkey AS BIGINT)      AS a_val,
           'NK,RK'                          AS keys_up_csv
    FROM nation
    """,
    doc="Higher-order MAP functions (map_from_arrays, transform_values, "
    "transform_keys, map_filter, map_zip_with, str_to_map) — all JVM "
    "lambda expressions, no Python. Results are extracted back to "
    "scalars via element_at so the oracle is plain arithmetic.",
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    nk = F.col("n_nationkey").cast("bigint")
    rk = F.col("n_regionkey").cast("bigint")
    m = F.map_from_arrays(F.array(F.lit("nk"), F.lit("rk")), F.array(nk, rk))
    doubled = F.transform_values(m, lambda k, v: v * 2)
    zipped = F.map_zip_with(m, doubled, lambda k, v1, v2: v1 + v2)
    s2m = F.str_to_map(
        F.concat(F.lit("a:"), nk, F.lit(",b:7")), F.lit(","), F.lit(":")
    )
    return n.select(
        "n_nationkey",
        F.element_at(doubled, "rk").alias("rk2"),
        F.size(F.map_filter(m, lambda k, v: v > 10)).alias("n_big"),
        F.element_at(zipped, "nk").alias("nk3"),
        F.element_at(s2m, "a").cast("bigint").alias("a_val"),
        F.array_join(
            F.array_sort(F.map_keys(F.transform_keys(m, lambda k, v: F.upper(k)))),
            ",",
        ).alias("keys_up_csv"),
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT event_id,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE round(value / (event_id % 3), 6) END        AS safe_div,
           CASE WHEN event_id = 0 THEN 9223372036854775807
                WHEN event_id % 2 = 0 THEN NULL
                ELSE event_id END                                AS safe_add,
           CASE WHEN event_id = 1
                THEN CAST(4611686018427387904 AS BIGINT) ELSE NULL END AS safe_mul,
           CASE CAST(event_id % 5 + 1 AS INTEGER)
                WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c'
                ELSE NULL END                                    AS safe_elem
    FROM events
    WHERE event_id < 400
    """,
    doc="TRY_ arithmetic (ANSI-safe error-to-NULL): try_divide by a "
    "cycling zero, try_add past LONG max, try_multiply overflow, "
    "try_element_at out of bounds. Oracle expresses the same semantics "
    "with CASE short-circuits (DuckDB would hard-error on the overflow "
    "paths if evaluated).",
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    eid = F.col("event_id")
    long_max = F.lit(9223372036854775807).cast("long")
    big = F.lit(4611686018427387904).cast("long")
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), eid % 3), 6).alias("safe_div"),
        F.try_add(
            F.when(eid % 2 == 0, long_max).otherwise(F.lit(0).cast("long")), eid
        ).alias("safe_add"),
        F.try_multiply(big, F.when(eid == 1, F.lit(1)).otherwise(F.lit(4)).cast("long"))
        .alias("safe_mul"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (eid % 5 + 1).cast("int"),
        ).alias("safe_elem"),
    )


@query(
    "fn_datetime_battery3",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('day', ts) AS DATE)
             + INTERVAL 1 DAY * (((7 - isodow(CAST(ts AS DATE))) % 7) + 1)
                                                        AS next_monday,
           CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER)   AS dow_sun1,
           CAST(isodow(CAST(ts AS DATE)) - 1 AS INTEGER)      AS wd_mon0,
           CAST(quarter(ts) AS INTEGER)                       AS qtr,
           CAST(dayofyear(ts) AS INTEGER)                     AS doy,
           CAST(weekofyear(ts) AS INTEGER)                    AS iso_week,
           dayname(CAST(ts AS DATE))                          AS day_name,
           monthname(CAST(ts AS DATE))                        AS month_name,
           ts + INTERVAL 1 MINUTE * (event_id % 90)           AS shifted,
           CAST(date_diff('day', date_trunc('day', ts),
                          TIMESTAMP '2001-06-01') AS BIGINT)  AS days_left
    FROM events
    WHERE event_id < 300
    """,
    doc="Third datetime battery: next_day, dayofweek (Sun=1) / weekday "
    "(Mon=0), quarter, dayofyear, ISO weekofyear, day/month names, "
    "timestampadd, timestampdiff on day-truncated stamps (complete-day "
    "counting only agrees with DuckDB's boundary counting when the "
    "start is at midnight).",
)
def fn_datetime_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    d = F.col("ts").cast("date")
    return ev.select(
        "event_id",
        F.next_day(d, "Mon").cast("timestamp").alias("next_monday"),
        F.dayofweek(d).alias("dow_sun1"),
        F.weekday(d).alias("wd_mon0"),
        F.quarter("ts").alias("qtr"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("iso_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.timestamp_add("MINUTE", (F.col("event_id") % 90).cast("int"), F.col("ts")).alias(
            "shifted"
        ),
        F.timestamp_diff(
            "DAY", F.date_trunc("DAY", F.col("ts")), F.lit("2001-06-01").cast("timestamp")
        ).cast("bigint").alias("days_left"),
    )


@query(
    "fn_string_format",
    oracle="""
    SELECT c_custkey,
           printf('%s=%05d', c_mktsegment, c_nationkey)       AS tagged,
           substr(c_name, 1, 2) || 'XX' || substr(c_name, 5)  AS overlaid,
           printf('%X', c_custkey)                            AS hex_key,
           format('{:,}', c_custkey * 1000)                   AS grouped,
           array_to_string(str_split(c_name, '#')[1:1], '#')  AS name_prefix
    FROM customer
    """,
    doc="String formatting: format_string/printf, overlay (PLACING "
    "rewrite), conv base-10→16, format_number digit grouping, "
    "substring_index.",
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.format_string("%s=%05d", F.col("c_mktsegment"), F.col("c_nationkey")).alias(
            "tagged"
        ),
        F.overlay(F.col("c_name"), F.lit("XX"), F.lit(3), F.lit(2)).alias("overlaid"),
        F.upper(F.conv(F.col("c_custkey").cast("string"), 10, 16)).alias("hex_key"),
        F.format_number((F.col("c_custkey") * 1000).cast("bigint"), 0).alias("grouped"),
        F.substring_index(F.col("c_name"), "#", 1).alias("name_prefix"),
    )


@query(
    "fn_array_battery3",
    oracle="""
    SELECT vec_id,
           round(CAST(list_append(embedding[1:2], 9.5)[3] AS DOUBLE), 6) AS appended,
           round(CAST(list_prepend(0.5, embedding[1:2])[1] AS DOUBLE), 6) AS prepended,
           'x|x|x'                                           AS repeated_csv,
           coalesce(list_position(
             list_transform(embedding, v -> round(CAST(v AS DOUBLE), 6)),
             round(CAST(embedding[8] AS DOUBLE), 6)), 0)     AS pos8,
           len(list_filter(embedding, v -> v > 0))           AS n_pos,
           round(CAST(embedding[1] AS DOUBLE)
                 + CAST(embedding[2] AS DOUBLE), 6)          AS zip_sum
    FROM embeddings
    WHERE vec_id < 200
    """,
    doc="Third array battery: array_append/prepend, array_repeat, "
    "array_position (Spark returns 0 when absent, DuckDB NULL — "
    "normalized via coalesce), filter cardinality, arrays_zip + "
    "field extraction (zip fields are positional: 0/1). All JVM "
    "higher-order expressions. DuckDB 1.0 lacks sinh/tanh.",
)
def fn_array_battery3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    emb = F.transform("embedding", lambda v: v.cast("double"))
    head2 = F.slice(emb, 1, 2)
    rounded = F.transform(emb, lambda v: F.round(v, 6))
    zipped = F.arrays_zip(head2, F.slice(emb, 2, 2))
    return e.select(
        "vec_id",
        F.round(F.element_at(F.array_append(head2, F.lit(9.5)), 3), 6).alias("appended"),
        F.round(F.element_at(F.array_prepend(head2, F.lit(0.5)), 1), 6).alias(
            "prepended"
        ),
        F.array_join(F.array_repeat(F.lit("x"), 3), "|").alias("repeated_csv"),
        F.array_position(rounded, F.round(F.element_at(emb, 8), 6))
        .cast("bigint")
        .alias("pos8"),
        F.size(F.filter(emb, lambda v: v > 0)).cast("bigint").alias("n_pos"),
        F.round(
            F.element_at(zipped, 1).getField("0")
            + F.element_at(zipped, 1).getField("1"),
            6,
        ).alias("zip_sum"),
    )


@query(
    "fn_trig_battery",
    oracle="""
    SELECT event_id,
           round(sin(value), 8)             AS s,
           round(cos(value), 8)             AS c,
           round(atan2(value, 2.0), 8)      AS a2,
           round(degrees(atan(value)), 8)   AS deg,
           round(radians(value), 8)         AS rad,
           round((exp(value / 100) - exp(-value / 100)) / 2, 8) AS sh,
           round((exp(value / 50) - 1) / (exp(value / 50) + 1), 8) AS th,
           round(cbrt(abs(value)), 8)       AS cr
    FROM events
    WHERE event_id < 500
    """,
    doc="Trigonometric / hyperbolic battery: sin, cos, atan2, degrees/"
    "radians, sinh, tanh, cbrt — rounded to 8 decimals because "
    "java.lang.Math and C libm may differ in the final ulp.",
)
def fn_trig_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.sin(v), 8).alias("s"),
        F.round(F.cos(v), 8).alias("c"),
        F.round(F.atan2(v, F.lit(2.0)), 8).alias("a2"),
        F.round(F.degrees(F.atan(v)), 8).alias("deg"),
        F.round(F.radians(v), 8).alias("rad"),
        F.round(F.sinh(v / 100), 8).alias("sh"),
        F.round(F.tanh(v / 100), 8).alias("th"),
        F.round(F.cbrt(F.abs(v)), 8).alias("cr"),
    )
