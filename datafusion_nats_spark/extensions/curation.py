"""Corpus-curation operators for LLM training-data pipelines (driver
mandate, alongside dedup/similarity/text/multimodal): deterministic
train/val/test splitting, stratified sampling, column profiling, PII
scrubbing, and benchmark-contamination checking.

Scale design (100 TB):
- splits and samples key on an md5-derived bucket of the document id —
  deterministic, engine-portable (exact DuckDB twin), and uniformly
  distributed, so no stage needs a global sort or a driver-side RNG;
- stratified sampling is a per-stratum window over the hash order:
  shuffle is on the stratum key only, and the rank cutoff bounds output
  per stratum (skew-safe for dominant languages);
- profiling is a single full-scan aggregate (one job, no shuffle beyond
  the final single-row combine) that is then unpivoted driver-free;
- contamination joins corpus shingles against a broadcast benchmark
  shingle set — the benchmark side is small by construction, so the big
  corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.dedup import _SHINGLES_DUCK, _shingles_spark
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

BENCH_MAX_DOC = 20  # doc_id < 20 plays the held-out benchmark set
STRATUM_SAMPLE = 20  # docs kept per language stratum


def _hash_bucket(col, mod: int):
    """md5-derived uniform bucket in [0, mod) — the engine-portable hash
    (same construction as the MinHash oracles; Spark conv() == DuckDB
    '0x'-cast on the md5 prefix)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint") % mod
    )


@query(
    "curation_split_train_val_test",
    oracle="""
    WITH assigned AS (
      SELECT lang, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs
    FROM assigned
    GROUP BY split
    ORDER BY split
    """,
    doc="Deterministic 80/10/10 train/val/test split: an md5 bucket of "
    "doc_id assigns every document stably (reshuffles, retries, and other "
    "engines all agree) — no RNG, no global sort, map-side assignment "
    "only.",
)
def curation_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "curation_stratified_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
      FROM keyed
    )
    SELECT lang,
           count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS sample_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM ranked
    WHERE rn <= {STRATUM_SAMPLE}
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Stratified downsample: keep the first N documents per language in "
    "md5-hash order — a deterministic uniform sample per stratum "
    "(row_number over the hash, shuffle on the stratum key only; the "
    "rank cutoff bounds per-stratum output, so a dominant language can't "
    "skew the sample).",
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_SAMPLE)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("sample_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query(
    "curation_profile_columns",
    oracle="""
    SELECT 'doc_id' AS column_name, count(DISTINCT doc_id) AS n_distinct,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(*) AS n_rows
    FROM documents
    UNION ALL
    SELECT 'text', count(DISTINCT text),
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
    FROM documents
    UNION ALL
    SELECT 'lang', count(DISTINCT lang),
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
    FROM documents
    UNION ALL
    SELECT 'source', count(DISTINCT source),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(DISTINCT n_chars),
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
    FROM documents
    ORDER BY column_name
    """,
    doc="Corpus column profiler: per-column distinct / null / row counts in "
    "ONE scan (a single multi-aggregate job, then a stack() unpivot — the "
    "oracle's 5-scan UNION is the semantic twin, not the plan).",
)
def curation_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}__null")
        )
    one = d.agg(*aggs)
    stack_args = ", ".join(f"'{c}', {c}__distinct, {c}__null" for c in cols)
    return (
        one.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_distinct, n_null)",
            "n_rows",
        )
        .orderBy("column_name")
    )


_EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"\d{3}-\d+"


@query(
    "curation_scrub_pii",
    oracle=f"""
    WITH enriched AS (
      SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-01' || CAST(doc_id % 100 AS VARCHAR)
               AS raw
      FROM documents
    ), scrubbed AS (
      SELECT source, raw,
             regexp_replace(
               regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS clean,
             len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_email,
             len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phone
      FROM enriched
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS emails_redacted,
           CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
           CAST(sum(length(raw) - length(clean)) AS BIGINT) AS chars_removed
    FROM scrubbed
    GROUP BY source
    ORDER BY source
    """,
    doc="PII scrubbing: regexp_replace redaction of emails/phone numbers "
    "(deterministically injected into the synthetic corpus so the scrub "
    "has work to do), with per-source redaction counts. Map-only — "
    "JVM-side regex, no UDF, no shuffle before the final rollup.",
)
def curation_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-01"),
        (F.col("doc_id") % 100).cast("string"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        d.select(
            "source",
            raw.alias("raw"),
            clean.alias("clean"),
            F.regexp_count(raw, F.lit(_EMAIL_RE)).alias("n_email"),
            F.regexp_count(raw, F.lit(_PHONE_RE)).alias("n_phone"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("emails_redacted"),
            F.sum("n_phone").cast("bigint").alias("phones_redacted"),
            F.sum(F.length("raw") - F.length("clean")).cast("bigint").alias("chars_removed"),
        )
        .orderBy("source")
    )


@query(
    "curation_benchmark_contamination",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle
      FROM documents
    ), bench AS (
      SELECT DISTINCT shingle FROM shingled WHERE doc_id < {BENCH_MAX_DOC}
    ), corp AS (
      SELECT DISTINCT doc_id, shingle FROM shingled WHERE doc_id >= {BENCH_MAX_DOC}
    ), sizes AS (
      SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id
    ), ov AS (
      SELECT c.doc_id, count(*) AS n_overlap
      FROM corp c JOIN bench b USING (shingle)
      GROUP BY c.doc_id
    )
    SELECT s.doc_id, s.n_shingles,
           CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_shingles, 6)
             AS contamination
    FROM sizes s LEFT JOIN ov o USING (doc_id)
    ORDER BY contamination DESC, s.doc_id
    LIMIT 20
    """,
    doc="Benchmark-contamination check: fraction of each corpus document's "
    "3-gram shingles that appear in the held-out benchmark set (doc_id < "
    f"{BENCH_MAX_DOC} stands in for the benchmark). The benchmark shingle "
    "set broadcasts; the corpus never shuffles for the membership join — "
    "the decontamination primitive of training-data pipelines.",
)
def curation_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle"))
    bench = sh.filter(F.col("doc_id") < BENCH_MAX_DOC).select("shingle").distinct()
    corp = sh.filter(F.col("doc_id") >= BENCH_MAX_DOC).distinct()
    sizes = corp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ov = (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_raw"))
    )
    n_overlap = F.coalesce(F.col("n_overlap_raw"), F.lit(0)).cast("bigint")
    return (
        sizes.join(ov, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            n_overlap.alias("n_overlap"),
            F.round(n_overlap.cast("double") / F.col("n_shingles"), 6).alias("contamination"),
        )
        .orderBy(F.desc("contamination"), "doc_id")
        .limit(20)
    )


@query(
    "curation_lang_balance_resample",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), target AS (
      SELECT min(n) AS m FROM counts
    ), ranked AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|balance'), doc_id
             ) AS rn
      FROM documents
    )
    SELECT r.lang,
           CAST(count(*) AS BIGINT)     AS n_docs,
           CAST(sum(r.n_chars) AS BIGINT) AS total_chars
    FROM ranked r, target t
    WHERE r.rn <= t.m
    GROUP BY r.lang
    """,
    doc="Language rebalancing: downsample every language to the smallest "
    "language's document count, picking rows in deterministic hash order "
    "(md5 of doc_id — an unbiased, reproducible shuffle both engines "
    "compute identically). Per-lang windows keep the sort partition-"
    "local; the 1-row target count broadcasts.",
)
def curation_lang_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    m = d.groupBy("lang").count().agg(F.min("count").alias("m"))
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|balance"))), "doc_id"
    )
    ranked = d.withColumn("rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("rn") <= F.col("m"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "curation_minmax_normalize",
    oracle="""
    WITH stats AS (
      SELECT lang,
             min(n_chars) AS mn,
             max(n_chars) AS mx,
             avg(n_chars) AS mu,
             stddev_samp(n_chars) AS sd
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           round(CASE WHEN s.mx = s.mn THEN 0.5
                      ELSE CAST(d.n_chars - s.mn AS DOUBLE) / (s.mx - s.mn)
                 END, 6)                                        AS len_minmax,
           round((d.n_chars - s.mu) / s.sd, 6)                  AS len_z
    FROM documents d JOIN stats s USING (lang)
    """,
    doc="Per-language feature scaling for training-data curation: min-max "
    "to [0,1] and z-score of document length. Two-pass shape (tiny "
    "per-group stats aggregate, broadcast back onto the corpus) instead "
    "of a window over the full table — the stats side is O(#langs) "
    "rows, so the join broadcasts and the big side never shuffles.",
)
def curation_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
        F.avg("n_chars").alias("mu"),
        F.stddev_samp("n_chars").alias("sd"),
    )
    nc = F.col("n_chars").cast("double")
    return d.join(F.broadcast(stats), "lang").select(
        "doc_id",
        "lang",
        F.round(
            F.when(F.col("mx") == F.col("mn"), F.lit(0.5)).otherwise(
                (nc - F.col("mn")) / (F.col("mx") - F.col("mn"))
            ),
            6,
        ).alias("len_minmax"),
        F.round((nc - F.col("mu")) / F.col("sd"), 6).alias("len_z"),
    )


# Concat-and-chunk sequence packing: the training-prep step that turns a
# curated corpus into fixed-token-budget sequences. Documents are laid
# end-to-end per language in a deterministic hash order and cut every
# PACK_BIN tokens; a document is assigned the bin where it starts and may
# span several (reported, so the loader can decide to split or mask).
PACK_BIN = 512


@query(
    "curation_sequence_packing",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM sized
    )
    SELECT doc_id, lang,
           CAST(n_tok AS INTEGER)            AS n_tok,
           cum - n_tok                       AS start_off,
           (cum - n_tok) // {PACK_BIN}       AS first_bin,
           (cum - 1) // {PACK_BIN} - (cum - n_tok) // {PACK_BIN} + 1 AS bins_spanned
    FROM packed
    """,
    doc="Sequence packing (concat-and-chunk): per language, documents are "
    "concatenated in deterministic md5-hash order and cut into "
    f"{PACK_BIN}-token training bins via ONE running-sum window — no "
    "driver loop, no RNG. The window partitions on lang, so the only "
    "shuffle is per-language and each partition sorts independently; at "
    "100 TB add a salt level (pack per lang×shard) since bins never "
    "cross document boundaries' order anyway.",
)
def curation_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    sized = d.select("doc_id", "lang", n_tok.alias("n_tok"), h.alias("h"))
    w = W.partitionBy("lang").orderBy("h", "doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = sized.withColumn("cum", F.sum("n_tok").over(w).cast("bigint"))
    start = F.col("cum") - F.col("n_tok")
    first_bin = F.expr(f"(cum - n_tok) DIV {PACK_BIN}")
    last_bin = F.expr(f"(cum - 1) DIV {PACK_BIN}")
    return packed.select(
        "doc_id",
        "lang",
        "n_tok",
        start.alias("start_off"),
        first_bin.alias("first_bin"),
        (last_bin - first_bin + 1).alias("bins_spanned"),
    )


# Winsorization percentiles (shared by Spark and oracle)
WINSOR_LO, WINSOR_HI = 0.05, 0.95


@query(
    "curation_winsorize",
    oracle=f"""
    WITH stats AS (
      SELECT lang,
             quantile_cont(n_chars, {WINSOR_LO}) AS p_lo,
             quantile_cont(n_chars, {WINSOR_HI}) AS p_hi
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           round(least(greatest(CAST(d.n_chars AS DOUBLE), p_lo), p_hi), 4)
             AS n_chars_winsor,
           (d.n_chars < p_lo OR d.n_chars > p_hi) AS is_outlier
    FROM documents d JOIN stats USING (lang)
    """,
    doc="Per-group winsorization: clamp a numeric feature to its "
    "language's [p05, p95] band (outlier-robust feature cleaning). The "
    "percentiles are a tiny per-lang aggregate broadcast back onto the "
    "corpus — the big table is touched by exactly one scan + one "
    "map-side join, never sorted globally. Spark percentile() and "
    "DuckDB quantile_cont share the (n-1)p interpolation rule.",
)
def curation_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.percentile("n_chars", WINSOR_LO).alias("p_lo"),
        F.percentile("n_chars", WINSOR_HI).alias("p_hi"),
    )
    nc = F.col("n_chars").cast("double")
    return d.join(F.broadcast(stats), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.least(F.greatest(nc, F.col("p_lo")), F.col("p_hi")), 4).alias(
            "n_chars_winsor"
        ),
        ((F.col("n_chars") < F.col("p_lo")) | (F.col("n_chars") > F.col("p_hi"))).alias(
            "is_outlier"
        ),
    )


# Temperature for mixture reweighting (multilingual-sampling convention:
# tau < 1 upweights low-resource groups toward uniform).
MIX_TAU = 0.7


@query(
    "curation_mixture_weights",
    oracle=f"""
    WITH per AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM per
    ), raw AS (
      SELECT lang, n_docs, CAST(n_docs AS DOUBLE) / n AS p,
             pow(CAST(n_docs AS DOUBLE) / n, {MIX_TAU}) AS w_raw
      FROM per, tot
    ), z AS (SELECT sum(w_raw) AS z FROM raw)
    SELECT lang,
           CAST(n_docs AS BIGINT)       AS n_docs,
           round(p, 6)                  AS p,
           round(w_raw / z, 6)          AS weight,
           round(w_raw / z / p, 6)      AS boost
    FROM raw, z
    """,
    doc="Domain-mixture reweighting (temperature sampling, tau="
    f"{MIX_TAU}): per-language corpus shares are flattened toward "
    "uniform with w proportional to p^tau — the standard multilingual "
    "sampling recipe; boost = weight/share is the oversampling factor "
    "the data loader applies per group. After the first per-group "
    "count, everything is arithmetic over a handful of rows (two 1-row "
    "broadcast totals) — the corpus is scanned exactly once.",
)
def curation_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(F.sum("n_docs").cast("bigint").alias("n"))
    raw = per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n")).alias("p"),
        F.pow(F.col("n_docs").cast("double") / F.col("n"), MIX_TAU).alias("w_raw"),
    )
    z = raw.agg(F.sum("w_raw").alias("z"))
    return raw.crossJoin(F.broadcast(z)).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round("p", 6).alias("p"),
        F.round(F.col("w_raw") / F.col("z"), 6).alias("weight"),
        F.round(F.col("w_raw") / F.col("z") / F.col("p"), 6).alias("boost"),
    )


N_SHARDS = 16


@query(
    "curation_shuffle_shard",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % {N_SHARDS} AS shard_id
      FROM documents
    )
    SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM keyed
    """,
    doc="Deterministic global shuffle + shard assignment — the 'shuffle "
    "the corpus before training' step every epoch pipeline needs, with "
    "reproducibility across runs: shard = md5(doc_id) mod N (a map-side "
    "expression, so the only shuffle is the per-shard position window, "
    "hash-partitioned BY shard — no global sort, no driver bottleneck). "
    "Within a shard, examples read in md5 order = a reproducible "
    "pseudo-random permutation. At 100 TB each shard window sorts "
    "~corpus/N rows with spill, and writers emit one shard per task.",
)
def curation_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    keyed = d.select(
        "doc_id",
        h.alias("h"),
        (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % N_SHARDS).alias(
            "shard_id"
        ),
    )
    w = W.partitionBy("shard_id").orderBy("h", "doc_id")
    return keyed.select(
        "doc_id",
        "shard_id",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


@query(
    "curation_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1 AS DOUBLE)
                / 1152921504606846976.0) / n_chars AS k
      FROM documents
    )
    SELECT doc_id, n_chars, round(k, 9) AS sample_key
    FROM keyed
    ORDER BY round(k, 12) DESC, doc_id
    LIMIT 50
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis A-ES, "
    "2006): per-doc key ln(u)/w with u an md5-derived uniform in (0, 1] "
    "and w = n_chars; the top-50 by key IS a weight-proportional sample "
    "— fully deterministic (the md5 hash replaces the RNG, same "
    "construction as the split/shard operators), one map-side key "
    "computation + TakeOrderedAndProject, no RNG state and no second "
    "pass at any corpus size.",
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    # u in (0, 1]: (h + 1) / 2^60 — never 0, so ln(u) is finite
    u = (h + 1).cast("double") / F.lit(float(1 << 60))
    k = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", k.alias("k"))
        .orderBy(F.desc(F.round(F.col("k"), 12)), "doc_id")
        .limit(50)
        .select("doc_id", "n_chars", F.round("k", 9).alias("sample_key"))
    )


DOMAIN_CAP = 30  # max docs kept per source domain


@query(
    "curation_domain_caps",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                                   AS n_docs,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT)                                            AS n_kept,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN 0 ELSE 1 END)
                AS BIGINT)                                            AS n_dropped,
           CAST(sum(CASE WHEN rk <= {DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT)                                            AS kept_chars
    FROM ranked
    GROUP BY source
    """,
    doc="Per-domain document caps (Common-Crawl-style curation: no single "
    "domain may dominate the training mix). Keeps at most DOMAIN_CAP docs "
    "per source, chosen in deterministic md5 order (an unbiased uniform "
    "sample per domain — no RNG state), and reports the per-domain "
    "retention funnel. Scale: one hash partition on the domain key before "
    "a bounded per-domain window rank; mega-domains cost a sort of their "
    "own partition only, and the rank cutoff bounds what survives, so "
    "downstream stages see at most |domains| * CAP rows.",
)
def curation_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
    kept = F.col("rk") <= DOMAIN_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, 0).otherwise(1)).alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


@query(
    "report_corpus_datacard",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS ntok,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
      FROM documents
    ), canon AS (
      SELECT ck, min(doc_id) AS canonical FROM keyed GROUP BY ck
    )
    SELECT k.lang, k.source,
           CAST(count(*) AS BIGINT)                        AS n_docs,
           CAST(sum(CASE WHEN k.doc_id <> c.canonical
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_exact_dups,
           CAST(sum(k.n_chars) AS BIGINT)                  AS total_chars,
           CAST(sum(k.ntok) AS BIGINT)                     AS total_tokens,
           round(CAST(sum(k.ntok) AS DOUBLE) / count(*), 6) AS avg_tokens,
           round(CAST(sum(CASE WHEN k.doc_id <> c.canonical THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6)            AS dup_rate
    FROM keyed k JOIN canon c USING (ck)
    GROUP BY k.lang, k.source
    """,
    doc="Corpus data card: the per-(lang, source) summary a dataset release "
    "ships — doc/char/token totals, exact-duplicate count and rate (docs "
    "whose normalized content hash matches an earlier doc). One scan "
    "computes the per-doc facts; the canonical map is a hash aggregate on "
    "the 128-bit content key joined back on that same key (equi-join, "
    "partial-agg both sides — nothing is broadcast because the key space "
    "grows with the corpus); the final rollup groups on the tiny "
    "(lang, source) space.",
)
def report_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ntok"),
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias("ck"),
    )
    canon = keyed.groupBy("ck").agg(F.min("doc_id").alias("canonical"))
    joined = keyed.join(canon, "ck")
    is_dup = F.when(F.col("doc_id") != F.col("canonical"), 1).otherwise(0)
    return joined.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_dup).alias("n_exact_dups"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("ntok").alias("total_tokens"),
        F.round(F.sum("ntok").cast("double") / F.count(F.lit(1)), 6).alias("avg_tokens"),
        F.round(F.sum(is_dup).cast("double") / F.count(F.lit(1)), 6).alias("dup_rate"),
    )


_TEMPORAL_CUTOFF = "1997-06-01"  # train < cutoff <= eval (orders timeline)


@query(
    "curation_temporal_split",
    oracle=f"""
    WITH assigned AS (
      SELECT o_custkey,
             CASE WHEN o_orderdate < TIMESTAMP '{_TEMPORAL_CUTOFF}'
                  THEN 'train' ELSE 'eval' END AS split
      FROM orders
    ), leakage AS (
      SELECT count(DISTINCT t.o_custkey) AS leaked_customers
      FROM (SELECT DISTINCT o_custkey FROM assigned WHERE split = 'train') t
      JOIN (SELECT DISTINCT o_custkey FROM assigned WHERE split = 'eval') e
        ON t.o_custkey = e.o_custkey
    )
    SELECT a.split,
           CAST(count(*) AS BIGINT)                  AS n_rows,
           CAST(count(DISTINCT a.o_custkey) AS BIGINT) AS n_customers,
           CAST(l.leaked_customers AS BIGINT)        AS leaked_customers
    FROM assigned a, leakage l
    GROUP BY a.split, l.leaked_customers
    """,
    doc="Temporal train/eval split (the leakage-safe alternative to hash "
    "splits when the task is forecasting): rows strictly before the "
    "cutoff train, the rest evaluate — plus the ENTITY-LEAKAGE audit "
    "every temporal split needs: how many customers appear on both sides "
    "(their eval rows share entity state with training; report it, decide "
    "per-task whether to group-split them out). Map-side split predicate, "
    "two distinct-aggregates + a 1-row broadcast audit join.",
)
def curation_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    assigned = o.select(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit(_TEMPORAL_CUTOFF).cast("timestamp"), "train"
        )
        .otherwise("eval")
        .alias("split"),
    )
    train_c = assigned.filter(F.col("split") == "train").select("o_custkey").distinct()
    eval_c = assigned.filter(F.col("split") == "eval").select("o_custkey").distinct()
    leakage = train_c.join(eval_c, "o_custkey").agg(
        F.count(F.lit(1)).alias("leaked_customers")
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .crossJoin(F.broadcast(leakage))
    )


@query(
    "report_source_overlap_matrix",
    oracle=f"""
    WITH sh0 AS (
      SELECT source, unnest({_SHINGLES_DUCK}) AS shingle FROM documents
    ), sh AS MATERIALIZED (
      SELECT DISTINCT source, shingle FROM sh0
    ), sizes AS MATERIALIZED (
      SELECT source, count(*) AS n FROM sh GROUP BY 1
    ), ovl AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT o.src_a, o.src_b, CAST(o.n_common AS BIGINT) AS n_common,
           CAST(sa.n + sb.n - o.n_common AS BIGINT) AS n_union,
           CAST(floor(o.n_common * 1000000.0 / (sa.n + sb.n - o.n_common))
                AS BIGINT) AS jaccard_ppm
    FROM ovl o
    JOIN sizes sa ON sa.source = o.src_a
    JOIN sizes sb ON sb.source = o.src_b
    """,
    doc="Cross-source duplication matrix: pairwise shingle-set Jaccard "
    "between every pair of corpus sources — the mixing-QA report run "
    "before weighting sources in a training mixture (two crawls of the "
    "same sites show up as a high-Jaccard pair; curation_mixture_weights "
    "then discounts one). Scale shape: distinct (source, shingle) pairs "
    "self-join ON shingle, so per-shingle fan-out is bounded by "
    "C(n_sources, 2) — a property of the CORPORA count, not the corpus "
    "size; per-source set sizes are a tiny broadcast. Only overlapping "
    "pairs are emitted (zero-overlap pairs carry no signal). Jaccard is "
    "emitted in integer parts-per-million (floor) because both engines "
    "compute the identical IEEE expression — no decimal rounding-mode "
    "divergence.",
)
def report_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = (
        d.select("source", F.explode(_shingles_spark(F.col("text"))).alias("shingle"))
        .distinct()
        .persist()  # feeds sizes + both self-join sides
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("source").alias("src_a"), "shingle")
    b = sh.select(F.col("source").alias("src_b"), "shingle")
    ovl = (
        a.join(b, "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    union_sz = F.col("na") + F.col("nb") - F.col("n_common")
    return (
        ovl.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            union_sz.cast("bigint").alias("n_union"),
            F.floor(F.col("n_common") * F.lit(1000000.0) / union_sz)
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


N_STUMP_BINS = 32  # histogram resolution of the distributed split finder


@query(
    "curation_info_gain_stump",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
             f.feature, f.value
      FROM documents,
           LATERAL (VALUES
             ('n_chars',  CAST(length(text) AS DOUBLE)),
             ('n_tokens', CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE))
           ) AS f(feature, value)
    ), rng AS (
      SELECT feature, min(value) AS vmin, max(value) AS vmax
      FROM feats GROUP BY feature
    ), binned AS (
      SELECT f.feature, f.is_pos,
             CASE WHEN r.vmax > r.vmin
                  THEN least({N_STUMP_BINS - 1},
                             CAST(floor((f.value - r.vmin) * {N_STUMP_BINS}.0
                                        / (r.vmax - r.vmin)) AS INT))
                  ELSE 0 END AS bin
      FROM feats f JOIN rng r USING (feature)
    ), hist AS (
      SELECT feature, bin,
             count(*) AS n, sum(is_pos) AS npos
      FROM binned GROUP BY feature, bin
    ), cum AS (
      SELECT feature, bin,
             sum(n)    OVER wb AS nl,
             sum(npos) OVER wb AS posl,
             sum(n)    OVER wt AS nt,
             sum(npos) OVER wt AS post
      FROM hist
      WINDOW wb AS (PARTITION BY feature ORDER BY bin
                    ROWS UNBOUNDED PRECEDING),
             wt AS (PARTITION BY feature ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING)
    ), gains AS (
      SELECT feature, bin,
             nl, nt - nl AS nr, posl, post - posl AS posr,
             (CASE WHEN CAST(post AS DOUBLE) / nt <= 0 OR CAST(post AS DOUBLE) / nt >= 1 THEN 0
                   ELSE -((CAST(post AS DOUBLE) / nt) * ln(CAST(post AS DOUBLE) / nt)
                          + (1 - CAST(post AS DOUBLE) / nt) * ln(1 - CAST(post AS DOUBLE) / nt)) END)
             - (CAST(nl AS DOUBLE) / nt)
               * (CASE WHEN CAST(posl AS DOUBLE) / nl <= 0 OR CAST(posl AS DOUBLE) / nl >= 1 THEN 0
                       ELSE -((CAST(posl AS DOUBLE) / nl) * ln(CAST(posl AS DOUBLE) / nl)
                              + (1 - CAST(posl AS DOUBLE) / nl) * ln(1 - CAST(posl AS DOUBLE) / nl)) END)
             - (CAST(nt - nl AS DOUBLE) / nt)
               * (CASE WHEN CAST(post - posl AS DOUBLE) / (nt - nl) <= 0
                         OR CAST(post - posl AS DOUBLE) / (nt - nl) >= 1 THEN 0
                       ELSE -((CAST(post - posl AS DOUBLE) / (nt - nl)) * ln(CAST(post - posl AS DOUBLE) / (nt - nl))
                              + (1 - CAST(post - posl AS DOUBLE) / (nt - nl))
                                * ln(1 - CAST(post - posl AS DOUBLE) / (nt - nl))) END)
             AS gain
      FROM cum
      WHERE nl > 0 AND nt - nl > 0
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY feature
                                   ORDER BY round(gain, 9) DESC, bin) AS rk
      FROM gains
    )
    SELECT feature, CAST(bin AS INTEGER) AS split_bin,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           CAST(posl AS BIGINT) AS pos_left, CAST(posr AS BIGINT) AS pos_right,
           round(gain, 6) AS info_gain
    FROM ranked WHERE rk = 1
    """,
    doc="Distributed decision-stump split finder (the MLlib-style binned "
    "histogram algorithm): label = (lang = 'en'), candidate features "
    "unpivoted to (feature, value) rows, each feature range-binned into "
    "32 histogram buckets with broadcast min/max, per-(feature, bin) "
    "label counts aggregated in ONE shuffle, and every split boundary "
    "scored from the cumulative histogram — information gain via binary "
    "entropy — in a 32-rows-per-feature window. This is how tree "
    "ensembles find splits at 100 TB: the corpus is touched once for "
    "the histogram; all candidate-threshold scoring happens on the "
    "|features|x|bins| aggregate. Entropies derive from integer counts "
    "through identical IEEE expressions, and ranking uses round(gain, 9) "
    "with a bin tie-break so the argmax cannot flip across engines.",
)
def curation_info_gain_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_pos"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_chars").alias("feature"),
                    F.length("text").cast("double").alias("value"),
                ),
                F.struct(
                    F.lit("n_tokens").alias("feature"),
                    F.size(F.split(F.trim(F.col("text")), r"\s+"))
                    .cast("double")
                    .alias("value"),
                ),
            )
        ).alias("fv"),
    ).select("doc_id", "is_pos", F.col("fv.feature").alias("feature"), F.col("fv.value").alias("value"))
    rng = feats.groupBy("feature").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    binned = feats.join(F.broadcast(rng), "feature").select(
        "feature",
        "is_pos",
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.lit(N_STUMP_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * float(N_STUMP_BINS)
                    / (F.col("vmax") - F.col("vmin"))
                ).cast("int"),
            ),
        )
        .otherwise(0)
        .alias("bin"),
    )
    hist = binned.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_pos").alias("npos")
    )
    wb = W.partitionBy("feature").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy("feature").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "feature",
        "bin",
        F.sum("n").over(wb).alias("nl"),
        F.sum("npos").over(wb).alias("posl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("npos").over(wt).alias("post"),
    )

    def _entropy(pos, n):
        p = pos.cast("double") / n
        return F.when((p <= 0) | (p >= 1), F.lit(0.0)).otherwise(
            -(p * F.log(p) + (1 - p) * F.log(1 - p))
        )

    gains = (
        cum.filter((F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0))
        .select(
            "feature",
            "bin",
            "nl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            "posl",
            (F.col("post") - F.col("posl")).alias("posr"),
            (
                _entropy(F.col("post"), F.col("nt"))
                - (F.col("nl").cast("double") / F.col("nt"))
                * _entropy(F.col("posl"), F.col("nl"))
                - ((F.col("nt") - F.col("nl")).cast("double") / F.col("nt"))
                * _entropy(
                    F.col("post") - F.col("posl"), F.col("nt") - F.col("nl")
                )
            ).alias("gain"),
        )
    )
    rk = W.partitionBy("feature").orderBy(F.round("gain", 9).desc(), "bin")
    return (
        gains.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "feature",
            F.col("bin").cast("int").alias("split_bin"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.col("posl").alias("pos_left"),
            F.col("posr").alias("pos_right"),
            F.round("gain", 6).alias("info_gain"),
        )
    )


@query(
    "curation_feature_correlation",
    oracle="""
    WITH feats AS (
      SELECT CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tokens,
             CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE)
               AS n_uniq_tokens
      FROM documents
    ), pairs AS (
      SELECT 'n_chars' AS feat_a, 'n_tokens' AS feat_b, n_chars AS a, n_tokens AS b FROM feats
      UNION ALL
      SELECT 'n_chars', 'n_uniq_tokens', n_chars, n_uniq_tokens FROM feats
      UNION ALL
      SELECT 'n_tokens', 'n_uniq_tokens', n_tokens, n_uniq_tokens FROM feats
    ), s AS (
      SELECT feat_a, feat_b, CAST(count(*) AS DOUBLE) AS n,
             sum(a) AS sa, sum(b) AS sb,
             sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
      FROM pairs GROUP BY 1, 2
    )
    SELECT feat_a, feat_b, CAST(n AS BIGINT) AS n_docs,
           round((n * sab - sa * sb)
                 / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 6) AS pearson_r
    FROM s
    """,
    doc="Pairwise Pearson correlation matrix across per-document scalar "
    "features (char count, token count, unique-token count) — the "
    "redundancy screen a curation pipeline runs before treating features "
    "as independent quality signals. Features are computed map-side per "
    "document, the three unordered pairs are unpivoted via one explode "
    "(no self-join of the corpus), and each pair collapses to a 6-sum "
    "partial-aggregated row; the closed-form r is evaluated on the "
    "3-row aggregate. Pearson r comes from IDENTICAL IEEE expressions "
    "on both engines (never the engines' own corr(), whose internal "
    "accumulation orders differ), with round(..., 6) absorbing "
    "summation-order noise.",
)
def curation_feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    feats = d.select(
        F.length("text").cast("double").alias("n_chars"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("n_tokens"),
        F.size(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), r"\s+")))
        .cast("double")
        .alias("n_uniq_tokens"),
    )
    pairs = feats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_chars").alias("feat_a"),
                    F.lit("n_tokens").alias("feat_b"),
                    F.col("n_chars").alias("a"),
                    F.col("n_tokens").alias("b"),
                ),
                F.struct(
                    F.lit("n_chars").alias("feat_a"),
                    F.lit("n_uniq_tokens").alias("feat_b"),
                    F.col("n_chars").alias("a"),
                    F.col("n_uniq_tokens").alias("b"),
                ),
                F.struct(
                    F.lit("n_tokens").alias("feat_a"),
                    F.lit("n_uniq_tokens").alias("feat_b"),
                    F.col("n_tokens").alias("a"),
                    F.col("n_uniq_tokens").alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.feat_a", "p.feat_b", "p.a", "p.b")
    s = pairs.groupBy("feat_a", "feat_b").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
    )
    n, sa, sb = F.col("n"), F.col("sa"), F.col("sb")
    saa, sbb, sab = F.col("saa"), F.col("sbb"), F.col("sab")
    return s.select(
        "feat_a",
        "feat_b",
        n.cast("bigint").alias("n_docs"),
        F.round(
            (n * sab - sa * sb) / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            6,
        ).alias("pearson_r"),
    )


@query(
    "curation_gini_source_balance",
    oracle="""
    WITH s AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS c
      FROM documents GROUP BY 1
    ), r AS (
      SELECT c, row_number() OVER (ORDER BY c, source) AS rk FROM s
    ), t AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(c) AS tot, sum(rk * c) AS src
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_sources,
           CAST(tot AS BIGINT) AS n_docs,
           round((2 * src) / (n * tot) - (n + 1) / n, 6) AS gini
    FROM t
    """,
    doc="Gini coefficient of the document-count distribution across "
    "sources — the corpus-balance scalar behind curation_domain_caps "
    "(0 = perfectly even, ->1 = one source dominates; the number a "
    "mixture rebalance is judged by). The corpus collapses to "
    "|sources| rows in the first aggregate; the rank runs over that "
    "bounded relation with a (count, source) tie-break and the "
    "coefficient is the standard closed form 2*sum(rank*c)/(n*tot) - "
    "(n+1)/n on a 1-row reduction — all integer-derived doubles, "
    "bit-identical across engines before the cosmetic round.",
)
def curation_gini_source_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("c"))
    rk = W.orderBy("c", "source")
    r = s.withColumn("rk", F.row_number().over(rk))
    t = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").alias("tot"),
        F.sum(F.col("rk") * F.col("c")).alias("src"),
    )
    n, tot, src = F.col("n"), F.col("tot"), F.col("src")
    return t.select(
        n.cast("bigint").alias("n_sources"),
        tot.cast("bigint").alias("n_docs"),
        F.round((2 * src) / (n * tot) - (n + 1) / n, 6).alias("gini"),
    )
