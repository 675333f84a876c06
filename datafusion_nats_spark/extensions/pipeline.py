"""The end-to-end training-data curation pipeline — the north-star
composition (BASELINE.json): quality gate → exact dedup → MinHash-LSH
near-dup removal → curated corpus statistics, as ONE declarative plan.

Every stage is the oracle-checked operator from its own module; this
entry proves they compose. At 100 TB the whole pipeline is:
map (quality, fingerprint) → hash-agg (exact dedup) → LSH candidate
equi-join → verify → anti-join — no stage is all-pairs, no stage
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.dedup import (
    MAX_DF,
    _LSH_BANDED_DUCK,
    _SHINGLES_DUCK,
    dedup_ngram_jaccard,
)
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

MIN_TOKENS = 20
NEAR_DUP_JACCARD = 0.8


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    {_LSH_BANDED_DUCK}
    , quality AS (
      SELECT doc_id, lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_key
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= {MIN_TOKENS}
    ), exact_kept AS (
      SELECT min(doc_id) AS doc_id FROM quality GROUP BY content_key
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(DISTINCT shingle) AS n FROM capped GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN capped x ON x.doc_id = c.doc_a
      JOIN capped y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY c.doc_a, c.doc_b
    ), verified AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN inter USING (doc_a, doc_b)
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {NEAR_DUP_JACCARD}
    ), curated AS (
      SELECT q.doc_id, q.lang, q.n_chars
      FROM quality q
      JOIN exact_kept USING (doc_id)
      WHERE NOT EXISTS (SELECT 1 FROM verified v WHERE v.doc_b = q.doc_id)
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM curated
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Full curation pipeline: quality gate (≥20 tokens) → exact dedup "
    "(keep min doc_id per content key) → near-dup removal (drop the "
    "higher id of every LSH-candidate pair verified at Jaccard ≥ 0.8) → "
    "per-language curated-corpus statistics.",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    quality = d.filter(F.size(toks) >= MIN_TOKENS).select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias(
            "content_key"
        ),
    )
    exact_kept = quality.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    near_dup_losers = (
        dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= NEAR_DUP_JACCARD)
        .select(F.col("doc_b").alias("loser"))
        .distinct()
    )
    curated = (
        quality.join(exact_kept.select("doc_id"), "doc_id", "left_semi")
        .join(
            F.broadcast(near_dup_losers),
            F.col("doc_id") == F.col("loser"),
            "left_anti",
        )
    )
    return (
        curated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


CONTAM_MAX = 0.5


@query(
    "pipeline_train_ready",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, lang, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_key
      FROM documents
      WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= {MIN_TOKENS}
        AND doc_id >= {{bench}}
    ), exact_kept AS (
      SELECT min(doc_id) AS doc_id FROM quality GROUP BY content_key
    ), shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle
      FROM documents
    ), bench AS (
      SELECT DISTINCT shingle FROM shingled WHERE doc_id < {{bench}}
    ), corp AS (
      SELECT DISTINCT doc_id, shingle FROM shingled WHERE doc_id >= {{bench}}
    ), contaminated AS (
      SELECT s.doc_id
      FROM (SELECT doc_id, count(*) AS n FROM corp GROUP BY doc_id) s
      JOIN (SELECT c.doc_id, count(*) AS i FROM corp c JOIN bench b USING (shingle)
            GROUP BY c.doc_id) o USING (doc_id)
      WHERE CAST(o.i AS DOUBLE) / s.n >= {CONTAM_MAX}
    ), ready AS (
      SELECT q.doc_id, q.lang, q.n_chars,
             ('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
               AS bucket
      FROM quality q
      JOIN exact_kept USING (doc_id)
      WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = q.doc_id)
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM ready
    GROUP BY split, lang
    ORDER BY split, lang
    """.replace("{bench}", "20"),
    doc="Train-ready pipeline: quality gate → exact dedup → benchmark "
    "decontamination (drop docs whose shingle overlap with the held-out "
    "benchmark set is ≥ 50%) → deterministic md5-bucket train/val/test "
    "split → per-(split, lang) counts. One declarative plan; the "
    "benchmark shingle set broadcasts, the split is map-side, and no "
    "stage is all-pairs or driver-collected.",
)
def pipeline_train_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.curation import BENCH_MAX_DOC, _hash_bucket
    from datafusion_nats_spark.extensions.dedup import _shingles_spark

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    quality = d.filter(
        (F.size(toks) >= MIN_TOKENS) & (F.col("doc_id") >= BENCH_MAX_DOC)
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias(
            "content_key"
        ),
    )
    exact_kept = quality.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    sh = d.select("doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle"))
    bench = sh.filter(F.col("doc_id") < BENCH_MAX_DOC).select("shingle").distinct()
    corp = sh.filter(F.col("doc_id") >= BENCH_MAX_DOC).distinct()
    sizes = corp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    overlap = (
        corp.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    contaminated = (
        sizes.join(overlap, "doc_id")
        .filter(F.col("i").cast("double") / F.col("n") >= CONTAM_MAX)
        .select("doc_id")
    )
    bucket = _hash_bucket(F.col("doc_id"), 100)
    ready = (
        quality.join(exact_kept.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select(
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
            "lang",
            "n_chars",
        )
    )
    return (
        ready.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )
