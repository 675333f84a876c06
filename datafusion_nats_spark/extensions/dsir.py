"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
arXiv:2302.03169): score every raw-pool document by how much its hashed
n-gram feature distribution looks like a target domain's, then keep the
top-K. The published estimator is a bag-of-hashed-features importance
weight log w(x) = sum_f [log p_target(f) - log p_raw(f)] with add-1
smoothing — exactly what is computed here, with unigram features hashed
to B buckets via the repo's md5 idiom.

Scale design (100 TB):
- the two feature-count models are B-bounded aggregates (B=256 rows
  each) with map-side partial counts — the corpus collapses to a
  broadcastable log-ratio table no matter how large the raw pool is;
- per-document scoring is a broadcast equi-join of the exploded feature
  stream against that table plus one grouped sum — map-side join, one
  shuffle on doc_id;
- the top-K selection is orderBy+limit, which Spark executes as
  TakeOrderedAndProject (per-partition heaps, no global sort/window);
- the scalar normalizers (N_target, N_raw) ride along as 1-row
  broadcast cross joins, not driver collects.

Determinism: weights are rounded to 6 decimals before the rank
tie-break on doc_id (same precedent as text_bigram_lm_score's rounded
log aggregate).

Reference parity note: the reference engine has no data-selection
surface; this is part of the mandated LLM-training-pipeline extension
family (curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.text import tokens
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, scan_parallelism

B = 256  # hashed-feature buckets
K = 100  # documents to select
TARGET = "src0"  # the target domain (stand-in for the curated corpus)


@query(
    "curation_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), feats AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % {B} AS b
      FROM toks WHERE tok <> ''
    ), tc AS (
      SELECT b, count(*) AS ct FROM feats WHERE source = '{TARGET}' GROUP BY b
    ), rc AS (
      SELECT b, count(*) AS cr FROM feats WHERE source != '{TARGET}' GROUP BY b
    ), nt AS (SELECT count(*) AS n FROM feats WHERE source = '{TARGET}'),
    nr AS (SELECT count(*) AS n FROM feats WHERE source != '{TARGET}'),
    lr AS (
      SELECT ab.b,
             ln(CAST(coalesce(tc.ct, 0) + 1 AS DOUBLE) / ((SELECT n FROM nt) + {B}))
           - ln(CAST(coalesce(rc.cr, 0) + 1 AS DOUBLE) / ((SELECT n FROM nr) + {B}))
             AS logr
      FROM (SELECT DISTINCT b FROM feats) ab
      LEFT JOIN tc USING (b)
      LEFT JOIN rc USING (b)
    )
    SELECT doc_id, source, count(*) AS n_feats,
           round(sum(logr), 6) AS dsir_logw
    FROM feats JOIN lr USING (b)
    WHERE source != '{TARGET}'
    GROUP BY doc_id, source
    ORDER BY dsir_logw DESC, doc_id
    LIMIT {K}
    """,
    doc=f"DSIR importance resampling: hashed-unigram ({B}-bucket) add-1 "
    f"importance weights of every non-'{TARGET}' document against the "
    f"'{TARGET}' target domain, top-{K} selected. The feature models "
    "collapse to a broadcastable B-row log-ratio table regardless of "
    "corpus size; selection is TakeOrderedAndProject, never a global "
    "window.",
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").repartition(
        scan_parallelism(spark, sf_dir, "documents"), "doc_id"
    )
    toks = d.select(
        "doc_id", "source", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    feats = toks.select(
        "doc_id",
        "source",
        (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint") % B).alias("b"),
    ).persist()  # feeds the two count models, the bucket universe, and scoring
    tgt = feats.filter(F.col("source") == TARGET)
    raw = feats.filter(F.col("source") != TARGET)
    tc = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    rc = raw.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    nt = tgt.agg(F.count(F.lit(1)).alias("n_t"))
    nr = raw.agg(F.count(F.lit(1)).alias("n_r"))
    lr = (
        feats.select("b")
        .distinct()
        .join(tc, "b", "left")
        .join(rc, "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "b",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") / (F.col("n_t") + B))
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast("double") / (F.col("n_r") + B)
                )
            ).alias("logr"),
        )
    )
    scored = (
        raw.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("logr"), 6).alias("dsir_logw"),
        )
    )
    return scored.orderBy(F.desc("dsir_logw"), "doc_id").limit(K)
