"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
greedily build a result list that balances relevance to the query
against redundancy with what is already selected —
MMR(d) = λ·sim(q, d) − (1−λ)·max_{s∈S} sim(d, s). The standard
diversification pass over an ANN/brute-force candidate list, and the
selection shape behind diversity-aware training-data picks.

Scale design (100 TB):
- MMR never touches the corpus: it re-ranks the top-N_CAND candidate
  list (here from the exact cosine top-N against the query), so every
  round is a tiny-frame computation — candidates × selected is at most
  N_CAND × K_SELECT rows with the selected side broadcast;
- the candidate list and per-round selections are localCheckpointed
  (≤ N_CAND rows) — bounded plan depth, same hygiene as the other
  unrolled iterations;
- the corpus-scale step is the candidate generation itself, which is
  any of the existing ANN operators (IVF / PQ / RP-LSH).

Determinism: cosines and MMR scores are rounded to 6 decimals before
every argmax (ties → lowest vec_id); the DuckDB oracle unrolls the
rounds as MATERIALIZED CTEs (plain chained CTEs re-inline the whole
prefix per reference and blow up exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ml_variants import _DOT_DUCK, _NORM_DUCK
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

QUERY_ID = 0  # the query vector
N_CAND = 20  # relevance-ranked candidate pool
K_SELECT = 5  # diversified results to emit
LAM = 0.7  # relevance weight


def _mmr_oracle() -> str:
    cos = (
        f"round({_DOT_DUCK.format(a='{a}', b='{b}')}"
        f" / ({_NORM_DUCK.format(a='{a}')} * {_NORM_DUCK.format(a='{b}')}), 6)"
    )
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), q AS (
      SELECT emb AS qe FROM e WHERE vec_id = {QUERY_ID}
    ), cand AS MATERIALIZED (
      SELECT vec_id, emb, rel FROM (
        SELECT e.vec_id, e.emb,
               {cos.format(a='q.qe', b='e.emb')} AS rel,
               row_number() OVER (
                 ORDER BY {cos.format(a='q.qe', b='e.emb')} DESC, e.vec_id
               ) AS rr
        FROM e, q WHERE e.vec_id != {QUERY_ID}
      ) WHERE rr <= {N_CAND}
    ), allsel1 AS MATERIALIZED (
      SELECT CAST(1 AS INT) AS mmr_rank, vec_id, emb, rel,
             CAST(NULL AS DOUBLE) AS max_sim, rel AS mmr_score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    )
    """
    ]
    for k in range(2, K_SELECT + 1):
        parts.append(
            f"""
        , m{k} AS MATERIALIZED (
          SELECT c.vec_id, c.emb, c.rel,
                 max({cos.format(a='c.emb', b='s.emb')}) AS max_sim
          FROM cand c CROSS JOIN allsel{k - 1} s
          WHERE c.vec_id NOT IN (SELECT vec_id FROM allsel{k - 1})
          GROUP BY c.vec_id, c.emb, c.rel
        ), sel{k} AS MATERIALIZED (
          SELECT CAST({k} AS INT) AS mmr_rank, vec_id, emb, rel, max_sim,
                 round({LAM} * rel - {1 - LAM} * max_sim, 6) AS mmr_score
          FROM m{k}
          ORDER BY round({LAM} * rel - {1 - LAM} * max_sim, 6) DESC, vec_id
          LIMIT 1
        ), allsel{k} AS MATERIALIZED (
          SELECT * FROM allsel{k - 1} UNION ALL SELECT * FROM sel{k}
        )
        """
        )
    parts.append(
        f"""
    SELECT mmr_rank, vec_id, rel AS relevance, max_sim, mmr_score
    FROM allsel{K_SELECT}
    """
    )
    return "".join(parts)


@query(
    "sim_mmr_rerank",
    oracle=_mmr_oracle(),
    doc=f"MMR diversified re-ranking: top-{N_CAND} exact-cosine candidates "
    f"for query vec {QUERY_ID}, then {K_SELECT} greedy rounds of "
    f"lambda={LAM} relevance-vs-redundancy argmax (rounded to 6, ties on "
    "vec_id). Re-ranks a bounded candidate list — the corpus-scale step "
    "is the upstream ANN — with the selected set broadcast each round; "
    "oracle unrolls all rounds as MATERIALIZED CTEs.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))

    def cos(a, b):
        return F.round(dot(a, b) / (norm(a) * norm(b)), 6)

    qv = e.filter(F.col("vec_id") == QUERY_ID).select(F.col("emb").alias("qe"))
    cand = (
        e.filter(F.col("vec_id") != QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "emb", cos(F.col("qe"), F.col("emb")).alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(N_CAND)
        .localCheckpoint()  # the bounded pool every round re-reads
    )
    sel = (
        cand.orderBy(F.desc("rel"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("mmr_rank"),
            "vec_id",
            "emb",
            "rel",
            F.lit(None).cast("double").alias("max_sim"),
            F.col("rel").alias("mmr_score"),
        )
        .localCheckpoint()
    )
    for k in range(2, K_SELECT + 1):
        s = sel.select(F.col("vec_id").alias("sid"), F.col("emb").alias("semb"))
        remaining = cand.join(
            sel.select(F.col("vec_id").alias("taken")),
            F.col("vec_id") == F.col("taken"),
            "left_anti",
        )
        scored = (
            remaining.crossJoin(F.broadcast(s))
            .groupBy("vec_id", "emb", "rel")
            .agg(F.max(cos(F.col("emb"), F.col("semb"))).alias("max_sim"))
            .withColumn(
                "mmr_score", F.round(LAM * F.col("rel") - (1 - LAM) * F.col("max_sim"), 6)
            )
        )
        nxt = (
            scored.orderBy(F.desc("mmr_score"), "vec_id")
            .limit(1)
            .select(F.lit(k).alias("mmr_rank"), "vec_id", "emb", "rel", "max_sim", "mmr_score")
        )
        sel = sel.unionByName(nxt).localCheckpoint()  # ≤ K rows per round
    return sel.select("mmr_rank", "vec_id", F.col("rel").alias("relevance"), "max_sim", "mmr_score")
