"""Product-quantization (PQ) approximate nearest neighbor (Jégou et al.
2011, "Product Quantization for Nearest Neighbor Search"): split each
embedding into M subvectors, quantize every subvector to a small
per-subspace codebook, and score query→corpus similarity from the codes
alone via an ADC (asymmetric distance computation) lookup table — the
corpus is never touched at full precision until the final rerank.

Scale design (100 TB):
- the codebook is M × KSUB = 64 rows — broadcast everywhere; real
  deployments learn it with per-subspace k-means, here it is a sampled
  codebook (md5-order seeds) so the whole operator is deterministic and
  carries a full DuckDB oracle — the plumbing (encode, LUT, ADC,
  rerank) is identical either way;
- encoding is a map-side broadcast join + per-(vector, subspace)
  argmin: the corpus is touched once, emitting M small integer codes
  per vector — the 256-byte-per-vector memory story that makes PQ the
  standard billion-scale ANN representation;
- ADC scoring joins the code table against a query×subspace×code
  lookup table (N_QUERIES × M × KSUB rows, broadcast) — per-query cost
  is a scan of the CODES, not the vectors;
- only the top RERANK candidates per query are rescored exactly, as an
  id equi-join against the corpus (AQE broadcasts the candidate side).

Determinism: argmin distances and final cosines are rounded to 6
decimals before every rank (ties → lowest code / lowest id), and the
M-term ADC sums are accumulated in explicit subspace order on BOTH
engines (ordered-list aggregation) so floating-point addition order
cannot diverge.

Reference parity note: the reference engine has no vector-search
surface; this extends the mandated similarity-search family
(sim_bruteforce_topk / sim_ivf_ann / sim_random_projection_lsh) with
the compressed-domain scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ml_variants import _DOT_DUCK, _NORM_DUCK, DIM
from datafusion_nats_spark.extensions.similarity import N_QUERIES, TOP_K
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

M = 4  # subspaces
SUBDIM = DIM // M  # dimensions per subspace
KSUB = 16  # codebook entries per subspace
RERANK = 100  # exact-rescored candidates per query


def _pq_oracle() -> str:
    sub = "list_slice({v}, {m} * {sd} + 1, ({m} + 1) * {sd})"
    e_sub = sub.format(v="e.emb", m="t.m", sd=SUBDIM)
    q_sub = sub.format(v="q.emb", m="t.m", sd=SUBDIM)
    s_sub = sub.format(v="s.emb", m="t.m", sd=SUBDIM)
    sqd = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), seeds AS (
      SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS j,
             emb
      FROM (SELECT vec_id, emb FROM e
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {KSUB})
    ), cb AS (
      SELECT CAST(t.m AS INT) AS m, s.j, {s_sub} AS cent
      FROM seeds s, range(0, {M}) t(m)
    ), esub AS (
      SELECT e.vec_id, CAST(t.m AS INT) AS m, {e_sub} AS sub
      FROM e, range(0, {M}) t(m)
    ), enc AS (
      SELECT vec_id, m, j AS code, cnorm2 FROM (
        SELECT s.vec_id, s.m, c.j,
               list_sum(list_transform(c.cent, x -> x * x)) AS cnorm2,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY round({sqd.format(a='s.sub', b='c.cent')}, 6), c.j
               ) AS r
        FROM esub s JOIN cb c ON c.m = s.m
      ) WHERE r = 1
    ), qsub AS (
      SELECT q.vec_id AS query_id, CAST(t.m AS INT) AS m, {q_sub} AS qs
      FROM e q, range(0, {M}) t(m)
      WHERE q.vec_id < {N_QUERIES}
    ), qlut AS (
      SELECT s.query_id, s.m, c.j,
             {_DOT_DUCK.format(a='s.qs', b='c.cent')} AS pdot
      FROM qsub s JOIN cb c ON c.m = s.m
    ), qn AS (
      SELECT vec_id AS query_id, {_NORM_DUCK.format(a='emb')} AS qnorm
      FROM e WHERE vec_id < {N_QUERIES}
    ), adc AS (
      SELECT l.query_id, en.vec_id,
             list_sum(list(l.pdot ORDER BY en.m)) AS adot,
             list_sum(list(en.cnorm2 ORDER BY en.m)) AS vnorm2
      FROM enc en JOIN qlut l ON l.m = en.m AND l.j = en.code
      GROUP BY 1, 2
    ), cand AS (
      SELECT query_id, vec_id, approx_cosine FROM (
        SELECT a.query_id, a.vec_id,
               round(a.adot / (qn.qnorm * sqrt(a.vnorm2)), 6) AS approx_cosine,
               row_number() OVER (
                 PARTITION BY a.query_id
                 ORDER BY round(a.adot / (qn.qnorm * sqrt(a.vnorm2)), 6) DESC, a.vec_id
               ) AS cr
        FROM adc a JOIN qn ON qn.query_id = a.query_id
        WHERE a.vec_id != a.query_id
      ) WHERE cr <= {RERANK}
    ), rer AS (
      SELECT c.query_id, c.vec_id AS neighbor_id,
             round({_DOT_DUCK.format(a='qe.emb', b='ne.emb')}
                   / ({_NORM_DUCK.format(a='qe.emb')}
                      * {_NORM_DUCK.format(a='ne.emb')}), 6) AS cosine
      FROM cand c
      JOIN e qe ON qe.vec_id = c.query_id
      JOIN e ne ON ne.vec_id = c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM rer
    ) WHERE rn <= {TOP_K}
    """


def _subvectors(col):
    """array of the M SUBDIM-length slices of ``col`` (1-based slice)."""
    return F.array(*[F.slice(col, m * SUBDIM + 1, SUBDIM) for m in range(M)])


def _ordered_sum(value_col: str, order_col: str = "m"):
    """Sum ``value_col`` grouped rows in explicit ``order_col`` order —
    FP addition order pinned identically to the oracle's
    list_sum(list(x ORDER BY m))."""
    return F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(order_col, value_col))),
            lambda s: s[value_col],
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@query(
    "sim_pq_ann",
    oracle=_pq_oracle(),
    doc=f"Product-quantization ANN: {M}x{SUBDIM}-dim subspaces, "
    f"{KSUB}-entry md5-sampled codebook per subspace, corpus encoded to "
    f"{M} codes/vector (broadcast codebook + rounded argmin), ADC "
    "scoring against a broadcast query LUT with subspace-ordered sums, "
    f"top-{RERANK} candidates exactly reranked to the final top-{TOP_K}. "
    "Fully deterministic -> full DuckDB oracle; recall vs brute force "
    "asserted in pytest.",
)
def sim_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    cb = pq_codebook(e)
    enc = pq_encode(e, cb)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    return pq_adc_rerank(q, cb, enc, e)


def _sqd(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, v: s + v
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def pq_codebook(e: DataFrame) -> DataFrame:
    """(j, m, cent) — KSUB md5-order seed vectors sliced into M
    subspaces. Shared between the in-plan sim_pq_ann and the persisted
    build (extensions/ann_index.pq_index_build) so the two can never
    drift; M*KSUB = 64 rows, localCheckpointed (truncates the window
    lineage)."""
    seeds = (
        e.select(F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id", "emb")
        .orderBy("h", "vec_id")
        .limit(KSUB)
    )
    return (
        seeds.withColumn("j", (F.row_number().over(W.orderBy("h", "vec_id")) - 1))
        .select("j", F.posexplode(_subvectors(F.col("emb"))).alias("m", "cent"))
        .localCheckpoint()
    )


def pq_encode(e: DataFrame, cb: DataFrame) -> DataFrame:
    """One pass over the corpus: argmin centroid per (vector, subspace)
    → (vec_id, m, code, cnorm2). This is the persisted index's stored
    artifact — M small integer codes per vector, the 100 TB memory
    story."""
    esub = e.select("vec_id", F.posexplode(_subvectors(F.col("emb"))).alias("m", "sub"))
    enc_w = W.partitionBy("vec_id", "m").orderBy("d", "j")
    return (
        esub.join(F.broadcast(cb), "m")
        .withColumn("d", F.round(_sqd(F.col("sub"), F.col("cent")), 6))
        .withColumn("r", F.row_number().over(enc_w))
        .filter(F.col("r") == 1)
        .select(
            "vec_id",
            "m",
            F.col("j").alias("code"),
            F.aggregate(F.col("cent"), F.lit(0.0), lambda s, v: s + v * v).alias("cnorm2"),
        )
    )


def pq_adc_rerank(
    q: DataFrame, cb: DataFrame, enc: DataFrame, e: DataFrame
) -> DataFrame:
    """ADC scoring + exact rerank, shared by the in-plan and persisted
    paths: build the query LUT against ``cb``, score every stored code
    row in ``enc`` (the scan is of CODES, never vectors), keep the top
    RERANK approximate candidates per query, exactly rescore them
    against the full-precision corpus ``e`` (vec_id, emb). ``q`` is
    (query_id, qemb)."""
    qsub = q.select(
        "query_id", F.posexplode(_subvectors(F.col("qemb"))).alias("m", "qsub")
    )
    qlut = qsub.join(F.broadcast(cb), "m").select(
        "query_id",
        F.col("m").alias("lm"),
        F.col("j").alias("lj"),
        _dot(F.col("qsub"), F.col("cent")).alias("pdot"),
    )
    qn = q.select("query_id", _norm(F.col("qemb")).alias("qnorm"))
    # --- ADC score from codes alone: scan of enc, broadcast LUT
    adc = (
        enc.join(
            F.broadcast(qlut), (F.col("m") == F.col("lm")) & (F.col("code") == F.col("lj"))
        )
        .groupBy("query_id", "vec_id")
        .agg(
            _ordered_sum("pdot").alias("adot"),
            _ordered_sum("cnorm2").alias("vnorm2"),
        )
    )
    cand_w = W.partitionBy("query_id").orderBy(F.desc("approx_cosine"), "vec_id")
    cand = (
        adc.join(F.broadcast(qn), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "approx_cosine",
            F.round(F.col("adot") / (F.col("qnorm") * F.sqrt(F.col("vnorm2"))), 6),
        )
        .withColumn("cr", F.row_number().over(cand_w))
        .filter(F.col("cr") <= RERANK)
        .select("query_id", "vec_id")
    )
    # --- exact rerank of the candidate set only
    qe = q.select("query_id", "qemb")
    ne = e.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb"))
    rer = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ne, cand.vec_id == ne.neighbor_id)
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qemb"), F.col("nemb"))
                / (_norm(F.col("qemb")) * _norm(F.col("nemb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return rer.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= TOP_K
    )
