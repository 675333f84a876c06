"""Contrastive training-pair mining over the embeddings table: for each
anchor vector, the best positive (nearest same-label neighbor) and a
HARD negative (nearest different-label neighbor within the anchor's
k-means cell — close in embedding space, wrong label: exactly the
negatives that make contrastive/metric-learning objectives work,
per the in-batch/hard-negative literature, e.g. DPR, Karpukhin et al.
2020, arXiv:2004.04906 §3.2).

Scale design (100 TB):
- positives block on the label key: the per-label compare is an
  equi-join, never corpus-wide (in production, compose with a per-label
  ANN when label blocks are huge);
- hard negatives block on the deterministic Lloyd k-means cell
  (``ml_variants.lloyd_assignments`` — the shared codebook also used by
  SemDeDup / kmeans-IVF): one broadcast of a K-row codebook, one
  shuffle on the cell key, and pairwise cosine only within a cell;
- both candidate sets reduce via a per-anchor rank-1 window, so output
  stays one row per anchor.

Determinism: cosines are rounded to 6 decimals BEFORE ranking, ties
break on candidate id — engine-stable; the full Lloyd chain is unrolled
in the oracle via the shared ``lloyd_cte_prefix``.

Reference parity note: the reference (a NATS source for a SQL engine)
has no similarity operators; this extends the mandated LLM-pipeline
surface (embedding-training data prep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ml_variants import (
    _DOT_DUCK,
    _NORM_DUCK,
    LLOYD_ITERS,
    _dot,
    _norm,
    lloyd_assignments,
    lloyd_cte_prefix,
)
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

N_ANCHORS = 20  # vec_id < 20 are the anchor vectors
_FINAL = LLOYD_ITERS + 1  # converged-codebook assignment CTE index


def _cos_duck(a: str, b: str) -> str:
    return (
        f"round({_DOT_DUCK.format(a=a, b=b)}"
        f" / ({_NORM_DUCK.format(a=a)} * {_NORM_DUCK.format(a=b)}), 6)"
    )


def _hard_negative_oracle() -> str:
    return lloyd_cte_prefix() + f"""
    , lab AS (
      SELECT vec_id, label FROM embeddings
    ), anchors AS (
      SELECT a.vec_id, a.emb, a.cell, l.label
      FROM assign{_FINAL} a JOIN lab l USING (vec_id)
      WHERE a.vec_id < {N_ANCHORS}
    ), pos AS (
      SELECT vec_id, pos_id, pos_cos FROM (
        SELECT an.vec_id, c.vec_id AS pos_id,
               {_cos_duck('an.emb', 'c.emb')} AS pos_cos,
               row_number() OVER (
                 PARTITION BY an.vec_id
                 ORDER BY {_cos_duck('an.emb', 'c.emb')} DESC, c.vec_id) AS r
        FROM anchors an
        JOIN (SELECT e.vec_id, e.emb, l.label FROM e JOIN lab l USING (vec_id)) c
          ON c.label = an.label AND c.vec_id <> an.vec_id
      ) WHERE r = 1
    ), neg AS (
      SELECT vec_id, neg_id, neg_cos FROM (
        SELECT an.vec_id, c.vec_id AS neg_id,
               {_cos_duck('an.emb', 'c.emb')} AS neg_cos,
               row_number() OVER (
                 PARTITION BY an.vec_id
                 ORDER BY {_cos_duck('an.emb', 'c.emb')} DESC, c.vec_id) AS r
        FROM anchors an
        JOIN (SELECT a2.vec_id, a2.emb, a2.cell, l.label
              FROM assign{_FINAL} a2 JOIN lab l USING (vec_id)) c
          ON c.cell = an.cell AND c.label <> an.label
      ) WHERE r = 1
    )
    SELECT an.vec_id AS anchor_id, an.label,
           p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
    FROM anchors an
    LEFT JOIN pos p ON p.vec_id = an.vec_id
    LEFT JOIN neg n ON n.vec_id = an.vec_id
    """


@query(
    "sim_hard_negative_mining",
    oracle=_hard_negative_oracle(),
    doc=f"Contrastive pair mining: per anchor (vec_id < {N_ANCHORS}), the "
    "nearest same-label neighbor (positive; label-blocked exact cosine) "
    "and the nearest different-label neighbor inside the anchor's Lloyd "
    "k-means cell (hard negative; cell-blocked). One row per anchor; "
    "NULL negative when the anchor's cell is label-pure. Cosines rounded "
    "to 6 decimals before ranking, id tiebreak — engine-stable.",
)
def sim_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, _ = lloyd_assignments(spark, sf_dir)  # (vec_id, emb, cell)
    lab = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    full = assigned.join(lab, "vec_id")  # (vec_id, emb, cell, label)
    anchors = full.filter(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("emb").alias("a_emb"),
        F.col("cell").alias("a_cell"),
        F.col("label").alias("a_label"),
    )

    def cos(a, b):
        # shared fold from ml_variants — one implementation for every
        # cosine operator keeps the oracle-parity arithmetic in one place
        return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)

    # positive: best same-label candidate (label-blocked equi-join)
    wpos = W.partitionBy("anchor_id").orderBy(F.desc("pos_cos"), "pos_id")
    pos = (
        anchors.join(
            full.select(
                F.col("vec_id").alias("pos_id"),
                F.col("emb").alias("p_emb"),
                F.col("label").alias("p_label"),
            ),
            (F.col("p_label") == F.col("a_label"))
            & (F.col("pos_id") != F.col("anchor_id")),
        )
        .select("anchor_id", "pos_id", cos(F.col("a_emb"), F.col("p_emb")).alias("pos_cos"))
        .withColumn("r", F.row_number().over(wpos))
        .filter(F.col("r") == 1)
        .drop("r")
    )
    # hard negative: best different-label candidate in the SAME cell
    wneg = W.partitionBy("anchor_id").orderBy(F.desc("neg_cos"), "neg_id")
    neg = (
        anchors.join(
            full.select(
                F.col("vec_id").alias("neg_id"),
                F.col("emb").alias("n_emb"),
                F.col("cell").alias("n_cell"),
                F.col("label").alias("n_label"),
            ),
            (F.col("n_cell") == F.col("a_cell"))
            & (F.col("n_label") != F.col("a_label")),
        )
        .select("anchor_id", "neg_id", cos(F.col("a_emb"), F.col("n_emb")).alias("neg_cos"))
        .withColumn("r", F.row_number().over(wneg))
        .filter(F.col("r") == 1)
        .drop("r")
    )
    return (
        anchors.select("anchor_id", F.col("a_label").alias("label"))
        .join(pos, "anchor_id", "left")
        .join(neg, "anchor_id", "left")
    )
