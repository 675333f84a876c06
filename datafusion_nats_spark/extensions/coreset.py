"""k-center greedy coreset selection (farthest-point sampling; Sener &
Savarese 2018, "Active Learning for Convolutional Neural Networks: A
Core-Set Approach"): pick K_CENTERS embedding-space representatives by
repeatedly adding the point farthest from everything already selected —
the classic coverage-maximizing subset for data pruning / active
learning budgets.

Scale design (100 TB):
- every round is ONE corpus scan joined against the selected set, which
  is at most K_CENTERS rows — a broadcast cross join + grouped min,
  then a 1-row argmax via orderBy+limit (TakeOrderedAndProject);
- the selected set is localCheckpointed per round (K rows) so the plan
  depth stays bounded across the K_CENTERS unrolled rounds — the same
  iteration hygiene as the Lloyd/pagerank/BPE loops;
- at real scale the round count is the budget K, not a function of
  corpus size; each round's cost is a map-side pass (the standard FPS
  trade — K scans — with the usual mitigation, maintaining a running
  min-distance column, expressible here as a persisted frame per round
  at the cost of K materializations of an N-row 2-column table).

Determinism: squared distances are rounded to 6 decimals before the
min/argmax, ties break on vec_id, and the seed is the md5-minimal
vector — so the full selection carries a DuckDB oracle with every
round unrolled as chained CTEs.

Reference parity note: the reference engine has no data-selection
surface; this is part of the mandated LLM-training-pipeline extension
family (curation / embedding ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ml_variants import _SQDIST_DUCK
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

K_CENTERS = 8


def _coreset_oracle() -> str:
    parts = [
        """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), allsel1 AS MATERIALIZED (
      SELECT CAST(1 AS INT) AS sel_rank, vec_id, emb, CAST(NULL AS DOUBLE) AS dmin
      FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
    )
    """
    ]
    for k in range(2, K_CENTERS + 1):
        sqd = _SQDIST_DUCK.format(a="e.emb", b="s.emb")
        parts.append(
            f"""
        , d{k} AS MATERIALIZED (
          SELECT e.vec_id, min(round({sqd}, 6)) AS dmin
          FROM e CROSS JOIN allsel{k - 1} s
          WHERE e.vec_id NOT IN (SELECT vec_id FROM allsel{k - 1})
          GROUP BY e.vec_id
        ), sel{k} AS MATERIALIZED (
          SELECT CAST({k} AS INT) AS sel_rank, d.vec_id, e.emb, d.dmin
          FROM d{k} d JOIN e ON e.vec_id = d.vec_id
          ORDER BY d.dmin DESC, d.vec_id LIMIT 1
        ), allsel{k} AS MATERIALIZED (
          SELECT * FROM allsel{k - 1} UNION ALL SELECT * FROM sel{k}
        )
        """
        )
    parts.append(
        f"""
    SELECT sel_rank, vec_id, dmin AS coverage_radius
    FROM allsel{K_CENTERS}
    """
    )
    return "".join(parts)


@query(
    "curation_coreset_kcenter",
    oracle=_coreset_oracle(),
    doc=f"k-center greedy coreset (farthest-point sampling): {K_CENTERS} "
    "representatives chosen by repeatedly adding the embedding farthest "
    "(max of min squared distance, rounded to 6, ties on vec_id) from "
    "the md5-seeded selection. Each round is one corpus scan against the "
    "broadcast K-row selection + a TakeOrderedAndProject argmax; the "
    "DuckDB oracle unrolls all rounds. coverage_radius is the chosen "
    "point's distance to the prior selection (the k-center bound).",
)
def curation_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )

    def sqd(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, v: s + v
        )

    sel = (
        e.select(F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id", "emb")
        .orderBy("h", "vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("sel_rank"),
            "vec_id",
            "emb",
            F.lit(None).cast("double").alias("dmin"),
        )
        .localCheckpoint()
    )
    for k in range(2, K_CENTERS + 1):
        s = sel.select(F.col("vec_id").alias("sid"), F.col("emb").alias("semb"))
        cand = e.join(sel.select(F.col("vec_id").alias("taken")),
                      F.col("vec_id") == F.col("taken"), "left_anti")
        dmin = (
            cand.crossJoin(F.broadcast(s))
            .groupBy("vec_id")
            .agg(F.min(F.round(sqd(F.col("emb"), F.col("semb")), 6)).alias("dmin"))
        )
        nxt = (
            dmin.join(e, "vec_id")
            .orderBy(F.desc("dmin"), "vec_id")
            .limit(1)
            .select(F.lit(k).alias("sel_rank"), "vec_id", "emb", "dmin")
        )
        sel = sel.unionByName(nxt).localCheckpoint()  # K rows; bounded plan depth
    return sel.select("sel_rank", "vec_id", F.col("dmin").alias("coverage_radius"))
