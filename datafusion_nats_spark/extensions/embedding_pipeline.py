"""Embedding-side curation pipeline: the vector twin of the text-side
``pipeline_corpus_curation`` — compose SemDeDup semantic dedup with
label-centroid outlier filtering and report the per-label retention
funnel. Each stage is the oracle-checked operator from its own module;
the composed oracle embeds those oracles as CTE bodies, so this module
is imported last in the extensions package (after the stages have
registered).

Scale design: both stages are already 100-TB-shaped (cell-blocked
pairwise, broadcast centroids); the funnel itself adds one join of two
per-vector relations and a label-keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import REGISTRY, query
from datafusion_nats_spark.tables import load


HARD_OUTLIER = 0.1  # drop cutoff: the op flags < 0.35 for review; only
# the hard tail (< 0.1) is dropped by the pipeline


def _funnel_oracle() -> str:
    sd = REGISTRY["dedup_semantic_semdedup"].oracle
    outl = REGISTRY["curation_label_centroid_outliers"].oracle
    return f"""
    WITH sd AS ({sd}),
    outl AS (
      SELECT vec_id FROM ({outl}) WHERE centroid_cosine < {HARD_OUTLIER}
    )
    SELECT b.label,
           count(*) AS n_total,
           CAST(sum(CASE WHEN s.kept THEN 1 ELSE 0 END) AS BIGINT) AS n_semdedup,
           CAST(sum(CASE WHEN s.kept AND o.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_final,
           round(CAST(sum(CASE WHEN s.kept AND o.vec_id IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS retained_frac
    FROM embeddings b
    JOIN sd s ON s.vec_id = b.vec_id
    LEFT JOIN outl o ON o.vec_id = b.vec_id
    GROUP BY b.label
    """


@query(
    "pipeline_embedding_ready",
    oracle=_funnel_oracle(),
    doc="Embedding curation funnel: SemDeDup keep-list minus the HARD "
    f"label-centroid outliers (cosine < {HARD_OUTLIER}, the drop tail of "
    "the review relation the outlier op flags), reported as per-label "
    "retention (n_total -> n_semdedup -> n_final). Composes the two "
    "oracle-checked stages; one per-vector join + a label-keyed "
    "aggregate on top.",
)
def pipeline_embedding_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.semdedup import dedup_semantic_semdedup
    from datafusion_nats_spark.extensions.similarity import (
        curation_label_centroid_outliers,
    )

    base = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    sd = dedup_semantic_semdedup(spark, sf_dir).select("vec_id", "kept")
    outl = (
        curation_label_centroid_outliers(spark, sf_dir)
        .filter(F.col("centroid_cosine") < HARD_OUTLIER)
        .select(F.col("vec_id").alias("ovid"))
    )
    final_keep = (F.col("kept") & F.col("ovid").isNull()).cast("int")
    return (
        base.join(sd, "vec_id")
        .join(outl, base.vec_id == F.col("ovid"), "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("int")).alias("n_semdedup"),
            F.sum(final_keep).alias("n_final"),
            F.round(
                F.sum(final_keep).cast("double") / F.count(F.lit(1)), 6
            ).alias("retained_frac"),
        )
    )
