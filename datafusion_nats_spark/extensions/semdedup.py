"""Semantic deduplication (SemDeDup, Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then drop every
vector whose cosine similarity to a lower-id member of the SAME cluster
exceeds a threshold. The clustering is the blocking step — pairwise
cosine is only ever computed within a cell, never across the corpus.

Scale design (100 TB):
- the codebook is the deterministic Lloyd k-means from
  ``ml_variants.lloyd_assignments`` — a k-row broadcastable table; at
  real scale k grows with the corpus (k ~ N / target_cell_size) so the
  per-cell pair count stays bounded while the codebook stays tiny;
- the within-cell pairwise is a cell-keyed equi self-join: one shuffle
  on ``cell``, then local pair generation — the published SemDeDup
  shape (cluster -> intra-cluster pairwise), never all-pairs;
- the keep/drop decision (drop the higher id of any over-threshold
  pair) is a per-vector aggregate + left join, both on ``vec_id``.

Determinism: all arithmetic in double precision, cosines rounded to 6
decimals BEFORE the threshold compare and the max aggregate, so the
keep/drop set is engine-stable; the full Lloyd iteration is unrolled in
the DuckDB oracle via the shared ``lloyd_cte_prefix``.

Reference parity note: the reference engine (a NATS source for a SQL
engine) has no semantic-dedup operator; this is part of the mandated
LLM-training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ml_variants import (
    _DOT_DUCK,
    _NORM_DUCK,
    LLOYD_ITERS,
    lloyd_assignments,
    lloyd_cte_prefix,
)
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import salt_factor, salt_partitions

SEM_TAU = 0.35  # drop threshold: ~p99.4 of the within-cell cosine mass here
_FINAL = LLOYD_ITERS + 1  # the converged-codebook assignment CTE index


def _semdedup_oracle() -> str:
    return lloyd_cte_prefix() + f"""
    , pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round({_DOT_DUCK.format(a='a.emb', b='b.emb')}
                   / ({_NORM_DUCK.format(a='a.emb')}
                      * {_NORM_DUCK.format(a='b.emb')}), 6) AS cosine
      FROM assign{_FINAL} a JOIN assign{_FINAL} b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    ), dup AS (
      SELECT b_id, max(cosine) AS max_dup_cosine
      FROM pairs WHERE cosine >= {SEM_TAU}
      GROUP BY b_id
    )
    SELECT v.vec_id, v.cell, (d.b_id IS NULL) AS kept, d.max_dup_cosine
    FROM assign{_FINAL} v LEFT JOIN dup d ON d.b_id = v.vec_id
    """


@query(
    "dedup_semantic_semdedup",
    oracle=_semdedup_oracle(),
    doc="SemDeDup semantic dedup: deterministic Lloyd k-means cells as "
    "the blocking step, exact double-precision cosine within cells only, "
    f"drop the higher id of any pair at cosine >= {SEM_TAU} (rounded to "
    "6 decimals pre-compare). Emits one row per vector: (vec_id, cell, "
    "kept, max_dup_cosine) — the keep-list filter is `WHERE kept`. "
    "Oracle unrolls the identical Lloyd iterations as chained CTEs.",
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, _ = lloyd_assignments(spark, sf_dir)

    from datafusion_nats_spark.extensions.similarity import _dot as dot, _norm as norm

    # cell-keyed equi self-join, SALTED: the cell key is
    # bounded-cardinality (the Lloyd codebook), so an unsalted shuffle
    # join serializes pair generation onto ≤|cells| tasks (the round-9
    # probe capture measured that shape on the IVF rerank). Side a keys
    # to one of S salts by vec_id hash, side b replicates S ways —
    # identical pairs, S-way parallel per cell.
    nsalts = salt_factor(spark)
    nparts = salt_partitions(spark, nsalts)
    # explicit fixed-n repartition: AQE's byte-based coalescing would
    # merge the salted partitions back into ~one task (the inputs are
    # small; the pair fan-out is the cost) — a user-specified
    # numPartitions is not AQE-coalescible
    a = (
        assigned.select(
            F.col("vec_id").alias("a_id"), F.col("emb").alias("ae"), "cell"
        )
        .withColumn(
            "_bsalt",
            F.pmod(F.crc32(F.col("a_id").cast("string")), F.lit(nsalts)).cast(
                "int"
            ),
        )
        .repartition(nparts, "cell", "_bsalt")
    )
    b = (
        assigned.select(
            F.col("vec_id").alias("b_id"),
            F.col("emb").alias("be"),
            F.col("cell").alias("cell_b"),
        )
        .withColumn("_bsalt", F.explode(F.sequence(F.lit(0), F.lit(nsalts - 1))))
        .repartition(nparts, "cell_b", "_bsalt")
    )
    cos = F.round(
        dot(F.col("ae"), F.col("be")) / (norm(F.col("ae")) * norm(F.col("be"))), 6
    )
    pairs = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (a["_bsalt"] == b["_bsalt"])
            & (F.col("a_id") < F.col("b_id")),
        )
        .select(F.col("b_id"), cos.alias("cosine"))
        .filter(F.col("cosine") >= SEM_TAU)
    )
    dup = pairs.groupBy("b_id").agg(F.max("cosine").alias("max_dup_cosine"))
    return assigned.join(dup, assigned.vec_id == dup.b_id, "left").select(
        "vec_id",
        "cell",
        F.col("b_id").isNull().alias("kept"),
        "max_dup_cosine",
    )
