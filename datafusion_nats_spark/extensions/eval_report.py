"""ANN quality evaluation as a relational query.

Lives in its own module imported AFTER the ANN operator modules
(extensions/__init__.py import order): the report's oracle composes the
already-registered per-method oracles at decoration time, so those
registrations must exist first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import REGISTRY, query


def _ann_recall_oracle() -> str:
    """Composes the existing per-method oracles as CTE bodies (a CTE body
    may itself be a WITH-query) and computes recall@K against the exact
    brute-force top-k — evaluation-as-a-query, same determinism as the
    underlying operators."""
    bf = REGISTRY["sim_bruteforce_topk"].oracle
    methods = {
        "ivf": REGISTRY["sim_ivf_ann"].oracle,
        "kmeans": REGISTRY["sim_kmeans_ann"].oracle,
        "pq": REGISTRY["sim_pq_ann"].oracle,
    }
    ctes = [f"exact AS ({bf})"]
    selects = []
    for name, sql in sorted(methods.items()):
        ctes.append(f"m_{name} AS ({sql})")
        selects.append(
            f"""
            SELECT '{name}' AS method,
                   round(CAST((SELECT count(*) FROM m_{name} a
                               JOIN exact e ON e.query_id = a.query_id
                                           AND e.neighbor_id = a.neighbor_id) AS DOUBLE)
                         / (SELECT count(*) FROM exact), 6) AS recall_at_k
            """
        )
    return "WITH " + ",\n".join(ctes) + "\nUNION ALL\n".join(selects)


@query(
    "sim_ann_recall_report",
    oracle=_ann_recall_oracle(),
    doc="ANN quality evaluation as a relational query: recall@10 of each "
    "approximate method (IVF, Lloyd-kmeans IVF, PQ) against the exact "
    "brute-force top-k, computed by joining the methods' own result "
    "relations — the oracle composes the underlying oracles as CTEs, so "
    "the report is exactly as deterministic as the operators it grades.",
)
def sim_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.ml_variants import sim_kmeans_ann
    from datafusion_nats_spark.extensions.pq import sim_pq_ann
    from datafusion_nats_spark.extensions.similarity import (
        sim_bruteforce_topk,
        sim_ivf_ann,
    )

    exact = sim_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id").persist()
    methods = {
        "ivf": sim_ivf_ann,
        "kmeans": sim_kmeans_ann,
        "pq": sim_pq_ann,
    }
    out = None
    for name in sorted(methods):
        approx = methods[name](spark, sf_dir).select("query_id", "neighbor_id")
        hits = approx.join(exact, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("hits")
        )
        total = exact.agg(F.count(F.lit(1)).alias("total"))
        row = hits.crossJoin(F.broadcast(total)).select(
            F.lit(name).alias("method"),
            F.round(F.col("hits").cast("double") / F.col("total"), 6).alias("recall_at_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _dedup_comparison_oracle() -> str:
    """Per-method dropped-doc sets composed from the methods' own
    oracles, each graded against exact dedup (overlap + precision)."""
    cc = REGISTRY["dedup_connected_components"].oracle
    sim = REGISTRY["dedup_simhash"].oracle
    return f"""
    WITH total AS (SELECT count(*) AS n FROM documents),
    keyed AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
      FROM documents
    ), exact_drop AS (
      SELECT k.doc_id
      FROM keyed k
      JOIN (SELECT ck, min(doc_id) AS m FROM keyed GROUP BY ck) g
        ON k.ck = g.ck AND k.doc_id <> g.m
    ), sim_sig AS ({sim}),
    sim_drop AS (
      SELECT s.doc_id
      FROM sim_sig s
      JOIN (SELECT simhash32, min(doc_id) AS m FROM sim_sig GROUP BY simhash32) g
        ON s.simhash32 = g.simhash32 AND s.doc_id <> g.m
    ), cc AS ({cc}),
    mh_drop AS (
      SELECT doc_id FROM cc WHERE doc_id <> component
    ),
    graded AS (
      SELECT 'exact' AS method,
             (SELECT count(*) FROM exact_drop) AS n_dropped,
             (SELECT count(*) FROM exact_drop) AS n_overlap_exact
      UNION ALL
      SELECT 'simhash_identical',
             (SELECT count(*) FROM sim_drop),
             (SELECT count(*) FROM sim_drop s JOIN exact_drop e USING (doc_id))
      UNION ALL
      SELECT 'minhash_cc',
             (SELECT count(*) FROM mh_drop),
             (SELECT count(*) FROM mh_drop m JOIN exact_drop e USING (doc_id))
    )
    SELECT method,
           CAST(n_dropped AS BIGINT)       AS n_dropped,
           round(CAST(n_dropped AS DOUBLE) / t.n, 6)  AS drop_rate,
           CAST(n_overlap_exact AS BIGINT) AS n_overlap_exact,
           round(CAST(n_overlap_exact AS DOUBLE)
                 / nullif(n_dropped, 0), 6) AS precision_vs_exact
    FROM graded, total t
    """


@query(
    "dedup_method_comparison_report",
    oracle=_dedup_comparison_oracle(),
    doc="Dedup method comparison as a relational query: each method's "
    "dropped-document set (exact content-hash, identical-SimHash "
    "collision groups, MinHash+LSH connected components) sized and "
    "graded against the exact baseline — overlap count and "
    "precision-vs-exact (near-dup methods legitimately drop MORE than "
    "exact; a LOW precision flags over-merging). The oracle composes "
    "the methods' own registered oracles as CTEs, so the report is "
    "exactly as deterministic as the operators it grades. This is the "
    "side-by-side a pipeline owner reviews when choosing the dedup "
    "tier for a 100 TB corpus.",
)
def dedup_method_comparison_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.dedup import (
        _norm_text,
        dedup_connected_components,
        dedup_simhash,
    )
    from datafusion_nats_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("n"))
    keyed = docs.select("doc_id", F.md5(_norm_text()).alias("ck"))
    exact_drop = (
        keyed.join(
            keyed.groupBy("ck").agg(F.min("doc_id").alias("m")), "ck"
        )
        .filter(F.col("doc_id") != F.col("m"))
        .select("doc_id")
    )
    sig = dedup_simhash(spark, sf_dir)
    sim_drop = (
        sig.join(
            sig.groupBy("simhash32").agg(F.min("doc_id").alias("m")), "simhash32"
        )
        .filter(F.col("doc_id") != F.col("m"))
        .select("doc_id")
    )
    mh_drop = (
        dedup_connected_components(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
    )
    exact_d = exact_drop.persist()

    def grade(method: str, dropped):
        n = dropped.agg(F.count(F.lit(1)).alias("n_dropped"))
        ov = dropped.join(exact_d, "doc_id").agg(
            F.count(F.lit(1)).alias("n_overlap_exact")
        )
        return (
            n.crossJoin(ov)
            .select(F.lit(method).alias("method"), "n_dropped", "n_overlap_exact")
        )

    graded = (
        grade("exact", exact_d)
        .unionByName(grade("simhash_identical", sim_drop))
        .unionByName(grade("minhash_cc", mh_drop))
    )
    return graded.crossJoin(F.broadcast(total)).select(
        "method",
        "n_dropped",
        F.round(F.col("n_dropped").cast("double") / F.col("n"), 6).alias("drop_rate"),
        "n_overlap_exact",
        F.round(
            F.col("n_overlap_exact").cast("double")
            / F.nullif(F.col("n_dropped"), F.lit(0)),
            6,
        ).alias("precision_vs_exact"),
    )
